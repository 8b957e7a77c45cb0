#!/usr/bin/env python3
"""Merge a freshly measured (partial) scale_probe file into the committed
one, preserving the committed one-line-per-query format the guard regex
parses: key order rows1,rowsk,ratio_per_outrow,t1,tk,ratio, floats %.3f,
query order = ScaleProbe.probes order for known names then any extras.

Usage: merge_probes.py <committed.json> <fresh.json> <out.json>
"""
import json
import sys


def fmt_entry(e):
    parts = []
    if "rows1" in e:
        parts.append('"rows1":%d' % e["rows1"])
        parts.append('"rowsk":%d' % e["rowsk"])
        parts.append('"ratio_per_outrow":%.3f' % e["ratio_per_outrow"])
    parts.append('"t1":%.3f' % e["t1"])
    parts.append('"tk":%.3f' % e["tk"])
    parts.append('"ratio":%.3f' % e["ratio"])
    return "{%s}" % ",".join(parts)


def main(committed_path, fresh_path, out_path):
    committed = json.load(open(committed_path))
    fresh = json.load(open(fresh_path))
    assert committed["k"] == fresh["k"], (committed["k"], fresh["k"])
    assert committed["sf"] == fresh["sf"], (committed["sf"], fresh["sf"])
    merged = dict(committed["queries"])
    merged.update(fresh["queries"])
    lines = ['{"k":%d,"sf":"%s","queries":{' %
             (committed["k"], committed["sf"])]
    rows = ['"%s":%s' % (q, fmt_entry(e)) for q, e in merged.items()]
    body = ",\n".join(rows)
    out = lines[0] + body + "}}"
    open(out_path, "w").write(out + "\n")
    print("merged %d + %d -> %d queries" % (
        len(committed["queries"]), len(fresh["queries"]), len(merged)))


if __name__ == "__main__":
    main(*sys.argv[1:4])
