package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator hardening: the build-side-sized native Bloom prune
  * at a cardinality (10^6 keys) where the legacy 64 Kbit literal bitmap
  * is fully saturated, and the streaming plan-capture hook.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native bloom prune holds FPR and prunes at 10^6 build keys") {
    val nBuild = 1000000L
    val build = spark.range(nBuild).toDF("bk")
    val probe = spark.range(2L * nBuild).toDF("pk")
    val bytes = Relational.buildBloom(build, "bk", fpp = 0.01)
    // sketch is sketch-sized: ~1.2 MB for 1e6 keys @ 1% fpp, not key-rows
    assert(bytes.length < 2 * 1200 * 1024,
      s"bloom bytes unexpectedly large: ${bytes.length}")
    val survivors = probe
      .filter(Relational.bloomMightContain(bytes, col("pk"))).count()
    // no false negatives: every one of the 1e6 true members survives
    assert(survivors >= nBuild, s"false negatives: $survivors < $nBuild")
    val fpRate = (survivors - nBuild).toDouble / nBuild
    assert(fpRate < 0.03, s"false-positive rate $fpRate above 3×fpp")
    // the prune is REAL at this cardinality: >97% of non-members die
    // before the exchange (the 64 Kbit legacy bitmap would pass ~100%)
    assert(2 * nBuild - survivors > (0.97 * nBuild).toLong)
  }

  test("scale guard trips on >2x ratio regression, tolerates noise") {
    // baseline in the exact format ScaleProbe writes (committed as
    // SCALE_RATIOS.json): r15 rows lead with the output-normalization
    // fields; "c" keeps the legacy t1-first shape so the parser stays
    // compatible with pre-r15 committed baselines
    val base =
      """{"k":8,"sf":"/x","queries":{"a":{"rows1":10,"rowsk":80,"ratio_per_outrow":0.250,"t1":0.300,"tk":0.600,"ratio":2.000},
        |"b":{"rows1":5,"rowsk":5,"ratio_per_outrow":0.800,"t1":0.500,"tk":0.400,"ratio":0.800},
        |"c":{"t1":1.000,"tk":8.000,"ratio":8.000}}}""".stripMargin
    assert(ScaleProbe.baselineRatios(base) ==
      Map("a" -> 2.0, "b" -> 0.8, "c" -> 8.0))
    // denominator clamp: a noisy 0.1 s 1× sample must not fabricate a
    // 25× ratio (the r10 d_semdedup_auto artifact) — clamped to 0.5 s
    // the measured ratio is 5.0, under c's 16.0 threshold
    assert(ScaleProbe.ratio(0.1, 2.5) === 25.0 / 5)
    assert(ScaleProbe.checkGuard(base, Seq(("c", 0.1, 2.5))).isEmpty)
    assert(ScaleProbe.checkGuard(base, Seq(("c", 0.6, 11.0))).nonEmpty)
    // a: 2.0 baseline → trips only above 4.0 (tk over the 2 s floor)
    assert(ScaleProbe.checkGuard(base, Seq(("a", 3.0, 11.0))).isEmpty)
    assert(ScaleProbe.checkGuard(base, Seq(("a", 3.0, 13.0))).nonEmpty)
    // b: sub-linear baseline floored at 1.0 → trips only above 2.0
    assert(ScaleProbe.checkGuard(base, Seq(("b", 5.0, 9.5))).isEmpty)
    assert(ScaleProbe.checkGuard(base, Seq(("b", 5.0, 11.0))).nonEmpty)
    // absolute floor: a sub-2 s 8× run is noise-dominated — its ratio
    // carries no signal and must not trip regardless of magnitude
    assert(ScaleProbe.checkGuard(base, Seq(("a", 0.3, 1.9))).isEmpty)
    // probes not in the baseline are skipped, not errors
    assert(ScaleProbe.checkGuard(base, Seq(("new_q", 0.1, 9.9))).isEmpty)
    // the real committed baseline parses THROUGH THE GUARD'S OWN
    // PARSER and covers the probe list — an independent regex here
    // passed green in r15 while the guard's t1-anchored regex parsed
    // the same file to an EMPTY map (dead tripwire); asserting the
    // production parser on the production file closes that gap
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SCALE_RATIOS.json"))
    val parsed = ScaleProbe.baselineRatios(committed)
    assert(parsed.size >= ScaleProbe.probes.size,
      s"guard parser sees only ${parsed.size} baseline rows")
    assert(ScaleProbe.probes.toSet.subsetOf(parsed.keySet),
      s"baseline missing probes: " +
        s"${ScaleProbe.probes.toSet -- parsed.keySet}")
    assert(parsed.values.forall(r => r >= 0.0 && r < 1000.0))
    // the committed 8x measurement file and the guard baseline are
    // the SAME file by workflow (merge 8x -> copy to SCALE_RATIOS);
    // they silently diverged in r16 when a guard run clobbered the
    // merged 8x file minutes after it was assembled (guard output is
    // now redirected, and this pins the invariant so any future
    // divergence fails loudly instead of shipping two baselines)
    val probe8 = java.nio.file.Files.readString(
      java.nio.file.Paths.get("scale_probe_8x.json"))
    assert(probe8 == committed,
      "scale_probe_8x.json and SCALE_RATIOS.json have diverged — " +
        "re-copy the merged 8x file over SCALE_RATIOS.json")
  }

  test("bloomPrunedJoinAuto equals the plain join exactly") {
    val build = spark.range(0, 3000, 7).toDF("bk") // sparse keys
    val probe = spark.range(10000).toDF("pk")
    val got = Relational.bloomPrunedJoinAuto(probe, build, "pk", "bk")
      .select($"pk").orderBy($"pk").as[Long].collect().toSeq
    val want = probe.join(build, $"pk" === $"bk")
      .select($"pk").orderBy($"pk").as[Long].collect().toSeq
    assert(got == want)
  }
}
