package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-9 additions: the occupancy-auto-scaled SemDeDup variant — the
  * knob the r8 review flagged as the one thing that did not grow with
  * the corpus.
  */
object Round9Queries {

  def all: Seq[Q] = Seq(

    Q("d_semdedup_auto",
      "SemDeDup with the cluster count DERIVED from the corpus size " +
        "(`Dedup.semDedupAuto`): one cell per ~128 vectors, " +
        "clamp(ceil(n/128), 2, 65536) — the quadratic within-cell knob " +
        "now grows with the corpus (at sf0.01's 500 vectors this gives " +
        "4 cells; at 100 TB it rides the cap and cells stay " +
        "~occupancy-sized), the missing piece flagged by the r8 " +
        "review. The oracle derives the SAME count via a scalar " +
        "subquery LIMIT, so the auto-scaling itself is under the " +
        "exact-hash gate, not just one pinned cluster count.",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedupAuto(Tables.embeddings(s, d),
            "vec_id", "embedding", threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedupAutoSql(dim = 64, occupancy = 128,
        threshold = "0.5"))),

    Q("curate_span_scrub",
      "Cross-document span scrub — the ACTION counterpart of " +
        "d_substring_spans' detection (the C4/RefinedWeb 'remove " +
        "duplicated spans' curation rule): docs cut into non-overlapping " +
        "8-token chunks, every chunk occurring in ≥2 DISTINCT docs " +
        "removed from ALL of them (order-free — unlike C4's keep-first, " +
        "the result is independent of dataset ordering, so it replays " +
        "on any engine), text rebuilt from surviving chunks in order. " +
        "Hot-chunk discovery is one groupBy on the chunk key; the scrub " +
        "is a left-anti equi join; reassembly sorts surviving (j, " +
        "chunk) structs per doc. Output digested per the Digest rules " +
        "(chunk counts + rebuilt-text length and 40-bit signature).",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.spanScrub(Tables.documents(s, d),
            "doc_id", "text", spanTokens = 8, minDocs = 2)
          .select($"doc_id", $"n_chunks", $"n_removed",
            length($"scrubbed").cast("long").as("scrubbed_chars"),
            Digest.strSig($"scrubbed").as("scrub_sig"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks
              |  FROM documents),
              |ch AS (
              |  SELECT doc_id, u.j AS j, u.chunk AS chunk FROM (
              |    SELECT doc_id, unnest(list_transform(
              |      range(greatest(CAST(ceil(len(toks) / 8.0) AS BIGINT),
              |        1)),
              |      x -> struct_pack(j := x,
              |        chunk := array_to_string(toks[x*8+1 : x*8+8],
              |          ' ')))) AS u
              |    FROM t)),
              |hot AS (
              |  SELECT chunk FROM (SELECT DISTINCT doc_id, chunk FROM ch)
              |  GROUP BY chunk HAVING count(*) >= 2),
              |kept AS (SELECT ch.* FROM ch ANTI JOIN hot USING (chunk)),
              |reb AS (
              |  SELECT doc_id, count(*) AS n_kept,
              |    array_to_string(list(chunk ORDER BY j), ' ') AS scrubbed
              |  FROM kept GROUP BY doc_id),
              |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch
              |        GROUP BY doc_id)
              |SELECT tot.doc_id, CAST(tot.n_chunks AS BIGINT) AS n_chunks,
              |  CAST(tot.n_chunks - coalesce(reb.n_kept, 0) AS BIGINT)
              |    AS n_removed,
              |  CAST(length(coalesce(reb.scrubbed, '')) AS BIGINT)
              |    AS scrubbed_chars,
              |  ${Digest.strSigSql("coalesce(reb.scrubbed, '')")}
              |    AS scrub_sig
              |FROM tot LEFT JOIN reb USING (doc_id)
              |ORDER BY tot.doc_id""".stripMargin)),

    Q("p_shard_export",
      "Training-data EXPORT — the last mile of a 100 TB pipeline: " +
        "deterministic md5-derived shard assignment (nShards=8, " +
        "repartition-stable, no RNG — any engine replays it), corpus " +
        "written partitionBy(shard) with exactly ONE file per shard " +
        "(repartition on the shard key first; asserted in-query from " +
        "the written layout), re-read FROM DISK and audited per shard: " +
        "doc count, doc_id sum, whitespace-token sum. The oracle " +
        "derives the identical audit closed-form, so the write → " +
        "at-rest layout → read-back loop rides the exact-hash gate " +
        "like the IVF at-rest and h5mu sinks.",
      (s, d) => {
        import s.implicits._
        Scratch.withTempDir("graft-shard-") { tmp =>
          val p = s"${tmp.getAbsolutePath}/shards"
          val nShards = 8
          Tables.documents(s, d)
            .withColumn("shard", pmod(
              conv(substring(md5($"doc_id".cast("string")), 1, 10),
                16, 10).cast("long"), lit(nShards.toLong)))
            .repartition($"shard")
            .write.partitionBy("shard").parquet(p)
          val filesOk = (0 until nShards).forall { sh =>
            val fs = new java.io.File(s"$p/shard=$sh").listFiles()
            fs != null && fs.count(_.getName.endsWith(".parquet")) == 1
          }
          s.read.parquet(p)
            .groupBy($"shard".cast("long").as("shard"))
            .agg(count(lit(1)).as("n_docs"),
              sum($"doc_id").as("id_sum"),
              sum(size(split(trim($"text"), "\\s+"))).cast("long")
                .as("tok_sum"))
            .withColumn("one_file_per_shard", lit(filesOk))
            .orderBy($"shard")
        }
      },
      Some("""WITH s AS (
             |  SELECT *, CAST('0x' ||
             |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)
             |      AS BIGINT) % 8 AS shard
             |  FROM documents)
             |SELECT shard, count(*) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(sum(len(string_split_regex(trim(text), '\s+')))
             |    AS BIGINT) AS tok_sum,
             |  TRUE AS one_file_per_shard
             |FROM s GROUP BY shard ORDER BY shard""".stripMargin)),
  )
}
