package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Round-13 additions: NFC normalization composed into the NEAR-dup
  * pipeline — `d_exact_nfc` (r12) closed the false-negative for exact
  * dedup keys; this closes it for the minhash tier, where the raw-byte
  * shingle hashes split composed/decomposed spellings of the same
  * visible text into disjoint bucket sets. Non-ASCII fixture chars use
  * \u escapes so the composed/decomposed distinction survives editor
  * normalization (Round12Queries convention). Second wave widens the
  * graph-analytics family (previously triangle count + PageRank) with
  * the two remaining iterative-subgraph shapes a dedup/curation
  * pipeline leans on: k-core peeling (the dense-subgraph filter that
  * isolates spam rings / bot cliques in a doc-share graph) and
  * common-neighbor link prediction (the wedge-closure score behind
  * "these two accounts co-occur suspiciously often").
  */
object Round13Queries {

  /** The `curate_line_dedup` body over any (doc_id, text) frame —
    * single implementation for the registered query (natural corpus)
    * and the `probe_line_dedup_heavy` scale probe (6×-inflated docs,
    * so the probe's 1× denominator clears the ratio clamp floor).
    * Plants one universal promo line and a doc_id % 7 footer cohort
    * around each body; every line with document frequency ≥ 2 drops
    * from every carrier; a doc whose every line was boilerplate
    * reports a NULL cleaned-text md5 (string_agg-over-no-rows parity
    * with the oracle).
    */
  private[graft] def lineDedup(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col("doc_id"), posexplode(array(
        lit("follow us on example social"),
        col("text"),
        concat(lit("copyright footer "),
          (col("doc_id") % 7).cast("string")))))
      .toDF("doc_id", "line_no", "line")
    val docFreq = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
    lines.join(docFreq, "line")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("df") < 2, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_removed"),
        // collect_list skips the null branch, so only kept lines
        // enter; array_sort on (line_no, line) structs restores
        // the original order (line_no is unique per doc)
        array_sort(collect_list(when(col("df") < 2,
          struct(col("line_no"), col("line"))))).as("arr"))
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        when(col("n_kept") === 0L, lit(null).cast("string"))
          .otherwise(md5(concat_ws("\n",
            expr("transform(arr, x -> x.line)")))).as("clean_md5"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm) over any (doc_id, text) frame: normalize (lowercase,
    * whitespace-collapse, cap at 2000 chars), hash every k=8-char
    * gram to a 40-bit md5 prefix, then keep the MINIMUM hash of every
    * w=4-gram window (leftmost-min tie-break), distinct per doc.
    * Guarantee: any shared substring of length ≥ k+w−1 = 11 NORMALIZED
    * chars between two docs yields at least one shared fingerprint —
    * the partial-overlap detector whole-doc hashing (t_fingerprint)
    * cannot provide. (hash, position) ride ONE exact BIGINT
    * `hash·4096 + pos` (40+12 bits < 2⁵²) so the windowed min is a
    * plain `min()` in both engines — no struct-min / min_by
    * portability hazard. Returns (doc_id, fp) where fp is the
    * combined value; position decodes as fp % 4096.
    */
  private[graft] def winnowFingerprints(
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // t's defining chain is PINNED (r19, guide §4.4): the length
    // filter below otherwise gets alias-substituted under this
    // projection by PushPredicateThroughNonJoin — which pushes even
    // nondeterministic predicates through a DETERMINISTIC project —
    // and every doc pays the normalize chain
    // (lower+trim+regexp_replace+substring over ≤2000 chars) TWICE
    // (plan audit: 2× regexp_replace in t_winnow_fingerprint's
    // plan). A nondeterministic projected field blocks both that
    // substitution and any CollapseProject inlining; value-identical
    // pass-through.
    val normed = docs.select(col("doc_id"),
      graft.functions.text.pinned(
        substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
          1, 2000)).as("t"))
      // Spark sequence(0, negative) DESCENDS instead of being empty —
      // sub-k docs must not reach it (they have no grams anyway)
      .filter(length(col("t")) >= 8)
      // the per-gram hashing below is ~chars × md5 of work: left in
      // the scan stage it runs at the PARQUET SPLIT's parallelism (a
      // single-file corpus = one core — measured 5× slower than
      // linear on the 6× probe). Repartitioning the cheap (doc_id, t)
      // rows first spreads it, and the sliding-window min needs this
      // exact hash distribution anyway, so the window adds NO second
      // exchange. The width is EXPLICIT: a bare repartition(col) is
      // an AQE-coalescible exchange, and the (doc_id, t) rows are so
      // small that AQE folded the whole ~2000-gram/doc
      // explode+hash+window into ONE task (r18 measured: 3.2 s
      // single-task stage = the whole query's critical path; AQE
      // sizes by the exchange's INPUT bytes and cannot see the
      // downstream fan-out). The width is DATA-SCALED (r19): the
      // per-input-byte cost here is ~1 gram explode + md5 per char
      // (~12 µs/byte measured at r18's single-task fold: 3.2 s /
      // 255 KB), so 8 KB/task ≈ 0.1 s of hash work per task — at the
      // benched SF that saturates the session width (unchanged plan)
      // while tiny corpora stop paying a 32-wide exchange for
      // sub-millisecond partitions.
      .repartition(graft.ops.Width.scaled(docs, 8L << 10),
        col("doc_id"))
    val grams = normed
      .select(col("doc_id"),
        (length(col("t")).cast("long") - 11L).as("max_j"),
        explode(sequence(lit(0L), length(col("t")).cast("long") - 8L))
          .as("i"),
        col("t"))
      .select(col("doc_id"), col("max_j"), col("i"),
        (graft.functions.text.md5_prefix64(
          expr("substring(t, CAST(i + 1 AS INT), 8)"), 10)
          * 4096L + col("i")).as("combined"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(0, 3)
    grams
      .select(col("doc_id"), col("i"), col("max_j"),
        min(col("combined")).over(w).as("fp"))
      // MOSS uses FULL windows only: the last w−1 gram positions open
      // truncated windows (max_j = len − k − w + 1 − 1 in 0-based form)
      .filter(col("i") <= col("max_j"))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** DuckDB CTE chain replaying [[winnowFingerprints]] up through the
    * per-doc fingerprint set `fps (doc_id, fp)` — shared by the
    * per-doc rollup oracle (`t_winnow_fingerprint`) and the cross-doc
    * overlap-pair oracle (`t_winnow_overlap`) so the fingerprint
    * definition cannot fork between them (the Coactivity.sqlUnd
    * discipline). */
  private[queries] val winnowFpsCtes: String =
    """docs AS (
      |  SELECT doc_id,
      |    substr(regexp_replace(lower(trim(text)), '\s+', ' ',
      |      'g'), 1, 2000) AS t
      |  FROM documents),
      |sized AS (SELECT doc_id, t FROM docs WHERE length(t) >= 8),
      |grams0 AS (
      |  SELECT doc_id, t, length(t) - 11 AS max_j,
      |    unnest(range(0, length(t) - 7)) AS i
      |  FROM sized),
      |grams AS (
      |  SELECT doc_id, max_j, i,
      |    CAST(concat('0x', substr(md5(substr(t,
      |      CAST(i + 1 AS INT), 8)), 1, 10)) AS BIGINT)
      |      * 4096 + i AS combined
      |  FROM grams0),
      |wins AS (
      |  SELECT doc_id, i, max_j,
      |    min(combined) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM grams),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= max_j)""".stripMargin

  /** Peel rounds for `g_kcore`. The op is pinned as "R rounds of
    * peeling", which equals the true k-core whenever the peel
    * converges within R rounds; if a graph ever needed more, BOTH
    * engines still compute the identical R-round object, so the
    * hash gate cannot silently diverge either way (the fixed-round ≡
    * fixpoint property is spec-pinned on a cascading fixture in
    * Round13OpsSpec). */
  private[queries] val KcorePeelRounds = 6

  def all: Seq[Q] = Seq(

    Q("d_minhash_nfc",
      "MinHash near-dup over NFC-NORMALIZED text — normalize-before-" +
        "hash composed into the near-dup tier (the d_exact_nfc " +
        "analogue): each doc under the corpus cap expands into two " +
        "variants spelling every 'e' precomposed (U+00E9) vs " +
        "decomposed (e + U+0301) plus a distinct tag token, so the " +
        "twins are near- (not exact-) duplicates that share ZERO " +
        "shingles at the byte level — every token differs — and band " +
        "together ONLY because unicode_normalize(text, NFC) (the " +
        "codegen'd native expression) is projected upstream of the " +
        "portable minhash. Full LSH + exact-Jaccard verify replays in " +
        "DuckDB over its independent nfc_normalize: two NFC " +
        "implementations feeding two md5-minhash pipelines, identical " +
        "verified pair lists, or the hash gate breaks. The negative " +
        "control (raw bytes never pair a twin) is spec-pinned in " +
        "Round13OpsSpec.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter($"doc_id" < 1000L)
          .select($"doc_id", $"text")
        val variants = docs.select(($"doc_id" * 2).as("vid"),
            concat(expr("replace(text, 'e', '\u00e9')"),
              lit(" veven")).as("raw"))
          .unionByName(docs.select(($"doc_id" * 2 + 1).as("vid"),
            concat(expr("replace(text, 'e', 'e\u0301')"),
              lit(" vodd")).as("raw")))
        val normalized = variants.select($"vid",
          graft.functions.text.unicode_normalize($"raw", "NFC")
            .as("text"))
        graft.dedup.Dedup.minhashDuplicatesPortable(normalized, "vid",
            "text", threshold = 0.3, shingleN = 3, bands = 4,
            rowsPerBand = 4)
          .orderBy($"a_id", $"b_id")
      },
      Some(OracleGen.minhashNfcSql(shingleN = 3, bands = 4,
        rowsPerBand = 4, threshold = 0.3, maxDocId = 1000L))),

    Q("d_semdedup_2level",
      "SemDeDup with TWO-LEVEL (hierarchical) cell assignment under " +
        "the exact oracle — the scale answer to the flat path's " +
        "O(n·k) assignment term (k grows with the corpus under the " +
        "occupancy derivation, so flat assignment is ~quadratic until " +
        "the 65536-cell cap; probe_semdedup_heavy measures ~20x at 8x " +
        "data): vectors argmax over clamp(ceil(sqrt(k)), 2, 256) " +
        "SUPER-centroids first, then over only the sub-centroids " +
        "whose own nearest super matches — O(n·sqrt(k)) total, the " +
        "IVF coarse-quantizer pattern applied to SemDeDup (what " +
        "production faiss deployments run). Both centroid sets come " +
        "from the shared deterministic Lloyd recipe, the sub-to-super " +
        "map rides the same fused argmax kernel, supers that win no " +
        "sub are excluded so no vector is ever dropped, and DuckDB " +
        "replays the ENTIRE two-level routing (both trainings, both " +
        "argmax tie-breaks, the within-cell prune) — the hierarchical " +
        "approximation itself is pinned cross-engine, not just its " +
        "flat baseline.",
      (s, d) => {
        import s.implicits._
        graft.dedup.Dedup.semDedupHierarchical(Tables.embeddings(s, d),
            "vec_id", "embedding", threshold = 0.5)
          .orderBy($"vec_id")
      },
      Some(OracleGen.semDedup2LevelSql(dim = 64, occupancy = 128,
        threshold = "0.5"))),

    Q("g_kcore",
      "Graph analytics — 3-core decomposition of the co-activity " +
        "graph by iterative peeling (drop every vertex with induced " +
        "degree < 3, recompute, repeat): the dense-subgraph filter a " +
        "curation pipeline runs on a doc-share / co-engagement graph " +
        "to isolate spam rings from organic long-tail activity. " +
        "All-integer, and the SAME iterative-join discipline as the " +
        "CC operator: the (checkpointed) edge list is hash-partitioned " +
        "by src ONCE, each round's induced-degree aggregation reuses " +
        "that exchange, the shrinking alive set is the only thing " +
        "re-shuffled, and each round is cut with localCheckpoint so " +
        "the plan never doubles (the alive set feeds BOTH endpoint " +
        "semi-joins). Early-exits at the fixpoint — peeling is " +
        "monotone, so an unchanged survivor COUNT proves an unchanged " +
        "set — and the fixpoint equals the oracle's fixed " +
        "6-round unroll because post-convergence rounds are no-ops. " +
        "Output: each 3-core member with its within-core degree.",
      (s, d) => {
        import s.implicits._
        graft.ops.Graph.kcore(Coactivity.und(s, d), k = 3,
            maxRounds = KcorePeelRounds)
          .select($"node".as("user_id"), $"core_deg")
          .orderBy($"user_id")
      },
      Some {
        // every p(i-1) is referenced TWICE by p(i): MATERIALIZED stops
        // DuckDB's CTE inlining from exponentiating the unroll (2^R
        // copies of the whole chain — OOMs even at sf0.001 without it)
        def peel(i: Int) =
          s"""p$i AS MATERIALIZED (
             |  SELECT e.src AS node FROM bi e
             |  JOIN p${i - 1} x ON e.src = x.node
             |  JOIN p${i - 1} y ON e.dst = y.node
             |  GROUP BY e.src HAVING count(*) >= 3)"""
        val R = KcorePeelRounds
        s"""WITH ${Coactivity.sqlUnd},
           |${Coactivity.sqlBi},
           |p0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM bi),
           |${(1 to R).map(peel).mkString(",\n")}
           |SELECT e.src AS user_id, count(*) AS core_deg
           |FROM bi e
           |JOIN p$R x ON e.src = x.node
           |JOIN p$R y ON e.dst = y.node
           |GROUP BY e.src ORDER BY user_id""".stripMargin
      }),

    Q("g_link_predict",
      "Graph analytics — common-neighbor link prediction over the " +
        "co-activity graph: every NON-adjacent pair closing a wedge, " +
        "scored by shared-neighbor count, top 100 under a total " +
        "deterministic order (the co-occurrence anomaly score a " +
        "curation pipeline uses to surface coordinated accounts). " +
        "Wedge enumeration is the Σdeg² shape, so mid vertices above " +
        "degree 64 are excluded FIRST (standard hub suppression — a " +
        "super-hub's wedges carry no signal, exactly like stop-words " +
        "in shingling; it is also what bounds the self-join at 100 TB: " +
        "per-partition wedge fan-out is capped at 64² per mid). " +
        "Existing edges drop via a co-oriented anti join (both sides " +
        "a < b by construction), all-integer throughout.",
      (s, d) => {
        import s.implicits._
        graft.ops.Graph.commonNeighbors(Coactivity.und(s, d),
            maxMidDegree = 64, minCommon = 1L)
          .orderBy($"common".desc, $"u", $"w")
          .limit(100)
          .select($"u".as("user_a"), $"w".as("user_b"), $"common")
      },
      Some(s"""WITH ${Coactivity.sqlUnd},
             |${Coactivity.sqlBi},
             |deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
             |spokes AS (
             |  SELECT b.src AS v, b.dst AS u
             |  FROM bi b JOIN deg ON b.src = deg.src
             |  WHERE deg.deg <= 64),
             |wedges AS (
             |  SELECT s1.u AS u, s2.u AS w, count(*) AS common
             |  FROM spokes s1 JOIN spokes s2
             |    ON s1.v = s2.v AND s1.u < s2.u
             |  GROUP BY s1.u, s2.u)
             |SELECT u AS user_a, w AS user_b, common
             |FROM wedges
             |WHERE NOT EXISTS (SELECT 1 FROM und
             |  WHERE und.a = wedges.u AND und.b = wedges.w)
             |ORDER BY common DESC, u, w LIMIT 100""".stripMargin)),

    Q("j_interval_bucketized",
      "Keyless interval-containment join, bucketized " +
        "(`Relational.intervalJoin`): every 1-in-97 order opens a " +
        "7-day window [o_orderdate, +7d) and the join finds ALL " +
        "lineitem shipments falling inside each window — no equi key, " +
        "the shape Spark would otherwise plan as a " +
        "BroadcastNestedLoopJoin (O(n·m) comparisons + a whole-side " +
        "broadcast, both fatal at 100 TB). Bucketizing to 7-day " +
        "buckets makes it an equi join: points hash to ONE bucket, " +
        "each interval replicates to the ≤ 2 buckets its span " +
        "overlaps, the exact range predicate prunes the per-bucket " +
        "candidates, and the per-window rollup is partial-aggregated " +
        "before its shuffle. The plan-level no-nested-loop guarantee " +
        "is spec-pinned; DuckDB replays the naive range predicate " +
        "(its IEJoin), so the bucketized rewrite is proven " +
        "pair-for-pair against a genuinely different algorithm.",
      (s, d) => {
        import s.implicits._
        val iv = Tables.table(s, d, "orders")
          .filter($"o_orderkey" % 97 === 0)
          .select($"o_orderkey".as("order_id"),
            $"o_orderdate".as("win_start"),
            ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as("win_end"))
        val pts = Tables.table(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
        Relational.intervalJoin(pts, iv, "l_shipdate", "win_start",
            "win_end", bucketSeconds = 7L * 86400L)
          .groupBy($"order_id")
          .agg(count(lit(1)).as("n_ship"),
            min($"l_shipdate").as("first_ship"),
            max($"l_shipdate").as("last_ship"))
          .orderBy($"order_id")
      },
      Some("""WITH iv AS (
             |  SELECT o_orderkey AS order_id, o_orderdate AS win_start,
             |    o_orderdate + INTERVAL 7 DAY AS win_end
             |  FROM orders WHERE o_orderkey % 97 = 0)
             |SELECT order_id, count(*) AS n_ship,
             |  min(l_shipdate) AS first_ship,
             |  max(l_shipdate) AS last_ship
             |FROM iv JOIN lineitem
             |  ON l_shipdate >= win_start AND l_shipdate < win_end
             |GROUP BY order_id ORDER BY order_id""".stripMargin)),

    Q("curate_line_dedup",
      "LINE-level boilerplate removal (the CCNet paragraph-dedup " +
        "pass): every line whose document frequency is >= 2 is " +
        "boilerplate and drops from every doc that carries it; each " +
        "doc reports kept/removed line counts plus the md5 of its " +
        "cleaned text with line ORDER preserved (null when everything " +
        "was boilerplate — docs with exact-dup bodies exist in the " +
        "corpus by construction). The fixture plants one universal " +
        "promo line and a footer shared by doc_id % 7 around each " +
        "body, so removal must distinguish corpus-wide, cohort, and " +
        "unique lines. Shape at scale: explode to lines, ONE " +
        "doc-frequency aggregation on the line key, tag lines by a " +
        "co-partitioned join on the same key (no second derivation " +
        "of the line set), then a per-doc rollup where order " +
        "restoration is array_sort over (line_no, line) structs — " +
        "no window, no driver state.",
      (s, d) => {
        import s.implicits._
        lineDedup(Tables.documents(s, d).select($"doc_id", $"text"))
          .orderBy($"doc_id")
      },
      Some("""WITH lines AS (
             |  SELECT doc_id, 0 AS line_no,
             |    'follow us on example social' AS line FROM documents
             |  UNION ALL SELECT doc_id, 1, text FROM documents
             |  UNION ALL SELECT doc_id, 2,
             |    'copyright footer ' || CAST(doc_id % 7 AS VARCHAR)
             |  FROM documents),
             |freq AS (
             |  SELECT line, count(DISTINCT doc_id) AS df
             |  FROM lines GROUP BY line)
             |SELECT l.doc_id,
             |  CAST(sum(CASE WHEN f.df < 2 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_removed,
             |  md5(string_agg(CASE WHEN f.df < 2 THEN l.line END,
             |    chr(10) ORDER BY l.line_no)) AS clean_md5
             |FROM lines l JOIN freq f USING (line)
             |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin)),

    Q("t_winnow_fingerprint",
      "Winnowing document fingerprints (Schleimer/Wilkerson/Aiken — " +
        "the MOSS algorithm): 40-bit md5 hashes of every 8-char gram " +
        "of the normalized text, the MINIMUM kept per 4-gram window " +
        "(leftmost-min tie-break), distinct per doc — the guarantee " +
        "is that ANY shared run of >= 11 normalized chars between two " +
        "docs shares at least one fingerprint (spec-pinned), which " +
        "whole-doc hashing (t_fingerprint) cannot detect. (hash, pos) " +
        "ride one exact BIGINT hash*4096+pos so the windowed min is a " +
        "plain min() in both engines. Per doc: fingerprint count + an " +
        "order-independent md5 rollup of the sorted set. Shape at " +
        "scale: explode to grams (rows ~ chars), ONE doc_id shuffle " +
        "shared by the sliding-window min and the final rollup; " +
        "selection density ~= 2/(w+1) of grams, the winnowing bound.",
      (s, d) => {
        import s.implicits._
        winnowFingerprints(
            Tables.documents(s, d).select($"doc_id", $"text"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_fp"),
            md5(concat_ws("-",
              expr("transform(array_sort(collect_list(fp)), " +
                "x -> CAST(x AS STRING))"))).as("fp_rollup"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH $winnowFpsCtes
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
             |  md5(string_agg(CAST(fp AS VARCHAR), '-' ORDER BY fp))
             |    AS fp_rollup
             |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("e_knn_mips",
      "Similarity: brute-force MAX-INNER-PRODUCT top-k (MIPS) — the " +
        "retrieval semantics of recommendation / reranker scores, " +
        "where vector MAGNITUDE is signal (unlike the cosine family, " +
        "a longer vector can dominate every query; the negative " +
        "control that cosine and MIPS rankings genuinely differ on " +
        "unnormalized vectors is spec-pinned). Execution shape = " +
        "e_knn_brute: broadcast queries, corpus streams, codegen'd " +
        "vec_dot kernel, one window per query; ranks compare on the " +
        "bit-identical dot-product expansion in DuckDB. At scale MIPS " +
        "reduces to cosine ANN by norm augmentation " +
        "x' = [x, sqrt(M^2 - |x|^2)], q' = [q, 0] (spec-pinned " +
        "property), so the existing IVF/LSH/PQ serving paths apply " +
        "unchanged; this is their exact baseline.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.similarity.Knn.mipsTopK(emb, emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5)
          .select($"query_id", $"neighbor_id", $"rank".cast("long")
            .as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnMipsSql(dim = 64, k = 5, maxQueryId = 10))),
  )
}
