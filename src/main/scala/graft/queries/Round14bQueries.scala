package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-14 second wave — the retrieval/sketch operators a
  * training-data pipeline composes on top of the existing families:
  * a mergeable KMV distinct sketch (the distributed approx-distinct
  * whose merge step is provable, unlike HLL whose registers are
  * engine-private), reciprocal-rank fusion of two retrieval rankings
  * (the standard hybrid-search combiner), and — in later waves of
  * this file — BM25 lexical retrieval and duplicated-substring
  * scrubbing.
  */
object Round14bQueries {

  /** 2^60 — the KMV hash space: 15 hex chars of md5, the repo's
    * md5-prefix→BIGINT convention (winnowing uses 10 chars / 40 bits;
    * a distinct sketch wants more headroom against collisions).
    */
  private val KmvSpace = 1152921504606846976L
  private val KmvK = 64

  /** BM25 query set: (query_id, slot, term). Slots are the FIXED
    * summation positions — the fused score is the literal chain
    * (c1 + c2) + c3, never a SUM over a variable row set, so the
    * float result is bit-identical cross-engine (the e_knn dot-chain
    * discipline applied to lexical scoring). 'dup' is the corpus's
    * one rare term (df ≈ 5% of docs) so the idf weighting is
    * exercised, not just constant.
    */
  private[graft] val Bm25Terms: Seq[(Long, Int, String)] = Seq(
    (1L, 1, "dup"), (1L, 2, "spark"), (1L, 3, "customer"),
    (2L, 1, "window"), (2L, 2, "merge"), (2L, 3, "dup"),
    (3L, 1, "batch"), (3L, 2, "the"), (3L, 3, "vector"))

  /** BM25 lexical top-k (k1 = 1.2, b = 0.75) with two deliberate,
    * documented exactness choices:
    *
    *  - **idf is bit-length-quantized**: idf = bitlen(⌊2(N+1) /
    *    (2·df+1)⌋) ≈ ⌊log2((N+0.5+0.5)/(df+0.5))⌋ + 1 — factor-of-2
    *    idf buckets via the same `length(bin(...))` integer discipline
    *    the LSH cap formula rides. The standard ln-idf is a
    *    transcendental whose last ulp varies by libm, which a
    *    hash-exact oracle regime cannot admit (the t_tfidf_top
    *    "float idf ranks are engine-order traps" rule, solved by
    *    quantization instead of avoidance).
    *  - **tf normalization is an exact integer ratio**: with
    *    k1 = 6/5 and b = 3/4, multiplying numerator and denominator
    *    by 20·S·N (S = corpus tokens, N = docs) clears every
    *    fraction: contribution = idf · 44·S·tf / (20·S·tf + 6·S +
    *    18·N·dl) — two BIGINT expressions, each cast to double once,
    *    ONE divide, ONE multiply. (BIGINT is ample headroom at test
    *    scale; a 100 TB corpus would lift the two products to
    *    DECIMAL(38) — same plan.)
    *
    * Per-doc scores exist only for docs containing ≥ 1 query term
    * (the postings filter — at scale this is the inverted-list
    * pushdown: the token explode feeds ONE filtered aggregation, and
    * the df/scalars sides are broadcast-sized).
    */
  /** The t_collocations body over any (doc_id, text) frame — shared
    * with `probe_collocations_heavy` so the probe measures exactly the
    * registered plan at a real denominator. */
  private[graft] def collocationsTop(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, minSupport: Long, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"p")
    val toks = docs
      .select($"doc_id",
        posexplode(split(trim($"text"), "\\s+")).as(Seq("p", "tok")))
    val uni = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
    val nUni = broadcast(uni.agg(sum($"n").as("n_uni")))
    val bi = toks
      .withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"tok", $"nxt").agg(count(lit(1)).as("n_ab"))
    val nBi = broadcast(bi.agg(sum($"n_ab").as("n_bi")))
    // lift = n_ab·N·N / (n_a·n_b·N_bi) with the 3-factor BIGINT
    // products SPLIT into a decimal pair product × one more factor —
    // the r15 32× probe corpus (192× tokens) overflowed the single
    // BIGINT product n_ab·N² exactly as the headroom note predicted,
    // so the lift is now computed as the FIXED two-multiply chain
    // (CAST(dec(18)·dec(18) AS DOUBLE) · CAST(x AS DOUBLE)) / (same
    // shape): pair products stay exact in DECIMAL(37) while every
    // count stays below 10^18, each converts to double exactly
    // once, and both engines execute the identical op order — the
    // cross-engine contract needs a FIXED chain, not a single op.
    def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
    bi.filter($"n_ab" >= minSupport)
      .join(broadcast(uni.select($"tok".as("t1"), $"n".as("n_a"))),
        $"tok" === $"t1")
      .join(broadcast(uni.select($"tok".as("t2"), $"n".as("n_b"))),
        $"nxt" === $"t2")
      .crossJoin(nUni).crossJoin(nBi)
      .select(concat($"tok", lit(" "), $"nxt").as("bigram"),
        $"n_ab",
        (((d18($"n_ab") * d18($"n_uni")).cast("double") *
            $"n_uni".cast("double")) /
          ((d18($"n_a") * d18($"n_b")).cast("double") *
            $"n_bi".cast("double"))).as("lift"))
      .orderBy($"lift".desc, $"bigram")
      .limit(k)
  }

  private[graft] def bm25TopK(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      terms: Seq[(Long, Int, String)], k: Int,
      decimalLift: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // NO materialization points, deliberately (measured, r14): the
    // multi-consumed frames here end at EXCHANGES (dl's shuffle agg
    // feeds both the corpus scalars and the scoring join), and Spark
    // collapses identical exchange subtrees within one physical plan
    // (ReusedExchange) — the repeated branch is computed ONCE per
    // job already. localCheckpoint variants measured SLOWER at every
    // size (toks: 1.5x; dl: 1.7x at sf0.1) because the eager
    // materialization splits the pipeline into extra jobs and writes
    // block storage for work the plan would have shared anyway. The
    // g_kcore checkpoint lesson is about ITERATIVE loops whose plans
    // grow per round — not single-plan DAGs with shared exchanges.
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val scalars = broadcast(dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("s_tokens")))
    val termList = terms.map(_._3).distinct
    val tf = toks.filter(col("tok").isin(termList: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val qt = broadcast(terms.toDF("query_id", "slot", "tok"))
    val scored = tf.join(qt, "tok")
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(scalars)
      .withColumn("idf",
        length(bin(expr("(2 * (n_docs + 1)) div (2 * df + 1)")))
          .cast("long"))
      .withColumn("c", col("idf").cast("double") * {
        // the two scorer products, in BIGINT (default — ample headroom
        // at test scale) or lifted to DECIMAL so a 100 TB corpus's
        // products can exceed 2^63 without changing the plan shape or
        // the result: explicit operand widths 9/18 keep every product
        // inside DECIMAL(38) in BOTH engines (Spark grows p1+p2+1
        // capped at 38; DuckDB grows w1+w2 and ERRORS past 38 —
        // 9+18=27, +9=36 stays legal), and an integer-valued decimal
        // casts to the same IEEE double as the equal BIGINT, so the
        // lifted ranking is bit-identical (t_bm25_decimal pins it
        // cross-engine against the same corpus).
        def d9(c: org.apache.spark.sql.Column) = c.cast("decimal(9,0)")
        def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
        val (num, den) =
          if (!decimalLift)
            (lit(44L) * col("s_tokens") * col("tf"),
              lit(20L) * col("s_tokens") * col("tf")
                + lit(6L) * col("s_tokens")
                + lit(18L) * col("n_docs") * col("dl"))
          else
            // n_docs rides d18, NOT d9: the 100 TB regime this lift
            // exists for is ~5e10 docs, past DECIMAL(9)'s 1e9 ceiling
            // (ANSI would throw; non-ANSI would NULL→0.0 while DuckDB
            // errors — cross-engine divergence either way). Widths
            // stay legal: Spark 9+18+1=28, +9+1=38; DuckDB 9+18=27,
            // +9=36. tf/dl keep d9 (both ≤ doc length < 1e9).
            (d9(lit(44L)) * d18(col("s_tokens")) * d9(col("tf")),
              d9(lit(20L)) * d18(col("s_tokens")) * d9(col("tf"))
                + d9(lit(6L)) * d18(col("s_tokens"))
                + d9(lit(18L)) * d18(col("n_docs")) * d9(col("dl")))
        num.cast("double") / den.cast("double")
      })
    val piv = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(
        coalesce(max(when(col("slot") === 1, col("c"))), lit(0.0))
          .as("c1"),
        coalesce(max(when(col("slot") === 2, col("c"))), lit(0.0))
          .as("c2"),
        coalesce(max(when(col("slot") === 3, col("c"))), lit(0.0))
          .as("c3"))
      .withColumn("score", col("c1") + col("c2") + col("c3"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    piv.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id").cast("long").as("query_id"),
        col("rank").cast("long").as("rank"), col("doc_id"),
        col("score"))
  }

  /** The BM25 oracle: the identical pipeline in DuckDB — same
    * quantized idf (`length(bin(...))` with `//`, floor ≡ truncation
    * on the all-positive operands), same integer-cleared tf ratio,
    * same fixed c1+c2+c3 chain, same (score desc, doc asc) ranking.
    */
  private[graft] def bm25Sql(terms: Seq[(Long, Int, String)], k: Int,
      decimalLift: Boolean = false): String = {
    val values = terms.map { case (q, s, t) => s"($q, $s, '$t')" }
      .mkString(", ")
    val inList = terms.map(_._3).distinct.map(t => s"'$t'")
      .mkString(", ")
    // the same operand-width discipline as the Spark side: 9/18-digit
    // casts keep every product ≤ DECIMAL(36) (DuckDB multiplies widths
    // additively and rejects results past 38)
    val (num, den) =
      if (!decimalLift)
        ("CAST(44 * sc.s_tokens * t.tf AS DOUBLE)",
          """CAST(20 * sc.s_tokens * t.tf + 6 * sc.s_tokens
            |            + 18 * sc.n_docs * l.dl AS DOUBLE)""".stripMargin)
      else
        ("""CAST(CAST(44 AS DECIMAL(9,0))
           |        * CAST(sc.s_tokens AS DECIMAL(18,0))
           |        * CAST(t.tf AS DECIMAL(9,0)) AS DOUBLE)""".stripMargin,
          """CAST(CAST(20 AS DECIMAL(9,0))
            |        * CAST(sc.s_tokens AS DECIMAL(18,0))
            |        * CAST(t.tf AS DECIMAL(9,0))
            |      + CAST(6 AS DECIMAL(9,0))
            |        * CAST(sc.s_tokens AS DECIMAL(18,0))
            |      + CAST(18 AS DECIMAL(9,0))
            |        * CAST(sc.n_docs AS DECIMAL(18,0))
            |        * CAST(l.dl AS DECIMAL(9,0)) AS DOUBLE)""".stripMargin)
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |sc AS (SELECT count(*) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS s_tokens FROM dl),
       |qt(query_id, slot, tok) AS (VALUES $values),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks
       |  WHERE tok IN ($inList) GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |scored AS (
       |  SELECT q.query_id, q.slot, t.doc_id,
       |    CAST(length(bin((2 * (sc.n_docs + 1)) // (2 * d.df + 1)))
       |      AS BIGINT) AS idf,
       |    CAST(length(bin((2 * (sc.n_docs + 1)) // (2 * d.df + 1)))
       |        AS DOUBLE)
       |      * ($num
       |        / $den) AS c
       |  FROM tf t JOIN qt q USING (tok) JOIN dfreq d USING (tok)
       |    JOIN dl l USING (doc_id) CROSS JOIN sc),
       |piv AS (
       |  SELECT query_id, doc_id,
       |    coalesce(max(CASE WHEN slot = 1 THEN c END), 0.0) AS c1,
       |    coalesce(max(CASE WHEN slot = 2 THEN c END), 0.0) AS c2,
       |    coalesce(max(CASE WHEN slot = 3 THEN c END), 0.0) AS c3
       |  FROM scored GROUP BY query_id, doc_id)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(rn AS BIGINT) AS rank, doc_id, score
       |FROM (SELECT query_id, doc_id, c1 + c2 + c3 AS score,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY c1 + c2 + c3 DESC, doc_id) AS rn
       |      FROM piv) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Synchronous label-propagation rounds for `g_labelprop`. Pinned
    * as an R-round object, the [[Round13Queries.KcorePeelRounds]]
    * discipline: equals converged LPA whenever propagation settles
    * within R rounds, and if a graph ever needed more, BOTH engines
    * still compute the identical R-round labels — the hash gate
    * cannot silently diverge either way.
    */
  private[graft] val LabelPropRounds = 4

  /** Community detection via synchronous label propagation over an
    * undirected edge list (a, b): every node starts labeled with
    * itself; each round every node adopts the MOST FREQUENT label
    * among its neighbors, ties broken by smallest label (the
    * deterministic variant — classic LPA tie-breaks randomly, which
    * no replayable engine can admit). Unlike min-label propagation
    * (= connected components, [[graft.dedup.Dedup.duplicateClusters]])
    * the mode update respects local density, so two cliques joined by
    * one bridge edge keep separate communities where CC merges them
    * (spec-pinned).
    *
    * Iterative discipline (the kcore/CC rules): the bidirectional
    * edge list is hash-partitioned ONCE on the probe side and
    * localCheckpoint'd; each round is one join + ONE exchange on v
    * (the mode count and its argmax window share the repartition);
    * per-round localCheckpoint truncates the growing lineage.
    */
  /** The node → community mapping after `rounds` synchronous LPA
    * rounds — the seam `g_modularity` shares, so the community
    * assignment cannot fork between the rollup query and the quality
    * metric. */
  private[graft] def labelPropLabels(
      s: org.apache.spark.sql.SparkSession,
      und: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame =
    labelPropLabelsOn(s, und.localCheckpoint(), rounds)

  /** [[labelPropLabels]] over an ALREADY-MATERIALIZED edge list — the
    * seam `modularity` uses so its own localCheckpoint of the edges
    * is not eagerly re-checkpointed a second time. */
  private def labelPropLabelsOn(
      s: org.apache.spark.sql.SparkSession,
      u: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bi = u.select($"a".as("v"), $"b".as("u"))
      .unionByName(u.select($"b".as("v"), $"a".as("u")))
      .repartition($"u").localCheckpoint()
    var labels = bi.select($"v".as("node")).distinct()
      .select($"node", $"node".as("lbl")).localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"v").orderBy($"n".desc, $"lbl".asc)
    for (_ <- 1 to rounds) {
      labels = bi.join(labels, $"u" === $"node")
        .repartition($"v")
        .groupBy($"v", $"lbl").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"v".as("node"), $"lbl")
        .localCheckpoint()
    }
    labels
  }

  private[graft] def labelProp(s: org.apache.spark.sql.SparkSession,
      und: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    labelPropLabels(s, und, rounds)
      .groupBy($"lbl").agg(count(lit(1)).as("n_nodes"),
        min($"node").as("min_node"))
      .select($"lbl".as("community"), $"n_nodes", $"min_node")
  }

  /** The unrolled R-round LPA CTE chain (after [[Coactivity.sqlUnd]] +
    * sqlBi): per round one neighbor-label count + one argmax
    * (count desc, label asc). Every l_i is MATERIALIZED — each is
    * referenced by the next round's count, and DuckDB's CTE inlining
    * would exponentiate the chain (the g_kcore lesson). Shared by the
    * `g_labelprop` and `g_modularity` oracles — one community
    * definition, two consumers.
    */
  private def lpaCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""c$i AS (
         |  SELECT bi.src AS v, l${i - 1}.lbl, count(*) AS n
         |  FROM bi JOIN l${i - 1} ON bi.dst = l${i - 1}.node
         |  GROUP BY bi.src, l${i - 1}.lbl),
         |l$i AS MATERIALIZED (
         |  SELECT v AS node, lbl FROM (
         |    SELECT v, lbl, ROW_NUMBER() OVER (PARTITION BY v
         |      ORDER BY n DESC, lbl) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""${Coactivity.sqlUnd},
       |${Coactivity.sqlBi},
       |l0 AS MATERIALIZED (
       |  SELECT node, node AS lbl FROM
       |    (SELECT DISTINCT src AS node FROM bi)),
       |$roundCtes""".stripMargin
  }

  private def labelPropSql(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)}
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |  min(node) AS min_node
       |FROM l$rounds GROUP BY lbl ORDER BY community""".stripMargin

  /** Newman modularity of the R-round LPA assignment, EXACT:
    * Q = Σ_c [e_c/m − (d_c/2m)²] = Σ_c (4·m·e_c − d_c²) / (4m²) —
    * the numerator stays in BIGINT (per-community `q_num`), the
    * single global double division happens once, so the quality
    * metric rides the hash gate without a transcendental or a
    * variable-order float sum. (BIGINT holds d_c² up to m ≈ 1.5·10⁹
    * edges; a 100 TB graph lifts the two products to DECIMAL(38) —
    * same plan.)
    */
  private[graft] def modularity(s: org.apache.spark.sql.SparkSession,
      und: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val u = und.localCheckpoint()
    val lab = labelPropLabelsOn(s, u, rounds)
    val m = broadcast(u.agg(count(lit(1)).as("m")))
    val la = lab.select($"node".as("na"), $"lbl".as("la"))
    val lb = lab.select($"node".as("nb"), $"lbl".as("lb"))
    val ein = u.join(la, $"a" === $"na").join(lb, $"b" === $"nb")
      .filter($"la" === $"lb")
      .groupBy($"la".as("c")).agg(count(lit(1)).as("e_in"))
    val deg = u.select($"a".as("v")).unionByName(u.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, $"v" === $"node")
      .groupBy($"lbl".as("c"))
      .agg(sum($"d").as("d_tot"), count(lit(1)).as("n_nodes"))
    val per = dc.join(ein, Seq("c"), "left")
      .crossJoin(m)
      .select($"c", $"n_nodes",
        coalesce($"e_in", lit(0L)).as("e_in"), $"d_tot", $"m")
      .withColumn("q_num",
        lit(4L) * $"m" * $"e_in" - $"d_tot" * $"d_tot")
    val tot = broadcast(per.agg(sum($"q_num").as("q_tot"),
      max($"m").as("m2")))
    per.crossJoin(tot)
      .select($"c".as("community"), $"n_nodes", $"e_in", $"d_tot",
        $"q_num",
        ($"q_tot".cast("double") /
          (lit(4L) * $"m2" * $"m2").cast("double")).as("modularity"))
  }

  private def modularitySql(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)},
       |mm AS (SELECT count(*) AS m FROM und),
       |lab AS (SELECT node, lbl FROM l$rounds),
       |ein AS (
       |  SELECT la.lbl AS c, count(*) AS e_in
       |  FROM und JOIN lab la ON und.a = la.node
       |    JOIN lab lb ON und.b = lb.node
       |  WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |deg AS (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY v),
       |dc AS (
       |  SELECT lab.lbl AS c, CAST(sum(deg.d) AS BIGINT) AS d_tot,
       |    count(*) AS n_nodes
       |  FROM deg JOIN lab ON deg.v = lab.node GROUP BY lab.lbl),
       |per AS (
       |  SELECT dc.c, dc.n_nodes,
       |    coalesce(ein.e_in, 0) AS e_in, dc.d_tot, mm.m,
       |    4 * mm.m * coalesce(ein.e_in, 0) - dc.d_tot * dc.d_tot
       |      AS q_num
       |  FROM dc LEFT JOIN ein ON dc.c = ein.c CROSS JOIN mm),
       |tot AS (SELECT CAST(sum(q_num) AS BIGINT) AS q_tot,
       |          max(m) AS m2 FROM per)
       |SELECT per.c AS community, CAST(per.n_nodes AS BIGINT) AS n_nodes,
       |  CAST(per.e_in AS BIGINT) AS e_in, per.d_tot,
       |  CAST(per.q_num AS BIGINT) AS q_num,
       |  CAST(tot.q_tot AS DOUBLE) / CAST(4 * tot.m2 * tot.m2 AS DOUBLE)
       |    AS modularity
       |FROM per CROSS JOIN tot ORDER BY community""".stripMargin

  /** Alignment-free duplicated-RUN scrub — the exact-substring dedup
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better") in its remove-the-span form: every positional
    * 8-token sliding shingle occurring in ≥ 2 DISTINCT docs marks its
    * 8 positions duplicated; overlapping-or-adjacent marked runs merge
    * into islands (gaps-and-islands over the start positions); marked
    * tokens are removed and the text rebuilt from the survivors in
    * order. The existing `curate_span_scrub` is CHUNK-ALIGNED
    * (non-overlapping 8-token blocks) — a duplicated run straddling a
    * chunk boundary is invisible to it; the sliding form catches
    * duplicated runs at ANY alignment, which is the actual Lee et al.
    * guarantee.
    *
    * Scale shape: hot-shingle discovery is ONE distinct + groupBy on
    * the shingle key (no pair join anywhere — a k-doc-shared run
    * costs k flag rows, never k², so no cap is needed); the covered
    * set is ≤ 8 rows per duplicated start (bounded linear); the
    * rebuild is the curate_line_dedup array_sort order restoration.
    * At 100 TB the shingle strings would shuffle as xxhash64 keys
    * (the d_substring_spans note) — same plan.
    */
  private[graft] def overlapScrub(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // NO materialization points, deliberately (measured, r14): the
    // expensive multi-consumed subtrees either end at exchanges the
    // plan SHARES via ReusedExchange (the hot-shingle aggregation
    // under both `covered` and `isl`) or are map-only derivations
    // (base/sh) that fuse into their consumers' stages for less than
    // their storage cost. Every checkpoint variant measured slower —
    // base+sh: 9x at 1x / 40x at 8x data; starts alone: 13x at 1x
    // (starts is NOT small on this corpus: a 31-word vocabulary makes
    // most 8-token shingles duplicated). The g_kcore checkpoint
    // lesson is about ITERATIVE loops whose plans grow per round —
    // not single-plan DAGs with shared exchanges.
    // toks' defining split is PINNED (r19, guide §4.4): unpinned,
    // the size predicate below is alias-substituted under this
    // projection and the split runs twice per qualifying doc (plan
    // audit: 2× split(trim(text)) in the Filter+Project pair)
    val base = docs.select(col("doc_id"),
      graft.functions.text.pinned(
        split(trim(col("text")), "\\s+")).as("toks"))
    val toks = base.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("p", "tok")))
    val sh = base.filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 8), " +
          "i -> struct(i AS i, array_join(slice(toks, i + 1, 8), ' ') " +
          "AS sh))")).as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.sh").as("sh"))
    val hot = sh.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("sh"))
    val starts = sh.join(hot, "sh").select(col("doc_id"), col("i"))
    val covered = starts
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + 7)).as("p"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
    val reb = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(p, tok))), " +
            "x -> x.tok)"), " ").as("scrubbed"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val isl = starts
      .withColumn("prev", lag(col("i"), 1).over(wl))
      .withColumn("brk",
        when(col("prev").isNull || col("i") - col("prev") > 8, 1L)
          .otherwise(0L))
      .groupBy(col("doc_id")).agg(sum(col("brk")).as("n_islands"))
    val dup = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_tokens"))
    base.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"))
      .join(isl, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(reb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        // NULL-vs-empty parity (the curate_line_dedup lesson): a doc
        // whose every token is covered has NO kept rows — emit the
        // empty-string signature explicitly on both engines
        Digest.strSig(coalesce(col("scrubbed"), lit("")))
          .as("scrub_sig"))
  }

  private val overlapScrubSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, u.i AS i,
       |    array_to_string(toks[u.i + 1 : u.i + 8], ' ') AS sh
       |  FROM t, unnest(range(0, len(toks) - 7)) AS u(i)
       |  WHERE len(toks) >= 8),
       |hot AS (
       |  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sh)
       |  GROUP BY sh HAVING count(*) >= 2),
       |starts AS (SELECT doc_id, i FROM sh JOIN hot USING (sh)),
       |covered AS (
       |  SELECT DISTINCT doc_id, u.p AS p
       |  FROM starts, unnest(range(i, i + 8)) AS u(p)),
       |toksp AS (
       |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
       |  FROM t, unnest(range(0, len(toks))) AS u(p)),
       |kept AS (
       |  SELECT tp.doc_id, tp.p, tp.tok FROM toksp tp
       |  ANTI JOIN covered c ON tp.doc_id = c.doc_id AND tp.p = c.p),
       |reb AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    array_to_string(list(tok ORDER BY p), ' ') AS scrubbed
       |  FROM kept GROUP BY doc_id),
       |isl AS (
       |  SELECT doc_id, CAST(sum(brk) AS BIGINT) AS n_islands FROM (
       |    SELECT doc_id,
       |      CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i)
       |          IS NULL
       |        OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
       |        THEN 1 ELSE 0 END AS brk
       |    FROM starts) GROUP BY doc_id),
       |dup AS (SELECT doc_id, count(*) AS n_dup FROM covered
       |        GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(isl.n_islands, 0) AS BIGINT) AS n_islands,
       |  CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_tokens,
       |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
       |  ${Digest.strSigSql("coalesce(reb.scrubbed, '')")} AS scrub_sig
       |FROM t LEFT JOIN isl USING (doc_id)
       |  LEFT JOIN dup USING (doc_id)
       |  LEFT JOIN reb USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** KMV (k-minimum-values) distinct sketch per group over any
    * (event_type, user_id) frame: the k smallest distinct 60-bit md5
    * hashes per group, estimate (k−1)·2^60/h_k when ≥ k distinct
    * hashes exist, the exact count below k. Emitted twice from one
    * plan — computed globally and as 8 per-shard sketches merged —
    * because the merge is a THEOREM (the global k smallest hashes are
    * a subset of the union of per-shard k smallest, so re-taking k
    * smallest after the union reproduces the global sketch exactly),
    * which is what makes the sketch distributable: per-partition
    * sketches combine with zero approximation loss. The k-min
    * aggregation is the bounded [[graft.functions.TopKAgg]] buffer
    * (map-side partials cap at k entries per group).
    */
  private[graft] def kmvSketch(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val topk = graft.functions.TopKAgg.topK(KmvK)
    // shard via `%` (truncated remainder), NOT pmod: the DuckDB oracle
    // shards with `user_id % 8`, and Spark's `%` is the same truncated
    // remainder for every sign — pmod would silently diverge on a
    // negative id (r14 ADVICE). The shard is only a grouping key, so a
    // negative shard value is harmless; what matters is that both
    // engines compute the IDENTICAL partition of ids.
    val h = events.select(col("event_type"),
      (col("user_id") % lit(8L)).as("shard"),
      graft.functions.text
        .md5_prefix64(col("user_id").cast("string"), 15).as("h"))
    // KMV is defined over DISTINCT hash values; v = -h makes the
    // descending TopKAgg buffer hold the k SMALLEST hashes
    // (ascending h), id carries the hash itself
    val glob = h.select(col("event_type"), col("h")).distinct()
      .groupBy(col("event_type"))
      .agg(topk(negate(col("h")), col("h")).as("mins"),
        count(lit(1)).as("exact_distinct"))
    // the merge path: per-shard k-min sketches, then union +
    // re-sketch
    val sharded = h.select(col("event_type"), col("shard"), col("h"))
      .distinct()
      .groupBy(col("event_type"), col("shard"))
      .agg(topk(negate(col("h")), col("h")).as("mins"))
      .select(col("event_type"), explode(col("mins.id")).as("h"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(topk(negate(col("h")), col("h")).as("mins"),
        count(lit(1)).as("n_union"))
    def est(mins: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
      when(n < KmvK, n.cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) *
          lit(KmvSpace).cast("double") /
          element_at(mins, KmvK).getField("id").cast("double"))
    glob.join(sharded.select(col("event_type").as("et2"),
          col("mins").as("mins_merged"), col("n_union")),
        col("event_type") === col("et2"))
      .select(col("event_type"), col("exact_distinct"),
        est(col("mins"), col("exact_distinct")).as("kmv_est"),
        est(col("mins_merged"), col("n_union")).as("kmv_est_merged"))
  }

  /** Sketch ALGEBRA over per-group KMV sketches — union and
    * intersection cardinality estimates for every group pair computed
    * from the k-min arrays ONLY (never rescanning the raw data):
    * the union of two k-min sketches re-truncated to k IS the k-min
    * sketch of the union (the same theorem [[kmvSketch]]'s merge
    * column witnesses), so |A∪B| estimates exactly like a first-class
    * sketch; |A∩B| follows by inclusion–exclusion as the FIXED chain
    * (est_a + est_b) − est_union. Each estimate falls back to the
    * exact count below k (a sub-k sketch is the complete hash set,
    * and two complete sets union to a complete set). This is the
    * 100 TB interactive-analytics story: pairwise overlap of
    * arbitrarily large groups answered from k-row summaries.
    */
  private[graft] def kmvSetOps(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val topk = graft.functions.TopKAgg.topK(KmvK)
    val h = events.select(col("event_type"),
        graft.functions.text
          .md5_prefix64(col("user_id").cast("string"), 15).as("h"))
      .distinct()
    val sk = h.groupBy(col("event_type"))
      .agg(topk(negate(col("h")), col("h")).as("mins"),
        count(lit(1)).as("nd"))
      .select(col("event_type"),
        expr("transform(mins, x -> x.id)").as("mins"), col("nd"))
    val x = sk.select(col("event_type").as("et_a"),
      col("mins").as("ma"), col("nd").as("na"))
    val y = sk.select(col("event_type").as("et_b"),
      col("mins").as("mb"), col("nd").as("nb"))
    def est(n: org.apache.spark.sql.Column,
            hk: org.apache.spark.sql.Column) =
      when(n < KmvK, n.cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) *
          lit(KmvSpace).cast("double") / hk.cast("double"))
    x.join(y, col("et_a") < col("et_b"))
      .withColumn("un", array_sort(array_union(col("ma"), col("mb"))))
      .withColumn("nu", size(col("un")).cast("long"))
      .withColumn("est_a",
        est(col("na"), element_at(col("ma"), KmvK)))
      .withColumn("est_b",
        est(col("nb"), element_at(col("mb"), KmvK)))
      .withColumn("union_est",
        est(col("nu"), element_at(col("un"), KmvK)))
      .select(col("et_a"), col("et_b"), col("union_est"),
        ((col("est_a") + col("est_b")) - col("union_est"))
          .as("intersect_est"))
  }

  private val kmvSetOpsSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS h
       |  FROM events),
       |sk AS (
       |  SELECT event_type,
       |    list_sort(list(h ORDER BY h))[:$KmvK] AS mins,
       |    count(*) AS nd
       |  FROM h GROUP BY event_type),
       |pairs AS (
       |  SELECT x.event_type AS et_a, y.event_type AS et_b,
       |    x.mins AS ma, y.mins AS mb, x.nd AS na, y.nd AS nb,
       |    list_sort(list_distinct(x.mins || y.mins)) AS un
       |  FROM sk x JOIN sk y ON x.event_type < y.event_type),
       |est AS (
       |  SELECT et_a, et_b,
       |    CASE WHEN na < $KmvK THEN CAST(na AS DOUBLE)
       |      ELSE CAST(${KmvK - 1} AS DOUBLE)
       |        * CAST($KmvSpace AS DOUBLE) / CAST(ma[$KmvK] AS DOUBLE)
       |    END AS est_a,
       |    CASE WHEN nb < $KmvK THEN CAST(nb AS DOUBLE)
       |      ELSE CAST(${KmvK - 1} AS DOUBLE)
       |        * CAST($KmvSpace AS DOUBLE) / CAST(mb[$KmvK] AS DOUBLE)
       |    END AS est_b,
       |    CASE WHEN len(un) < $KmvK THEN CAST(len(un) AS DOUBLE)
       |      ELSE CAST(${KmvK - 1} AS DOUBLE)
       |        * CAST($KmvSpace AS DOUBLE) / CAST(un[$KmvK] AS DOUBLE)
       |    END AS union_est
       |  FROM pairs)
       |SELECT et_a, et_b, union_est,
       |  (est_a + est_b) - union_est AS intersect_est
       |FROM est ORDER BY et_a, et_b""".stripMargin

  /** Reciprocal-rank fusion of the brute cosine and brute MIPS
    * rankings over one corpus: per query the top-`kEach` list from
    * each ranker, FULL OUTER merged per (query, neighbor), fused as
    * 1/(60+rank) with an absent rank contributing exactly 0.0 (the
    * standard RRF convention — presence in either list suffices),
    * re-ranked (score desc, neighbor asc), top `kOut` kept. The
    * fused score is a FIXED two-term float chain (one int→double
    * cast, one add, one divide per term), so it is bit-identical
    * cross-engine; 60 is the conventional RRF smoothing constant.
    */
  private[graft] def hybridRrf(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, kEach: Int, kOut: Int)
      : org.apache.spark.sql.DataFrame = {
    val cosR = graft.similarity.Knn
      .bruteForceTopK(corpus, queries, idCol, vecCol, kEach)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("rank_cos"))
    val dotR = graft.similarity.Knn
      .mipsTopK(corpus, queries, idCol, vecCol, kEach)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("rank_dot"))
    val fused = cosR.join(dotR, Seq("query_id", "neighbor_id"),
        "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (when(col("rank_cos").isNull, lit(0.0))
          .otherwise(lit(1.0) /
            (lit(60.0) + col("rank_cos").cast("double")))
        + when(col("rank_dot").isNull, lit(0.0))
          .otherwise(lit(1.0) /
            (lit(60.0) + col("rank_dot").cast("double"))))
          .as("rrf_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("neighbor_id"))
    fused.withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= kOut)
      .select(col("query_id"),
        col("rrf_rank").cast("long").as("rrf_rank"),
        col("neighbor_id"), col("rrf_score"))
  }

  def all: Seq[Q] = Seq(

    Q("agg_kmv_distinct",
      "Mergeable KMV (k-minimum-values) distinct sketch per group — " +
        "the distributed approx-COUNT-DISTINCT whose merge is " +
        "PROVABLE: the k smallest distinct 60-bit md5 hashes per " +
        "event_type, estimate (k-1)*2^60/h_k (exact count below k). " +
        "Emitted TWICE from one plan: computed globally, and computed " +
        "as 8 per-shard sketches merged (union of per-shard k-mins " +
        "superset-contains the global k-mins, so re-taking k smallest " +
        "after the union is EXACTLY the global sketch) — the two " +
        "columns are equal BY THEOREM, which is the 100 TB story: " +
        "per-partition sketches combine without approximation loss. " +
        "The k-min aggregation is the bounded TopKAgg buffer (map-side " +
        "partials cap at k entries, so huge groups shuffle k rows per " +
        "partition, not all); the estimate is a fixed int->double " +
        "cast + one multiply + one divide, bit-identical cross-engine. " +
        "sf0.001 has 15 distinct users per type (below k) so the " +
        "exact-count branch is exercised there, the sketch branch at " +
        "the larger SFs.",
      (s, d) => {
        import s.implicits._
        kmvSketch(Tables.events(s, d).select($"event_type", $"user_id"))
          .orderBy($"event_type")
      },
      Some(s"""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) AS h
             |  FROM events),
             |ranked AS (
             |  SELECT event_type, h,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
             |      AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS nd
             |  FROM h),
             |gk AS (
             |  SELECT event_type, max(nd) AS nd,
             |    max(CASE WHEN rn = $KmvK THEN h END) AS hk
             |  FROM ranked WHERE rn <= $KmvK GROUP BY event_type),
             |hs AS (
             |  SELECT DISTINCT event_type, user_id % 8 AS shard,
             |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) AS h
             |  FROM events),
             |sr AS (
             |  SELECT event_type, h,
             |    ROW_NUMBER() OVER (PARTITION BY event_type, shard
             |      ORDER BY h) AS rn
             |  FROM hs),
             |un AS (SELECT DISTINCT event_type, h FROM sr
             |       WHERE rn <= $KmvK),
             |ur AS (
             |  SELECT event_type, h,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
             |      AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS nu
             |  FROM un),
             |mg AS (
             |  SELECT event_type, max(nu) AS nu,
             |    max(CASE WHEN rn = $KmvK THEN h END) AS hk
             |  FROM ur WHERE rn <= $KmvK GROUP BY event_type)
             |SELECT g.event_type,
             |  CAST(g.nd AS BIGINT) AS exact_distinct,
             |  CASE WHEN g.nd < $KmvK THEN CAST(g.nd AS DOUBLE)
             |    ELSE CAST(${KmvK - 1} AS DOUBLE)
             |      * CAST($KmvSpace AS DOUBLE) / CAST(g.hk AS DOUBLE)
             |  END AS kmv_est,
             |  CASE WHEN m.nu < $KmvK THEN CAST(m.nu AS DOUBLE)
             |    ELSE CAST(${KmvK - 1} AS DOUBLE)
             |      * CAST($KmvSpace AS DOUBLE) / CAST(m.hk AS DOUBLE)
             |  END AS kmv_est_merged
             |FROM gk g JOIN mg m USING (event_type)
             |ORDER BY g.event_type""".stripMargin)),

    Q("e_hybrid_rrf",
      "Hybrid retrieval: reciprocal-rank fusion of the brute cosine " +
        "ranking (angle signal) and the brute MIPS ranking (magnitude " +
        "signal) — the standard combiner for lexical+vector or " +
        "multi-scorer search, and on unnormalized vectors the two " +
        "rankings genuinely differ (spec-pinned since e_knn_mips). " +
        "Per query: top-10 from each ranker, FULL OUTER merge per " +
        "(query, neighbor), score = 1/(60+rank_cos) + 1/(60+rank_dot) " +
        "with an absent rank contributing exactly 0.0 — a FIXED " +
        "two-term float chain, bit-identical cross-engine — then " +
        "re-rank (score desc, neighbor asc), top-5 kept. Rank lists " +
        "are k rows per query (broadcast-sized), so the fusion join " +
        "is trivially local at any corpus scale; the expensive part " +
        "stays in the rankers, which scale via the IVF/LSH/PQ " +
        "serving paths already registered.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        hybridRrf(emb, emb.filter($"vec_id" < 10), "vec_id",
            "embedding", kEach = 10, kOut = 5)
          .orderBy($"query_id", $"rrf_rank")
      },
      Some(OracleGen.hybridRrfSql(dim = 64, kEach = 10, kOut = 5,
        maxQueryId = 10))),

    Q("t_bm25_topk",
      "BM25 lexical retrieval (k1=1.2, b=0.75): per-query top-10 docs " +
        "over an inverted-list-shaped plan — the token explode feeds " +
        "ONE aggregation filtered to the query terms (the postings " +
        "pushdown), df/query-terms/corpus-scalars are broadcast-sized, " +
        "and only docs containing >= 1 query term are scored. Two " +
        "documented exactness choices make the ranking hash-exact " +
        "cross-engine: idf is BIT-LENGTH-QUANTIZED (factor-of-2 idf " +
        "buckets via length(bin(2(N+1) div (2 df+1))) — ln-idf is a " +
        "transcendental whose last ulp varies by libm), and the tf " +
        "normalization is the exact integer ratio 44 S tf / (20 S tf " +
        "+ 6 S + 18 N dl) (k1=6/5, b=3/4 cleared over 20 S N), cast " +
        "to double ONCE each side of a single divide; the per-query " +
        "score is the FIXED chain (c1+c2)+c3 over slot-pivoted " +
        "contributions, never a SUM over a variable row set — the " +
        "e_knn dot-chain discipline applied to lexical scoring. The " +
        "'dup' term (df ~5% of docs) exercises real idf variation.",
      (s, d) => {
        import s.implicits._
        bm25TopK(s, Tables.documents(s, d).select($"doc_id", $"text"),
            Bm25Terms, k = 10)
          .orderBy($"query_id", $"rank")
      },
      Some(bm25Sql(Bm25Terms, k = 10))),

    Q("g_labelprop",
      "Community detection via synchronous label propagation over the " +
        "co-activity graph — 4 pinned rounds, every node adopting the " +
        "MOST FREQUENT neighbor label (ties to the smallest label: " +
        "the deterministic LPA variant; classic LPA tie-breaks " +
        "randomly, which no replayable engine can admit). The mode " +
        "update respects local density, so it is NOT connected " +
        "components: two cliques joined by one bridge edge keep " +
        "separate communities where min-label propagation merges " +
        "them (spec-pinned). Iterative discipline per the kcore/CC " +
        "operators: edge list bidirectionalized + hash-partitioned " +
        "once, one join + ONE exchange per round (the mode count and " +
        "its argmax window share the repartition), per-round " +
        "localCheckpoint. Oracle = the 4-round unrolled MATERIALIZED " +
        "CTE chain over the shared co-activity prefix.",
      (s, d) => {
        import s.implicits._
        labelProp(s, Coactivity.und(s, d), LabelPropRounds)
          .orderBy($"community")
      },
      Some(labelPropSql(LabelPropRounds))),

    Q("curate_overlap_scrub",
      "Alignment-free duplicated-RUN scrub (exact substring dedup in " +
        "its remove-the-span form, Lee et al. 2021): every positional " +
        "8-token SLIDING shingle occurring in >= 2 distinct docs marks " +
        "its positions; overlapping-or-adjacent marked runs merge into " +
        "islands (gaps-and-islands windows, both engines); marked " +
        "tokens are removed and the text rebuilt in order " +
        "(array_sort order restoration + the NULL-vs-empty md5 parity " +
        "for fully-duplicated docs). curate_span_scrub is CHUNK-" +
        "aligned — a duplicated run straddling a chunk boundary is " +
        "invisible to it; the sliding form catches runs at ANY " +
        "alignment, the actual Lee et al. guarantee. No pair join " +
        "anywhere: a k-doc-shared run costs k flag rows, never k^2, " +
        "so this needs no hot-bucket cap.",
      (s, d) => {
        import s.implicits._
        overlapScrub(Tables.documents(s, d).select($"doc_id", $"text"))
          .orderBy($"doc_id")
      },
      Some(overlapScrubSql)),

    Q("g_modularity",
      "Newman modularity of the 4-round LPA community assignment, " +
        "EXACT: Q = sum_c (4 m e_c - d_c^2) / (4 m^2) — per-community " +
        "numerators stay BIGINT (q_num column), the ONE global double " +
        "division happens once via broadcast 1-row aggregates (no " +
        "variable-order float sum, no transcendental), so the " +
        "community-QUALITY metric rides the hash gate. Shares the LPA " +
        "label derivation with g_labelprop through labelPropLabels / " +
        "lpaCtes — one community definition, two consumers (the " +
        "Coactivity sharing rule). e_in via two co-keyed label joins " +
        "on the checkpointed edge list; degrees from one union-all " +
        "rollup. Bridged-clique fixture pins Q = 286/676 in the spec.",
      (s, d) => {
        import s.implicits._
        modularity(s, Coactivity.und(s, d), LabelPropRounds)
          .orderBy($"community")
      },
      Some(modularitySql(LabelPropRounds))),

    Q("agg_kmv_setops",
      "Sketch ALGEBRA: union and intersection cardinality estimates " +
        "for every event_type pair computed from the per-group KMV " +
        "k-min arrays ONLY — never rescanning raw data. Union of two " +
        "k-min sketches re-truncated to k IS the sketch of the union " +
        "(the kmvSketch merge theorem), so |A u B| estimates like a " +
        "first-class sketch; |A n B| by inclusion-exclusion as the " +
        "FIXED chain (est_a + est_b) - est_union; each estimate falls " +
        "back to the exact count below k (sub-k sketches are complete " +
        "hash sets). The 100 TB story: pairwise overlap of arbitrarily " +
        "large groups answered from k-row summaries — the sketches " +
        "shuffle 64 BIGINTs per group, the pair join is " +
        "groups-squared rows of 64-element arrays, data-free.",
      (s, d) => {
        import s.implicits._
        kmvSetOps(Tables.events(s, d).select($"event_type", $"user_id"))
          .orderBy($"et_a", $"et_b")
      },
      Some(kmvSetOpsSql)),

    Q("stream_kmv_sketch",
      "STREAMING KMV distinct sketch — the batch sketch run through " +
        "flatMapGroupsWithState with BOUNDED k-long state per group " +
        "(the k smallest distinct hashes; a duplicate of a kept hash " +
        "is caught by membership, a hash above the running k-th min " +
        "provably cannot enter the sketch, so skipping it is exact). " +
        "k-min of a set is arrival-order-INSENSITIVE by theorem, so a " +
        "run over the full corpus must reproduce the batch KMV row " +
        "for row — the oracle pins exactly that, including the same " +
        "fixed (k-1)*2^60/h_k chain computed JVM-side (IEEE-identical " +
        "to the Spark/DuckDB expression). This is what makes the " +
        "sketch the streaming approx-distinct at 100 TB: per-group " +
        "state is 64 longs forever, where exact streaming distinct " +
        "state grows with cardinality.",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        val out = graft.streaming.Streams.runToMemoryAppend(s,
            s"stream_kmv_${System.nanoTime()}") { scoped =>
          val stream = graft.streaming.Streams.fileStream(scoped,
            s"$d/events.*", schema, maxFilesPerTrigger = Int.MaxValue)
          graft.streaming.Streams.streamingKmv(stream, KmvK, KmvSpace)
        }
        out.orderBy($"event_type")
      },
      Some(s"""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
             |      1, 15)) AS BIGINT) AS h
             |  FROM events),
             |ranked AS (
             |  SELECT event_type, h,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
             |      AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS nd
             |  FROM h),
             |gk AS (
             |  SELECT event_type, max(nd) AS nd,
             |    max(CASE WHEN rn = $KmvK THEN h END) AS hk
             |  FROM ranked WHERE rn <= $KmvK GROUP BY event_type)
             |SELECT event_type,
             |  CAST(least(nd, $KmvK) AS BIGINT) AS n_mins,
             |  CASE WHEN nd < $KmvK THEN CAST(nd AS DOUBLE)
             |    ELSE CAST(${KmvK - 1} AS DOUBLE)
             |      * CAST($KmvSpace AS DOUBLE) / CAST(hk AS DOUBLE)
             |  END AS kmv_est
             |FROM gk ORDER BY event_type""".stripMargin)),

    Q("j_interval_overlap",
      "Keyless interval x interval OVERLAP join (a_start < b_end AND " +
        "b_start < a_end) via Relational.intervalOverlapJoin — the " +
        "STABBING decomposition (r15): two half-open intervals " +
        "overlap exactly when the LATER start lies inside the other " +
        "interval, so the op is TWO span-tiered point-in-interval " +
        "legs (right starts stabbing left intervals, ties included; " +
        "left starts stabbing right intervals, ties excluded) whose " +
        "union is exact WITHOUT a distinct or pair-dedup rule. Each " +
        "leg keeps intervals in their <= 2 home-tier buckets and " +
        "replicates only the start POINTS across the in-plan tier " +
        "universe, so a span outlier cannot pull the fine intervals " +
        "into its coarse buckets (the r14 verdict's perf-weak " +
        "finding; per-leg occupancy rides the " +
        "interval_overlap_occupancy_l/_r observes). The naive " +
        "predicate plans as BroadcastNestedLoopJoin (spec-pinned " +
        "control); the oracle replays it through DuckDB's IEJoin — a " +
        "genuinely different algorithm pinning the rewrite " +
        "pair-for-pair. 7-day windows (1-in-97 orders) against " +
        "11-day windows (1-in-89 orders), deliberately unaligned.",
      (s, d) => {
        import s.implicits._
        val a = Tables.table(s, d, "orders")
          .filter($"o_orderkey" % 97 === 0)
          .select($"o_orderkey".as("a_id"),
            $"o_orderdate".as("a_start"),
            ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as("a_end"))
        val b = Tables.table(s, d, "orders")
          .filter($"o_orderkey" % 89 === 0)
          .select($"o_orderkey".as("b_id"),
            $"o_orderdate".as("b_start"),
            ($"o_orderdate" + expr("INTERVAL 11 DAYS")).as("b_end"))
        graft.ops.Relational.intervalOverlapJoin(a, b,
            "a_start", "a_end", "b_start", "b_end")
          .groupBy($"a_id")
          .agg(count(lit(1)).as("n_overlap"), min($"b_id").as("first_b"))
          .orderBy($"a_id")
      },
      Some("""WITH a AS (
             |  SELECT o_orderkey AS a_id, o_orderdate AS a_start,
             |    o_orderdate + INTERVAL 7 DAY AS a_end
             |  FROM orders WHERE o_orderkey % 97 = 0),
             |b AS (
             |  SELECT o_orderkey AS b_id, o_orderdate AS b_start,
             |    o_orderdate + INTERVAL 11 DAY AS b_end
             |  FROM orders WHERE o_orderkey % 89 = 0)
             |SELECT a_id, count(*) AS n_overlap, min(b_id) AS first_b
             |FROM a JOIN b ON a_start < b_end AND b_start < a_end
             |GROUP BY a_id ORDER BY a_id""".stripMargin)),

    Q("e_knn_filtered_ivf",
      "FILTERED vector search over a SHARED index — the vector-DB " +
        "serving pattern where a metadata predicate (label = 3) " +
        "restricts candidates but the IVF index is built ONCE on the " +
        "full corpus, not per predicate: centroids come from " +
        "Knn.md5Centroids on the UNfiltered corpus, while cell " +
        "assignment + probe scoring run over the filtered subset " +
        "through the unchanged ivfTopKWithCentroids (assignment is a " +
        "pure map, so filter-before-assign equals filter-after). The " +
        "oracle replays exactly that asymmetry (cent unfiltered, " +
        "cells filtered). Filtered search needs MORE probes than " +
        "unfiltered for equal recall (candidates thin out per cell) — " +
        "registered at nProbe=6 of 16; the spec pins nProbe=nCells " +
        "ranks EXACTLY equal to brute-over-filtered-subset.",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cents = graft.similarity.Knn
          .md5Centroids(emb, "vec_id", "embedding", nCells = 16)
        graft.similarity.Knn.ivfTopKWithCentroids(
            emb.filter($"label" === 3), emb.filter($"vec_id" < 10),
            "vec_id", "embedding", k = 5, cents.toSeq, nProbe = 6)
          .select($"query_id", $"neighbor_id",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(OracleGen.knnIvfFilteredSql(dim = 64, nCells = 16,
        nProbe = 6, k = 5, maxQueryId = 10, corpusPred = "label = 3"))),

    Q("j_spatial_grid",
      "Keyless 2-D radius self-join via GRID bucketing " +
        "(Relational.gridNeighborJoin) — the spatial analogue of the " +
        "interval joins: points land in (floor(x/eps), floor(y/eps)) " +
        "cells, the left side probes its 3x3 neighborhood (lossless: " +
        "a true pair's cells differ by <= 1 per axis since |dx| <= " +
        "eps), the right side stays single-cell so every pair meets " +
        "EXACTLY once (no distinct), the exact dx^2+dy^2 <= eps^2 " +
        "predicate filters. Naive is a cross join (quadratic); this " +
        "is one equi join on the cell key, shuffle proportional to " +
        "9x|points|. Points = the first two embedding components; " +
        "output = per-point epsilon-neighbor counts including zeros. " +
        "The oracle IS the naive quadratic join — a different " +
        "algorithm pinning the grid rewrite pair for pair.",
      (s, d) => {
        import s.implicits._
        val pts = Tables.embeddings(s, d).select($"vec_id",
          element_at($"embedding", 1).as("x"),
          element_at($"embedding", 2).as("y"))
        val pairs = graft.ops.Relational.gridNeighborJoin(
          pts, "vec_id", "x", "y", eps = 0.05)
        // ONE traversal of the pair join: exploding both endpoints
        // from each pair row (a union of two selects would plan the
        // 9x-explode equi join twice — the branches differ in
        // projection, so exchange reuse cannot collapse them)
        val cnt = pairs
          .select(explode(array($"a_id", $"b_id")).as("id"))
          .groupBy($"id").agg(count(lit(1)).as("n"))
        pts.select($"vec_id").join(cnt, $"vec_id" === $"id", "left")
          .select($"vec_id", coalesce($"n", lit(0L)).as("n_neighbors"))
          .orderBy($"vec_id")
      },
      Some("""WITH p AS (
             |  SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
             |    CAST(embedding[2] AS DOUBLE) AS y
             |  FROM embeddings),
             |pairs AS (
             |  SELECT a.id AS a_id, b.id AS b_id
             |  FROM p a JOIN p b ON a.id < b.id
             |    AND (a.x - b.x) * (a.x - b.x)
             |      + (a.y - b.y) * (a.y - b.y) <= 0.05 * 0.05),
             |cnt AS (
             |  SELECT id, count(*) AS n FROM (
             |    SELECT a_id AS id FROM pairs
             |    UNION ALL SELECT b_id FROM pairs)
             |  GROUP BY id)
             |SELECT p.id AS vec_id,
             |  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_neighbors
             |FROM p LEFT JOIN cnt USING (id)
             |ORDER BY vec_id""".stripMargin)),

    Q("agg_cms_topk",
      "Count-min sketch — the mergeable counting sketch beside KMV's " +
        "distinct sketch: d=4 hash rows x w=256 columns of BIGINT " +
        "counts (the cells are pure SUMS, so per-partition sketches " +
        "merge by addition — the 100 TB counting story), key column " +
        "via md5(row:key), estimate = min over the 4 rows' cells. " +
        "The estimate can only OVERCOUNT (collisions add, never " +
        "subtract — spec-pinned est >= true on every key); w is " +
        "deliberately small so collisions are exercised on natural " +
        "data rather than vacuously absent. Emitted per user_id < 20 " +
        "beside the exact count, both integer-exact cross-engine.",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id")
        val rows = broadcast(s.range(0, 4L).toDF("r"))
        def cellCol = pmod(graft.functions.text.md5_prefix64(
          concat($"r".cast("string"), lit(":"),
            $"user_id".cast("string")), 15), lit(256L))
        // the sketch-build side's hash is PINNED (r19, guide §4.4):
        // the q-side join infers isnotnull(c) and unpinned that
        // substitutes the md5 chain below this projection — the hash
        // then runs TWICE per (event, row) on the 4N-row side (plan
        // audit). Pinned, the inferred filter references the
        // attribute and still prunes NULL keys before the groupBy.
        val cells = ev.crossJoin(rows)
          .select($"r", graft.functions.text.pinned(cellCol).as("c"))
          .groupBy($"r", $"c").agg(count(lit(1)).as("n"))
        val q = ev.filter($"user_id" < 20)
          .groupBy($"user_id").agg(count(lit(1)).as("true_n"))
        q.crossJoin(rows)
          .select($"user_id", $"true_n", $"r", cellCol.as("c"))
          .join(broadcast(cells), Seq("r", "c"))
          .groupBy($"user_id", $"true_n")
          .agg(min($"n").as("cms_est"))
          .select($"user_id", $"true_n", $"cms_est")
          .orderBy($"user_id")
      },
      Some("""WITH rows4 AS (SELECT unnest(range(0, 4)) AS r),
             |h AS (
             |  SELECT r, CAST(concat('0x', substr(md5(
             |      CAST(r AS VARCHAR) || ':' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |    % 256 AS c, user_id
             |  FROM events CROSS JOIN rows4),
             |cells AS (SELECT r, c, count(*) AS n FROM h
             |          GROUP BY r, c),
             |q AS (SELECT user_id, count(*) AS true_n FROM events
             |      WHERE user_id < 20 GROUP BY user_id),
             |qh AS (
             |  SELECT q.user_id, q.true_n, rows4.r,
             |    CAST(concat('0x', substr(md5(
             |      CAST(rows4.r AS VARCHAR) || ':' ||
             |      CAST(q.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 256 AS c
             |  FROM q CROSS JOIN rows4)
             |SELECT qh.user_id, CAST(qh.true_n AS BIGINT) AS true_n,
             |  CAST(min(cells.n) AS BIGINT) AS cms_est
             |FROM qh JOIN cells USING (r, c)
             |GROUP BY qh.user_id, qh.true_n
             |ORDER BY qh.user_id""".stripMargin)),

    Q("curate_gopher_rules",
      "The published Gopher quality-filter rules (Rae et al. 2021, " +
        "App. A) as per-doc integer-exact predicates — every ratio " +
        "threshold CROSS-MULTIPLIED so no float division exists: " +
        "word count in [50, 100000]; mean word length in [3, 10] " +
        "(3*n_words <= sum_word_chars <= 10*n_words); words-with-an-" +
        "alphabetic-char fraction >= 0.80 (5*n_alpha >= 4*n_words); " +
        "hash/ellipsis symbol-to-word ratio <= 0.1 (10*n_sym <= " +
        "n_words); >= 2 stop words from the published 8-word list. " +
        "Output = per-doc rule booleans + the conjunction, so " +
        "downstream corpus curation is one filter on `keep` — and " +
        "the per-rule columns make filter ATTRIBUTION queryable " +
        "(which rule kills how much corpus), the part production " +
        "pipelines actually monitor. One token explode -> one " +
        "aggregation; no joins.",
      (s, d) => {
        import s.implicits._
        val stopList = Seq("the", "be", "to", "of", "and", "that",
          "have", "with")
        val toks = Tables.documents(s, d)
          .select($"doc_id", $"text",
            explode(split(trim($"text"), "\\s+")).as("tok"))
        val agg = toks.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(length($"tok")).as("word_chars"),
            sum(when($"tok".rlike("[a-zA-Z]"), 1L).otherwise(0L))
              .as("n_alpha"),
            sum(when($"tok".isin(stopList: _*), 1L).otherwise(0L))
              .as("n_stop"),
            // '#' or '...' occurrences across the doc's tokens —
            // `div`, not `/`: Column./ on ints is DOUBLE division,
            // DuckDB's `//` is integer (all operands non-negative so
            // floor ≡ truncate); literal replace() on both engines
            sum(expr("(length(tok) - length(replace(tok, '#', '')))" +
              " + (length(tok) - length(replace(tok, '...', '')))" +
              " div 3").cast("long")).as("n_sym"))
        agg.select($"doc_id", $"n_words",
            ($"n_words" >= 50L && $"n_words" <= 100000L).as("wc_ok"),
            (lit(3L) * $"n_words" <= $"word_chars" &&
              $"word_chars" <= lit(10L) * $"n_words")
              .as("mean_len_ok"),
            (lit(5L) * $"n_alpha" >= lit(4L) * $"n_words")
              .as("alpha_ok"),
            (lit(10L) * $"n_sym" <= $"n_words").as("symbol_ok"),
            ($"n_stop" >= 2L).as("stopword_ok"))
          .withColumn("keep", $"wc_ok" && $"mean_len_ok" &&
            $"alpha_ok" && $"symbol_ok" && $"stopword_ok")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_words,
             |    CAST(sum(length(tok)) AS BIGINT) AS word_chars,
             |    CAST(sum(CASE WHEN regexp_matches(tok, '[a-zA-Z]')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
             |    CAST(sum(CASE WHEN tok IN ('the','be','to','of',
             |      'and','that','have','with') THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_stop,
             |    CAST(sum((length(tok) -
             |        length(replace(tok, '#', '')))
             |      + (length(tok) -
             |        length(replace(tok, '...', ''))) // 3)
             |      AS BIGINT) AS n_sym
             |  FROM toks GROUP BY doc_id)
             |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             |  (n_words >= 50 AND n_words <= 100000) AS wc_ok,
             |  (3 * n_words <= word_chars
             |    AND word_chars <= 10 * n_words) AS mean_len_ok,
             |  (5 * n_alpha >= 4 * n_words) AS alpha_ok,
             |  (10 * n_sym <= n_words) AS symbol_ok,
             |  (n_stop >= 2) AS stopword_ok,
             |  ((n_words >= 50 AND n_words <= 100000)
             |    AND (3 * n_words <= word_chars
             |      AND word_chars <= 10 * n_words)
             |    AND (5 * n_alpha >= 4 * n_words)
             |    AND (10 * n_sym <= n_words)
             |    AND (n_stop >= 2)) AS keep
             |FROM agg ORDER BY doc_id""".stripMargin)),

    Q("t_collocations",
      // body in [[collocationsTop]] (shared with the heavy probe)
      "Collocation mining: corpus-wide top-15 adjacent-token bigrams " +
        "by LIFT = P(ab)/(P(a)P(b)) with min support 5 — the " +
        "association statistic behind phrase detection (word2vec-" +
        "style phrase merging uses exactly this shape). Exactness: " +
        "lift = n_ab*N_uni*N_uni / (n_a*n_b*N_bi) emitted as a FIXED " +
        "float chain — each side's pair product exact in DECIMAL(18x" +
        "18), one double multiply, one division; no transcendental " +
        "(PMI = log(lift) would be libm-variant; lift ranks " +
        "identically). The decimal pair products hold while every " +
        "count stays below 10^18 — the r15 32x probe corpus " +
        "(192x tokens) OVERFLOWED the previous single-BIGINT " +
        "n_ab*N^2 product exactly as the old headroom note " +
        "predicted, so the lift now ships lifted. Ties broken by " +
        "the bigram text. " +
        "Plan: one explode for unigram counts, one windowed lead for " +
        "bigrams (both reuse the doc_id partitioning), counts join " +
        "on broadcast-sized vocab frames.",
      (s, d) => collocationsTop(s,
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        minSupport = 5L, k = 15),
      Some("""WITH toks AS (
             |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
             |  FROM (SELECT doc_id,
             |          string_split_regex(trim(text), '\s+') AS toks
             |        FROM documents) t,
             |    unnest(range(0, len(toks))) AS u(p)),
             |uni AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
             |nu AS (SELECT CAST(sum(n) AS BIGINT) AS n_uni FROM uni),
             |bi AS (
             |  SELECT tok, nxt, count(*) AS n_ab FROM (
             |    SELECT doc_id, tok,
             |      lead(tok) OVER (PARTITION BY doc_id ORDER BY p)
             |        AS nxt
             |    FROM toks) x
             |  WHERE nxt IS NOT NULL GROUP BY tok, nxt),
             |nb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM bi)
             |SELECT bi.tok || ' ' || bi.nxt AS bigram,
             |  CAST(n_ab AS BIGINT) AS n_ab,
             |  (CAST(CAST(n_ab AS DECIMAL(18,0))
             |      * CAST(nu.n_uni AS DECIMAL(18,0)) AS DOUBLE)
             |    * CAST(nu.n_uni AS DOUBLE))
             |  / (CAST(CAST(a.n AS DECIMAL(18,0))
             |      * CAST(b.n AS DECIMAL(18,0)) AS DOUBLE)
             |    * CAST(nb.n_bi AS DOUBLE)) AS lift
             |FROM bi JOIN uni a ON bi.tok = a.tok
             |  JOIN uni b ON bi.nxt = b.tok
             |  CROSS JOIN nu CROSS JOIN nb
             |WHERE n_ab >= 5
             |ORDER BY lift DESC, bigram LIMIT 15""".stripMargin)),
  )
}
