package graft.queries

import graft.functions.VectorKernels
import graft.text.TextOps

/** Generators for DuckDB oracle SQL that must agree BIT-FOR-BIT with the
  * engine's native vector kernels (`graft.functions.VectorKernels`) and
  * text heuristics (`graft.text.TextOps`).
  *
  * The trick that makes hash-exact verification possible: the kernels do
  * sequential left-associated double arithmetic over float inputs widened
  * to double, and SQL's `a + b + c` / explicit `CAST(x AS DOUBLE)` chains
  * evaluate identically (verified bit-for-bit against DuckDB), so the
  * oracle can reproduce cosine ranks, LSH buckets and IVF cells exactly —
  * the ±1 hyperplane signs and language marker lists are expanded from the
  * SAME Scala constants the engine executes, so they cannot drift.
  */
object OracleGen {

  /** Σ_i CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE), left-associated —
    * matches the kernels' sequential accumulation order exactly.
    */
  private def dotTerms(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"(CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE))")
      .mkString("+")

  /** Fused cosine (`VectorKernels.cosine`): d / (sqrt(na)*sqrt(nb)), 0.0 on
    * zero denominator; operand order preserved (first arg's norm under the
    * first sqrt).
    */
  def cosExpr(a: String, b: String, dim: Int): String = {
    val d = dotTerms(a, b, dim)
    val na = dotTerms(a, a, dim)
    val nb = dotTerms(b, b, dim)
    s"(CASE WHEN sqrt($na)*sqrt($nb) = 0 THEN 0.0 " +
      s"ELSE ($d)/(sqrt($na)*sqrt($nb)) END)"
  }

  /** Brute-force cosine top-k (`Knn.bruteForceTopK` / the SQL-surface
    * `vec_cosine` query): rank every (query, corpus) pair on the
    * bit-identical cosine expansion — DuckDB's `list_cosine_similarity`
    * builtin accumulates in its own order and near-equal cosines can rank
    * differently, so the oracle uses `cosExpr` like the LSH/IVF variants.
    */
  def knnBruteSql(dim: Int, k: Int, maxQueryId: Long): String = {
    val cos = cosExpr("q", "e", dim)
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |pairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    $cos AS cos
       |  FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM pairs) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Brute-force MIPS top-k (`Knn.mipsTopK`): rank on the bit-identical
    * dot-product expansion — same left-to-right term chain the codegen'd
    * `vec_dot` kernel accumulates, same reasoning as [[knnBruteSql]]'s
    * cosine (a builtin's own accumulation order could rank near-equal
    * scores differently).
    */
  def knnMipsSql(dim: Int, k: Int, maxQueryId: Long): String = {
    val d = dotTerms("q", "e", dim)
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |pairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ($d) AS dot
       |  FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY dot DESC, neighbor_id) AS rn
       |      FROM pairs) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** FILTERED IVF search over a SHARED index
    * (`Round14bQueries`' `e_knn_filtered_ivf`): centroids are taken
    * from the FULL corpus (`cent` has no predicate — the index is
    * built once, not per predicate), while cell assignment + scoring
    * run over the predicate-restricted subset only (assignment is a
    * pure map, so filtering before it equals filtering after). The
    * rest is the verbatim [[knnIvfSql]] pipeline.
    */
  def knnIvfFilteredSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                        maxQueryId: Long, corpusPred: String): String = {
    val cosCT = cosExpr("c", "t", dim)
    val cosQT = cosExpr("a", "t", dim)
    val cosQC = cosExpr("q", "c", dim)
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |cells AS (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT c.vec_id, c.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY $cosCT DESC, t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE $corpusPred) c
       |    CROSS JOIN cent t) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
       |    SELECT a.vec_id, a.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY $cosQT DESC, t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $maxQueryId) a
       |    CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $cosQC AS cos
       |  FROM qprobe q JOIN cells c USING (cell)
       |  WHERE c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Reciprocal-rank fusion of the brute cosine and brute MIPS
    * rankings (`Round14bQueries.hybridRrf`): both per-query top-`kEach`
    * lists replayed on their bit-identical expansions ([[knnBruteSql]]
    * / [[knnMipsSql]] reasoning), FULL OUTER joined per (query,
    * neighbor), fused as 1/(60+rank) with an absent rank contributing
    * exactly 0.0 — a FIXED two-term float chain (each term one
    * int→double cast, one add, one divide), so the fused score is
    * bit-identical cross-engine; re-ranked (score desc, neighbor asc),
    * top `kOut` kept.
    */
  def hybridRrfSql(dim: Int, kEach: Int, kOut: Int,
                   maxQueryId: Long): String = {
    val cos = cosExpr("q", "e", dim)
    val d = dotTerms("q", "e", dim)
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |cpairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    $cos AS s FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> q.query_id),
       |crank AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, neighbor_id) AS rnk
       |  FROM cpairs QUALIFY rnk <= $kEach),
       |dpairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ($d) AS s FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> q.query_id),
       |drank AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, neighbor_id) AS rnk
       |  FROM dpairs QUALIFY rnk <= $kEach),
       |fused AS (SELECT
       |    COALESCE(c.query_id, d.query_id) AS query_id,
       |    COALESCE(c.neighbor_id, d.neighbor_id) AS neighbor_id,
       |    (CASE WHEN c.rnk IS NULL THEN 0.0
       |       ELSE 1.0 / (60.0 + CAST(c.rnk AS DOUBLE)) END
       |     + CASE WHEN d.rnk IS NULL THEN 0.0
       |       ELSE 1.0 / (60.0 + CAST(d.rnk AS DOUBLE)) END)
       |      AS rrf_score
       |  FROM crank c FULL OUTER JOIN drank d
       |    ON c.query_id = d.query_id
       |    AND c.neighbor_id = d.neighbor_id)
       |SELECT query_id, CAST(rn AS BIGINT) AS rrf_rank, neighbor_id,
       |  rrf_score
       |FROM (SELECT query_id, neighbor_id, rrf_score,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY rrf_score DESC, neighbor_id) AS rn
       |      FROM fused) t
       |WHERE rn <= $kOut ORDER BY query_id, rrf_rank""".stripMargin
  }

  /** MIPS through the IVF serving path (`Knn.mipsIvfTopK`): the ENTIRE
    * norm-augmentation reduction replayed — M² = max corpus norm² (the
    * same left-to-right dot chain `vec_dot` accumulates, so the max is
    * bit-identical), corpus x' = [x, CAST(sqrt(M²−‖x‖²) AS FLOAT)],
    * query q' = [q, 0] — then the verbatim [[knnIvfSql]] pipeline
    * (md5-ordered centroids → argmax cells → nProbe routing → ranked
    * augmented-cosine) over the dim+1 vectors. Both engines construct
    * the augmented float from the identical double, so the routing and
    * ranks are hash-exact: the hierarchical serving path itself is
    * pinned, the way semDedup2LevelSql pins two-level routing.
    */
  def knnMipsIvfSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                    maxQueryId: Long): String = {
    val d = dim + 1
    val normE = dotTerms("e", "e", dim)
    val cosCT = cosExpr("c", "t", d)
    val cosQT = cosExpr("a", "t", d)
    val cosQC = cosExpr("q", "c", d)
    s"""WITH m2 AS (SELECT max($normE) AS m2 FROM embeddings e),
       |aug AS (
       |  SELECT e.vec_id, list_append(e.embedding,
       |    CAST(sqrt(m2.m2 - ($normE)) AS FLOAT)) AS embedding
       |  FROM embeddings e CROSS JOIN m2),
       |augq AS (
       |  SELECT e.vec_id, list_append(e.embedding,
       |    CAST(0.0 AS FLOAT)) AS embedding
       |  FROM embeddings e WHERE e.vec_id < $maxQueryId),
       |cent AS (
       |  SELECT vec_id AS cid, embedding FROM aug
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |cells AS (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT c.vec_id, c.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY $cosCT DESC, t.cid DESC) AS rn
       |    FROM aug c CROSS JOIN cent t) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
       |    SELECT a.vec_id, a.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY $cosQT DESC, t.cid DESC) AS rn
       |    FROM augq a CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $cosQC AS cos
       |  FROM qprobe q JOIN cells c USING (cell)
       |  WHERE c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Random-hyperplane LSH bucket (`VectorKernels.bucket`): bit p = sign of
    * Σ_i x_i·s(i,p) with s(i,p) = ±1 from splitmix64 parity. The signs are
    * computed HERE from the same `mix` the codegen'd kernel calls, and
    * expanded as +/- term chains (IEEE a-b ≡ a+(-b), so the fold matches
    * the kernel's `acc += x*s` exactly).
    */
  def bucketExpr(t: String, dim: Int, nPlanes: Int): String =
    (0 until nPlanes).map { p =>
      val acc = (0 until dim).map { i =>
        val neg = (VectorKernels.mix((i.toLong << 16) | p.toLong) & 1L) != 0L
        val sign = if (neg) "-" else "+"
        s"$sign CAST($t.embedding[${i + 1}] AS DOUBLE)"
      }.mkString("0.0 ", " ", "")
      s"(CASE WHEN ($acc) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Language-ID argmax (`TextOps.langId`): per-language score = number of
    * DISTINCT marker words present; winner = lexicographic max of
    * (score, lang) — `list_max` over structs reproduces Spark's
    * `greatest(struct(score, lang))` fieldwise comparison.
    */
  def langIdSql: String = {
    val structs = TextOps.langMarkers.toSeq.sortBy(_._1).map {
      case (lang, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"struct_pack(s := len(list_intersect(toks, $lst)), l := '$lang')"
    }.mkString(",\n      ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    string_split_regex(lower(text), '\\s+') AS toks
       |  FROM documents),
       |best AS (
       |  SELECT doc_id, lang, list_max([
       |      $structs]) AS b
       |  FROM t)
       |SELECT doc_id, lang,
       |  CASE WHEN b.s > 0 THEN b.l ELSE 'und' END AS pred_lang
       |FROM best ORDER BY doc_id""".stripMargin
  }

  /** SimHash over the 60-bit md5-prefix token hash
    * (`Dedup.simhashSignatures(tokenHash = "md5")`): bit i of the signature
    * = majority of token-hash bit i (ties → 1); docs with no tokens get all
    * 60 bits set (the kernel's `0*2 >= 0` degenerate case).
    */
  def simhashMd5Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents WHERE length(trim(text)) > 0),
       |th AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id, b.bit,
       |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
       |    COUNT(*) AS n
       |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS bit) b
       |  GROUP BY doc_id, b.bit),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN ones * 2 >= n
       |      THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(s.simhash, ${(1L << 60) - 1}) AS simhash
       |FROM documents d LEFT JOIN sig s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** SimHash → Hamming candidate pairs (`Dedup.simhashSignatures` md5
    * variant + bit_count(xor) pairing within source groups): the
    * candidate-generation stage the signature query feeds. Signatures are
    * recomputed in SQL from the same md5-prefix hash, so pairs agree
    * bit-for-bit.
    */
  def simhashHammingSql(maxDocId: Long, maxHamming: Int): String =
    s"""WITH docs_f AS (
       |  SELECT doc_id, source, text FROM documents
       |  WHERE doc_id < $maxDocId),
       |toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM docs_f WHERE length(trim(text)) > 0),
       |th AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id, b.bit,
       |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
       |    COUNT(*) AS n
       |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS bit) b
       |  GROUP BY doc_id, b.bit),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN ones * 2 >= n
       |      THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id),
       |sigs AS (
       |  SELECT d.doc_id, d.source,
       |    coalesce(s.simhash, ${(1L << 60) - 1}) AS simhash
       |  FROM docs_f d LEFT JOIN sig s USING (doc_id))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b
       |  ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY a_id, b_id""".stripMargin

  /** Z-order interleave (`graft.functions.ZOrder.interleave`): the same
    * unrolled shift/mask OR-chain over SQL integer operators — bit i of x
    * lands at position 2i, bit i of y at 2i+1.
    */
  def zorderExpr(x: String, y: String, bitsPerDim: Int): String =
    (0 until bitsPerDim).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Shared CTE body reproducing `Dedup.minhashBucketsPortable` bit-for-bit:
    * 60-bit md5-prefix shingle hashes, k minima over (h1 + i·h2) mod 2^60
    * (HUGEINT arithmetic — no 64-bit wraparound on either side), band key =
    * md5 prefix of the band's signature slice joined with ','. Docs with no
    * tokens signature to the sentinel 2^60 (> every real hash).
    */
  def minhashBucketsCte(shingleN: Int, bands: Int, rowsPerBand: Int,
                        where: String = "",
                        source: String = "documents"): String = {
    val k = bands * rowsPerBand
    val m60 = 1L << 60
    val sentinel = Seq.fill(k)(m60.toString).mkString("[", ", ", "]")
    // optional corpus restriction (leakproof-split caps the recursive-CTE
    // oracle); composed as AND so the empty-text guard always applies
    val andWhere = if (where.isEmpty) "" else s" AND ($where)"
    val sigWhere = if (where.isEmpty) "" else s" WHERE $where"
    s"""mh_toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM $source WHERE length(trim(text)) > 0$andWhere),
       |mh_sh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(toks) <= $shingleN
       |        THEN [array_to_string(toks, ' ')]
       |        ELSE list_transform(range(1, len(toks) - $shingleN + 2),
       |          i -> array_to_string(toks[i:i+${shingleN - 1}], ' ')) END)
       |      AS sh
       |    FROM mh_toks)),
       |mh_h AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS h1,
       |    CAST(concat('0x', substr(md5(concat('x', sh)), 1, 15))
       |      AS BIGINT) | 1 AS h2
       |  FROM mh_sh),
       |mh_min AS (
       |  SELECT doc_id, i.i AS i,
       |    min(CAST((CAST(h1 AS HUGEINT) + i.i * CAST(h2 AS HUGEINT))
       |      % $m60 AS BIGINT)) AS mh
       |  FROM mh_h CROSS JOIN (SELECT unnest(range($k)) AS i) i
       |  GROUP BY doc_id, i.i),
       |mh_sig AS (
       |  SELECT d.doc_id, coalesce(m.sig, $sentinel) AS sig
       |  FROM $source d LEFT JOIN
       |    (SELECT doc_id, list(mh ORDER BY i) AS sig
       |     FROM mh_min GROUP BY doc_id) m USING (doc_id)$sigWhere),
       |mh_buckets AS MATERIALIZED (
       |  SELECT doc_id, b.b AS band,
       |    CAST(concat('0x', substr(md5(array_to_string(
       |      sig[b.b*$rowsPerBand+1 : b.b*$rowsPerBand+$rowsPerBand], ',')),
       |      1, 15)) AS BIGINT) AS band_hash
       |  FROM mh_sig CROSS JOIN (SELECT unnest(range($bands)) AS b) b),
       |mh_cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM mh_buckets a JOIN mh_buckets b
       |    ON a.band = b.band AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Per-doc LSH candidate degree (`d_minhash_lsh` over the portable
    * buckets).
    */
  def minhashLshSql(shingleN: Int, bands: Int, rowsPerBand: Int): String =
    s"""WITH ${minhashBucketsCte(shingleN, bands, rowsPerBand)},
       |deg AS (
       |  SELECT id, count(*) AS c FROM (
       |    SELECT a_id AS id FROM mh_cand
       |    UNION ALL SELECT b_id AS id FROM mh_cand)
       |  GROUP BY id)
       |SELECT d.doc_id, CAST(coalesce(deg.c, 0) AS BIGINT) AS n_candidates
       |FROM documents d LEFT JOIN deg ON d.doc_id = deg.id
       |ORDER BY d.doc_id""".stripMargin

  /** Hot-bucket cap replay (`d_lsh_bucket_cap`): the corpus is documents
    * plus `nSpam` planted identical-text docs (one degenerate bucket in
    * EVERY band); the cap is derived exactly as
    * `Dedup.bucketCap` — GREATEST(64, 8·bitlen(n+1)) via `length(bin())`,
    * integer-exact on both engines — and buckets over it STAR-reduce to
    * their min-id hub while buckets under it emit the full clique. The
    * final per-doc candidate degree plus the derived cap itself ride the
    * hash gate, so both the derivation and the reduction are pinned.
    */
  /** The documents ∪ planted-spam corpus (`spam`, `src`) and the
    * corpus-derived cap (`capv`) as shared CTEs — `d_lsh_bucket_cap`
    * and `d_lsh_bucket_stats` MUST replay the identical fixture and
    * cap arithmetic (mirrors `Round12Queries.spamDocs`), so both
    * oracles build from this one definition.
    */
  private def spamSrcCtes(nSpam: Int, spamText: String): String =
    s"""spam AS (
       |  SELECT CAST(10000000 + r.range AS BIGINT) AS doc_id,
       |    '$spamText' AS text
       |  FROM range($nSpam) r),
       |src AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM spam)""".stripMargin

  private val capvCte: String =
    """capv AS MATERIALIZED (
      |  SELECT GREATEST(64, 8 * length(bin(count(*) + 1))) AS cap
      |  FROM src)""".stripMargin

  def lshBucketCapSql(shingleN: Int, bands: Int, rowsPerBand: Int,
                      nSpam: Int, spamText: String): String =
    s"""WITH ${spamSrcCtes(nSpam, spamText)},
       |${minhashBucketsCte(shingleN, bands, rowsPerBand, source = "src")},
       |$capvCte,
       |bs AS MATERIALIZED (
       |  SELECT band, band_hash, count(*) AS bn, min(doc_id) AS hub
       |  FROM mh_buckets GROUP BY 1, 2),
       |bt AS MATERIALIZED (
       |  SELECT mb.doc_id, mb.band, mb.band_hash, bs.bn, bs.hub
       |  FROM mh_buckets mb JOIN bs USING (band, band_hash)),
       |small_p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bt a JOIN bt b
       |    ON a.band = b.band AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |  WHERE a.bn <= (SELECT cap FROM capv)),
       |star_p AS (
       |  SELECT hub AS a_id, doc_id AS b_id FROM bt
       |  WHERE bn > (SELECT cap FROM capv) AND doc_id <> hub),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a_id, b_id FROM
       |    (SELECT * FROM small_p UNION ALL SELECT * FROM star_p)),
       |deg AS MATERIALIZED (
       |  SELECT id, count(*) AS c FROM (
       |    SELECT a_id AS id FROM cand UNION ALL SELECT b_id FROM cand)
       |  GROUP BY id)
       |SELECT s.doc_id,
       |  CAST(coalesce(deg.c, 0) AS BIGINT) AS n_candidates,
       |  CAST((SELECT cap FROM capv) AS BIGINT) AS cap
       |FROM (SELECT doc_id FROM src) s
       |LEFT JOIN deg ON s.doc_id = deg.id
       |ORDER BY s.doc_id""".stripMargin

  /** Corpus-adaptive simhash band candidates (`d_simhash_adaptive`):
    * the composite band-mask layout (all (m−t)-subsets of m signature
    * blocks, `Dedup.phashBandMasks`) derived for the FIXED corpus slice
    * (doc_id < maxDocId — dense ids, so n = maxDocId at every SF) and
    * embedded as literal masks: a pair is a candidate iff the two
    * signatures agree on EVERY bit of some mask. Signatures are the
    * oracle-exact 60-bit md5 simhash; the mask list is the same
    * derivation the Spark side performs from its runtime corpus count,
    * so band semantics AND the layout derivation ride the hash gate.
    */
  def simhashAdaptiveSql(maxDocId: Long, maxHamming: Int): String = {
    val masks = graft.dedup.Dedup.phashBandMasks(maxDocId, maxHamming,
      hashBits = 60)
    val collide = masks
      .map(m => s"(a.simhash & $m) = (b.simhash & $m)")
      .mkString("(", "\n       OR ", ")")
    s"""WITH docs_f AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $maxDocId),
       |toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM docs_f WHERE length(trim(text)) > 0),
       |th AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id, b.bit,
       |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
       |    COUNT(*) AS n
       |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS bit) b
       |  GROUP BY doc_id, b.bit),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN ones * 2 >= n
       |      THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id),
       |sigs AS (
       |  SELECT d.doc_id, coalesce(s.simhash, ${(1L << 60) - 1}) AS simhash
       |  FROM docs_f d LEFT JOIN sig s USING (doc_id))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE $collide
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** LSH bucket-health rollup (`d_lsh_bucket_stats`): per band, bucket
    * count / max bucket / buckets over the corpus-derived cap / the cap
    * — same spam fixture and cap arithmetic as [[lshBucketCapSql]].
    */
  def lshBucketStatsSql(shingleN: Int, bands: Int, rowsPerBand: Int,
                        nSpam: Int, spamText: String): String =
    s"""WITH ${spamSrcCtes(nSpam, spamText)},
       |${minhashBucketsCte(shingleN, bands, rowsPerBand, source = "src")},
       |$capvCte,
       |bs AS MATERIALIZED (
       |  SELECT band, band_hash, count(*) AS bn
       |  FROM mh_buckets GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(bn) AS BIGINT) AS max_bucket,
       |  CAST(sum(CASE WHEN bn > (SELECT cap FROM capv)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
       |  CAST((SELECT cap FROM capv) AS BIGINT) AS cap
       |FROM bs GROUP BY band ORDER BY band""".stripMargin

  /** Leakage-safe split (`curate_leakproof_split`): near-dup clusters =
    * connected components over portable minhash band collisions (corpus
    * capped so the recursive-CTE replay stays tractable), then the
    * WHOLE CLUSTER assigned to train/val/test by the cluster id's
    * multiplicative hash — the same integer arithmetic as
    * `curate_split_assign`, keyed by cluster instead of doc. (That
    * arithmetic is a fixed permutation of `cluster_id mod 100`, not a
    * mixing hash — kept as the PERMANENT split contract; decision note
    * at `Round6Queries.curate_split_assign`.)
    */
  def leakproofSplitSql(shingleN: Int, bands: Int, rowsPerBand: Int,
                        maxDocId: Long): String =
    s"""WITH RECURSIVE ${
         minhashBucketsCte(shingleN, bands, rowsPerBand,
           s"doc_id < $maxDocId")},
       |ee AS (SELECT a_id AS a, b_id AS b FROM mh_cand
       |  UNION SELECT b_id, a_id FROM mh_cand),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS lab FROM documents
       |  WHERE doc_id < $maxDocId
       |  UNION
       |  SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.id),
       |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id
       |  FROM reach GROUP BY id),
       |hh AS (SELECT doc_id, cluster_id,
       |  ((cluster_id % 1000003) * 2654435761) % 100 AS h FROM cl)
       |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
       |    ELSE 'test' END AS split
       |FROM hh ORDER BY doc_id""".stripMargin

  /** Incremental dedup (`d_incremental_dedup`): new-batch docs
    * (doc_id % 10 = 0) probed against the index side's band buckets;
    * per new doc, the count of distinct index docs sharing any bucket.
    */
  def incrementalDedupSql(shingleN: Int, bands: Int,
                          rowsPerBand: Int): String =
    s"""WITH ${minhashBucketsCte(shingleN, bands, rowsPerBand)},
       |nw AS (SELECT * FROM mh_buckets WHERE doc_id % 10 = 0),
       |ix AS (SELECT * FROM mh_buckets WHERE doc_id % 10 <> 0),
       |m AS (
       |  SELECT DISTINCT n.doc_id AS doc_id, i.doc_id AS idx_id
       |  FROM nw n JOIN ix i
       |    ON n.band = i.band AND n.band_hash = i.band_hash),
       |deg AS (SELECT doc_id, count(*) AS c FROM m GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(deg.c, 0) AS BIGINT) AS n_index_matches
       |FROM (SELECT DISTINCT doc_id FROM documents
       |      WHERE doc_id % 10 = 0) d
       |LEFT JOIN deg USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Streaming incremental dedup (`stream_incremental_dedup`): same
    * probe as [[incrementalDedupSql]] but counting band COLLISIONS
    * (no DISTINCT — the streaming side avoids a second stateful op).
    */
  def streamIncrementalDedupSql(shingleN: Int, bands: Int,
                                rowsPerBand: Int): String =
    s"""WITH ${minhashBucketsCte(shingleN, bands, rowsPerBand)},
       |nw AS (SELECT * FROM mh_buckets WHERE doc_id % 10 = 0),
       |ix AS (SELECT * FROM mh_buckets WHERE doc_id % 10 <> 0),
       |deg AS (
       |  SELECT n.doc_id, count(*) AS c
       |  FROM nw n JOIN ix i
       |    ON n.band = i.band AND n.band_hash = i.band_hash
       |  GROUP BY n.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(deg.c, 0) AS BIGINT) AS n_band_collisions
       |FROM (SELECT DISTINCT doc_id FROM documents
       |      WHERE doc_id % 10 = 0) d
       |LEFT JOIN deg USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Verified MinHash duplicates (`d_minhash_verify`): portable candidates
    * re-checked with exact n-gram Jaccard ≥ threshold, round 4 (division of
    * identical small-int sizes — bit-exact cross-engine). `source` +
    * `prefixCtes` let derived-corpus queries (`d_minhash_nfc`) reuse the
    * whole verify replay over a CTE-built corpus.
    */
  def minhashVerifySql(shingleN: Int, bands: Int, rowsPerBand: Int,
                       threshold: Double, source: String = "documents",
                       prefixCtes: String = ""): String =
    s"""WITH $prefixCtes${
         minhashBucketsCte(shingleN, bands, rowsPerBand, source = source)},
       |shs AS (
       |  SELECT d.doc_id, coalesce(s.sh, []) AS sh
       |  FROM $source d LEFT JOIN
       |    (SELECT doc_id, list(sh) AS sh FROM mh_sh GROUP BY doc_id) s
       |    USING (doc_id)),
       |j AS (
       |  SELECT c.a_id, c.b_id,
       |    round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
       |      THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
       |      END, 4) AS jaccard
       |  FROM mh_cand c JOIN shs a ON c.a_id = a.doc_id
       |    JOIN shs b ON c.b_id = b.doc_id)
       |SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= $threshold
       |ORDER BY a_id, b_id""".stripMargin

  /** NFC-normalized MinHash near-dup (`d_minhash_nfc`): every doc under
    * `maxDocId` expands into TWO variants spelling every 'e' as the
    * PRECOMPOSED é (chr(233)) vs e + COMBINING ACUTE (chr(769)), plus a
    * distinct tag token so the twins are near- (not exact-) duplicates;
    * the corpus is then NFC-normalized BEFORE hashing (DuckDB's
    * independent `nfc_normalize` vs Spark's codegen'd
    * `unicode_normalize`) and the full portable-minhash verify pipeline
    * replays over it. Without the normalization the twins share ZERO
    * shingles (every token differs at the byte level), so the entire
    * twin pair set in the output exists only because normalize-before-
    * hash is composed in — the near-dup analogue of `d_exact_nfc`.
    */
  def minhashNfcSql(shingleN: Int, bands: Int, rowsPerBand: Int,
                    threshold: Double, maxDocId: Long): String = {
    val variants =
      s"""nfc_v AS (
         |  SELECT doc_id * 2 AS doc_id,
         |    replace(text, 'e', chr(233)) || ' veven' AS text
         |  FROM documents WHERE doc_id < $maxDocId
         |  UNION ALL
         |  SELECT doc_id * 2 + 1,
         |    replace(text, 'e', 'e' || chr(769)) || ' vodd'
         |  FROM documents WHERE doc_id < $maxDocId),
         |nfc_src AS (
         |  SELECT doc_id, nfc_normalize(text) AS text FROM nfc_v),
         |""".stripMargin
    minhashVerifySql(shingleN, bands, rowsPerBand, threshold,
      source = "nfc_src", prefixCtes = variants)
  }

  /** Embedding near-dup degree (`Dedup.embeddingNearDup` with nPlanes
    * hyperplane buckets): in-bucket pairs with round(cosine, 6) ≥
    * threshold, counted per vector.
    */
  def embeddingNearDupSql(dim: Int, nPlanes: Int, threshold: Double): String = {
    val bucket = bucketExpr("t", dim, nPlanes)
    val cos = cosExpr("a", "b", dim)
    s"""WITH e AS (
       |  SELECT t.vec_id, t.embedding, $bucket AS bucket
       |  FROM embeddings t),
       |near AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM e a JOIN e b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE round($cos, 6) >= $threshold),
       |deg AS (
       |  SELECT id AS vec_id, count(*) AS c FROM (
       |    SELECT a_id AS id FROM near
       |    UNION ALL SELECT b_id AS id FROM near)
       |  GROUP BY id)
       |SELECT e.vec_id, CAST(coalesce(deg.c, 0) AS BIGINT) AS n_neardups
       |FROM e LEFT JOIN deg USING (vec_id)
       |ORDER BY e.vec_id""".stripMargin
  }

  /** LSH ANN top-k (`Knn.lshTopK`, multiProbe = 1): query probes its own
    * bucket plus every bucket one sign-flip away; rank on the UNROUNDED
    * cosine (bit-identical across engines), ties by neighbor id.
    */
  def knnLshSql(dim: Int, nPlanes: Int, k: Int, maxQueryId: Long): String = {
    val bucket = bucketExpr("t", dim, nPlanes)
    val cos = cosExpr("p", "c", dim)
    val masks = (Seq(0L) ++ (0 until nPlanes).map(p => 1L << p))
      .map(m => s"($m)").mkString(", ")
    s"""WITH e AS (
       |  SELECT t.vec_id, t.embedding, $bucket AS bucket
       |  FROM embeddings t),
       |q AS (SELECT vec_id AS query_id, embedding, bucket
       |      FROM e WHERE vec_id < $maxQueryId),
       |probes AS (
       |  SELECT query_id, embedding,
       |    xor(bucket, m.m::BIGINT) AS bucket
       |  FROM q CROSS JOIN (VALUES $masks) m(m)),
       |scored AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id,
       |    $cos AS cos
       |  FROM probes p JOIN e c USING (bucket)
       |  WHERE c.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** IVF ANN top-k (`Knn.ivfTopK`): centroids = smallest nCells by
    * md5(id-as-string); corpus assigned to argmax-cosine cell (ties → max
    * centroid id, matching Spark's greatest-over-structs); queries probe
    * their nProbe best cells.
    */
  def knnIvfSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                maxQueryId: Long): String = {
    val cosCT = cosExpr("c", "t", dim) // corpus × centroid (corpus first)
    val cosQT = cosExpr("a", "t", dim) // query  × centroid (query first)
    val cosQC = cosExpr("q", "c", dim) // query  × corpus   (query first)
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |cells AS (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT c.vec_id, c.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY $cosCT DESC, t.cid DESC) AS rn
       |    FROM embeddings c CROSS JOIN cent t) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
       |    SELECT a.vec_id, a.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY $cosQT DESC, t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $maxQueryId) a
       |    CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $cosQC AS cos
       |  FROM qprobe q JOIN cells c USING (cell)
       |  WHERE c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** ANN recall evaluation (`e_ann_recall_eval`): the [[knnBruteSql]]
    * exact ranks LEFT-joined against the [[knnIvfSql]] approximate
    * ranks per query — recall@k = hits/k, counted in BIGINT with ONE
    * double division at the end. Both pipelines are the verbatim CTE
    * chains of their standalone oracles (renamed to coexist in one
    * WITH), so this query pins the evaluation harness itself: an
    * engine serving ANN must be able to measure its own recall
    * in-plan, and both engines must agree on every per-query hit
    * count exactly.
    */
  def annRecallSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                   maxQueryId: Long): String = {
    val cosB = cosExpr("q", "e", dim)
    val cosCT = cosExpr("c", "t", dim)
    val cosQT = cosExpr("a", "t", dim)
    val cosQC = cosExpr("q", "c", dim)
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |           WHERE vec_id < $maxQueryId),
       |bpairs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
       |    $cosB AS cos
       |  FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> q.query_id),
       |brute AS (
       |  SELECT query_id, neighbor_id
       |  FROM (SELECT query_id, neighbor_id,
       |          ROW_NUMBER() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, neighbor_id) AS rn
       |        FROM bpairs) t
       |  WHERE rn <= $k),
       |cent AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |cells AS (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT c.vec_id, c.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY $cosCT DESC, t.cid DESC) AS rn
       |    FROM embeddings c CROSS JOIN cent t) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
       |    SELECT a.vec_id, a.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY $cosQT DESC, t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $maxQueryId) a
       |    CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    $cosQC AS cos
       |  FROM qprobe q JOIN cells c USING (cell)
       |  WHERE c.vec_id <> q.query_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id
       |  FROM (SELECT query_id, neighbor_id,
       |          ROW_NUMBER() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, neighbor_id) AS rn
       |        FROM scored) t
       |  WHERE rn <= $k)
       |SELECT b.query_id,
       |  CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(count(i.neighbor_id) AS DOUBLE) / $k.0 AS recall_at_k
       |FROM brute b LEFT JOIN ivf i
       |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
  }

  /** IVF replay seeded by the 2-pass Lloyd k-means centroids (the
    * kmeansLloydSql recipe at `nCells` clusters): md5-ordered seed set →
    * argmax-cosine assignment → per-(cluster, dim) 6-dp-rounded float
    * mean → those centroids become the IVF cells for the same
    * cells/qprobe/scored replay as [[knnIvfSql]]. Every stage is
    * deterministic, so the composition is hash-exact cross-engine.
    */
  /** Fused cosine over direct array expressions (no `.embedding` suffix —
    * unlike [[cosExpr]] the operands are complete array-typed SQL
    * expressions). Same bit-exact expansion of `VectorKernels.cosine`.
    */
  private def cosArr(a: String, b: String, dim: Int): String = {
    def dotT(x: String, y: String) = (1 to dim)
      .map(i => s"(CAST($x[$i] AS DOUBLE)*CAST($y[$i] AS DOUBLE))")
      .mkString("+")
    val d = dotT(a, b); val na = dotT(a, a); val nb = dotT(b, b)
    s"(CASE WHEN sqrt($na)*sqrt($nb) = 0 THEN 0.0 " +
      s"ELSE ($d)/(sqrt($na)*sqrt($nb)) END)"
  }

  /** The deterministic 2-pass Lloyd k-means replay shared by the
    * kmeans-seeded IVF oracle and the semantic-dedup oracle
    * (`Knn.kmeansCentroids` → argmax-cosine cell assignment): md5-ordered
    * seed set → assignment of the BOUNDED training sample (`ktrain`, the
    * md5-ordered first `Knn.TrainSampleN` vectors — the engine trains on
    * the same sample so index-build cost is corpus-size-independent) →
    * 6-dp-rounded per-(cluster, dim) float mean → full-corpus cell
    * assignment. Emits the CTE chain `ktrain, cent0, a1, upd, cent,
    * cells`.
    */
  private def kmeansCellsCtes(dim: Int, nCells: Int): String =
    kmeansCellsCtes(dim, nCells.toString)

  /** `nCellsLimit` is a SQL LIMIT operand — an integer literal, or a
    * scalar subquery for the occupancy-derived auto variant
    * ([[semDedupAutoSql]]). `trainWhere` optionally restricts the
    * TRAINING population (seeds + mean pass) to a subset — the
    * index-maintenance shape, where centroids were trained on the
    * original corpus batch and a later batch is assigned to the frozen
    * cells ([[knnIvfKmeansTrainedOnSql]]); the `cells` assignment
    * always covers the full corpus.
    */
  /** ONE Lloyd level (`<pfx>cent0` → `<pfx>a1` → `<pfx>upd` →
    * `<pfx>cent(<idName>, cvec)`) over the shared `ktrain` sample — the
    * single source of truth for the deterministic 2-pass recipe
    * (md5-ordered seeds, cos-DESC/cl-DESC assignment tie-break,
    * 6-dp-rounded float means). Used unprefixed by [[kmeansCellsCtes]]
    * (IVF + flat-SemDeDup replays) and at two prefixes by
    * [[semDedup2LevelSql]], so a recipe change propagates to every
    * oracle at once.
    */
  private def lloydLevelCtes(dim: Int, limit: String, pfx: String,
                             idName: String): String = {
    def cos(a: String, b: String) = cosArr(a, b, dim)
    s"""${pfx}cent0 AS MATERIALIZED (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cl,
       |    embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM ktrain
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |        LIMIT $limit)),
       |${pfx}a1 AS MATERIALIZED (
       |  SELECT vec_id, embedding, cl FROM (
       |    SELECT e.vec_id, e.embedding, c.cl,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.embedding", "c.cvec")} DESC,
       |          c.cl DESC) AS rn
       |    FROM ktrain e CROSS JOIN ${pfx}cent0 c) WHERE rn = 1),
       |${pfx}upd AS MATERIALIZED (
       |  SELECT cl, i.i AS dim,
       |    CAST(round(avg(CAST(embedding[i.i + 1] AS DOUBLE)), 6)
       |      AS FLOAT) AS v
       |  FROM ${pfx}a1 CROSS JOIN (SELECT unnest(range($dim)) AS i) i
       |  GROUP BY cl, i.i),
       |${pfx}cent AS MATERIALIZED (
       |  SELECT cl AS $idName, list(v ORDER BY dim) AS cvec
       |  FROM ${pfx}upd GROUP BY cl)""".stripMargin
  }

  private def ktrainCte(trainWhere: String = ""): String =
    s"""ktrain AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings $trainWhere
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT ${graft.similarity.Knn.TrainSampleN})""".stripMargin

  private def kmeansCellsCtes(dim: Int, nCellsLimit: String,
                              trainWhere: String = ""): String = {
    def cos(a: String, b: String) = cosArr(a, b, dim)
    s"""${ktrainCte(trainWhere)},
       |${lloydLevelCtes(dim, nCellsLimit, "", "cid")},
       |cells AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT c.vec_id, c.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cos("c.embedding", "t.cvec")} DESC,
       |          t.cid DESC) AS rn
       |    FROM embeddings c CROSS JOIN cent t) x
       |  WHERE rn = 1)""".stripMargin
  }

  def knnIvfKmeansSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                      maxQueryId: Long): String =
    knnIvfKmeansTrainedOnSql(dim, nCells, nProbe, k, maxQueryId, "")

  /** [[knnIvfKmeansSql]] with the k-means TRAINING population restricted
    * by `trainWhere` (e.g. "WHERE vec_id % 10 <> 0") — the incremental
    * index-maintenance replay: centroids frozen on the original batch,
    * every vector (original + appended) assigned to those cells, probes
    * over the union.
    */
  def knnIvfKmeansTrainedOnSql(dim: Int, nCells: Int, nProbe: Int, k: Int,
                               maxQueryId: Long,
                               trainWhere: String): String = {
    def cos(a: String, b: String) = cosArr(a, b, dim)
    s"""WITH ${kmeansCellsCtes(dim, nCells.toString, trainWhere)},
       |qprobe AS (
       |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
       |    SELECT a.vec_id, a.embedding, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cos("a.embedding", "t.cvec")} DESC,
       |          t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $maxQueryId) a
       |    CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cos("q.embedding", "c.embedding")} AS cos
       |  FROM qprobe q JOIN cells c USING (cell)
       |  WHERE c.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** SemDeDup replay (`Dedup.semDedup`): the shared k-means cells CTE
    * chain, then within-cell pairwise cosine at 6 dp — a vector is
    * removed when ANY lower-id cell-mate scores ≥ threshold.
    */
  def semDedupSql(dim: Int, nClusters: Int, threshold: String): String =
    semDedupSqlWithLimit(dim, nClusters.toString, threshold)

  /** SemDeDup replay with the cluster count derived from the corpus size
    * (`Dedup.semDedupAuto`): the LIMIT operand is the same
    * clamp(ceil(count/occupancy), 2, 65536) the engine computes, as a
    * scalar subquery — both sides derive the knob from the data, so the
    * auto-scaled operator replays exactly at any corpus size.
    */
  def semDedupAutoSql(dim: Int, occupancy: Long, threshold: String): String =
    // integer ceiling division, mirroring autoSemDedupClusters exactly —
    // double ceil(count/occ.0) can round differently at large counts
    semDedupSqlWithLimit(dim,
      s"""(SELECT greatest(2, least(65536,
         |    (count(*) + ${occupancy - 1}) // $occupancy))
         |  FROM embeddings)""".stripMargin, threshold)

  /** Two-level SemDeDup replay (`Dedup.semDedupHierarchical`): BOTH
    * centroid sets from the shared deterministic Lloyd recipe (sub
    * level at the occupancy-derived k, super level at
    * clamp(⌈√k⌉, 2, 256) — IEEE sqrt + ceil, bit-identical across
    * engines), then the hierarchical routing replayed exactly: every
    * sub-centroid argmaxes over the supers (cos DESC, sid DESC — the
    * fused kernel's tie-break), every vector argmaxes over the supers
    * that won ≥ 1 sub, then over only its super's subs; within-cell
    * pruning identical to [[semDedupSql]].
    */
  def semDedup2LevelSql(dim: Int, occupancy: Long,
                        threshold: String): String = {
    def cos(a: String, b: String) = cosArr(a, b, dim)
    val kExpr = s"greatest(2, least(65536, " +
      s"(count(*) + ${occupancy - 1}) // $occupancy))"
    val kLimit = s"(SELECT $kExpr FROM embeddings)"
    val sLimit = s"(SELECT greatest(2, least(256, " +
      s"CAST(ceil(sqrt($kExpr)) AS BIGINT))) FROM embeddings)"
    s"""WITH ${ktrainCte()},
       |${lloydLevelCtes(dim, kLimit, "", "cid")},
       |${lloydLevelCtes(dim, sLimit, "s", "sid")},
       |submap AS MATERIALIZED (
       |  SELECT cid, cvec, sid FROM (
       |    SELECT c.cid, c.cvec, s.sid,
       |      row_number() OVER (PARTITION BY c.cid
       |        ORDER BY ${cos("c.cvec", "s.cvec")} DESC, s.sid DESC)
       |        AS rn
       |    FROM cent c CROSS JOIN scent s) WHERE rn = 1),
       |effsup AS (
       |  SELECT sid, cvec AS svec FROM scent
       |  WHERE sid IN (SELECT DISTINCT sid FROM submap)),
       |vsup AS MATERIALIZED (
       |  SELECT vec_id, embedding, sid FROM (
       |    SELECT e.vec_id, e.embedding, s.sid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.embedding", "s.svec")} DESC,
       |          s.sid DESC) AS rn
       |    FROM embeddings e CROSS JOIN effsup s) WHERE rn = 1),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid AS cell FROM (
       |    SELECT v.vec_id, v.embedding, m.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cos("v.embedding", "m.cvec")} DESC,
       |          m.cid DESC) AS rn
       |    FROM vsup v JOIN submap m USING (sid)) WHERE rn = 1),
       |rm AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(${cos("a.embedding", "b.embedding")}, 6)
       |    >= $threshold)
       |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       |  (r.vec_id IS NULL) AS kept
       |FROM cells c LEFT JOIN rm r ON c.vec_id = r.vec_id
       |ORDER BY c.vec_id""".stripMargin
  }

  private def semDedupSqlWithLimit(dim: Int, nClustersLimit: String,
                                   threshold: String): String =
    s"""WITH ${kmeansCellsCtes(dim, nClustersLimit)},
       |rm AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(${cosArr("a.embedding", "b.embedding", dim)}, 6)
       |    >= $threshold)
       |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       |  (r.vec_id IS NULL) AS kept
       |FROM cells c LEFT JOIN rm r ON c.vec_id = r.vec_id
       |ORDER BY c.vec_id""".stripMargin

  /** Product-quantization ADC replay (`Knn.pqTopK` at its default one
    * Lloyd refinement pass): md5-ordered sample codebooks → per-subspace
    * argmin-L2 assignment (expanded as argmax of `2·dot − ‖cb‖²`, ties →
    * larger code, matching `greatest` struct ordering) → 6-dp-rounded
    * member-mean codeword update (empty codewords keep the init slice) →
    * re-encode against the refined codebooks → asymmetric-distance
    * scoring as the left-associated sum of per-subspace query·codeword
    * dots. Every double op replays the codegen'd kernels' sequential
    * order, and the mean rounding kills summation-order ulps, so the
    * approximate ranking is hash-exact cross-engine.
    */
  /** `q0.d + q1.d + …` — the left-associated ADC sum (`VectorKernels
    * .pqAdc` accumulation order). */
  private def pqApprox(m: Int): String =
    (0 until m).map(mi => s"q$mi.d").mkString(" + ")

  /** The per-subspace query-table joins of the ADC scoring stage; `c`
    * must expose code columns `c_0..c_{m-1}`, `q0` anchors query_id. */
  private def pqQJoins(m: Int): String = (1 until m).map(mi =>
    s"JOIN qt_$mi q$mi ON q$mi.code = c.c_$mi " +
      s"AND q$mi.query_id = q0.query_id").mkString("\n  ")

  /** The shared PQ replay chain (`Knn.pqCodebooks` at one Lloyd pass +
    * `Knn.pqTopK`'s encode/table stages) as a WITH-body fragment:
    * `ptrain` bounded md5-ordered training sample (`Knn.TrainSampleN` —
    * the engine trains codebooks on the same sample, so build cost is
    * corpus-size-independent) → `cb0` md5-sample codebooks → `p0/r0/c0`
    * init assignment of the sample → `upd/cbr/cbf_mi` 6-dp-mean
    * refinement (empty codewords keep the init slice) → `enc_mi`/`codes`
    * full-corpus re-encode → `qt_mi` per-query ADC tables. Every CTE is
    * MATERIALIZED: DuckDB's default inlining re-expands the refinement
    * chain per reference and the replay goes from >300 s to ~1 s.
    */
  private def pqChainCtes(dim: Int, m: Int, ksub: Int,
                          maxQueryId: Long): String = {
    val sub = dim / m
    // dot of embedding subspace mi against a full stored vector's slice
    def dotSubFull(a: String, b: String, mi: Int): String =
      (1 to sub).map { i =>
        val idx = mi * sub + i
        s"(CAST($a[$idx] AS DOUBLE)*CAST($b[$idx] AS DOUBLE))"
      }.mkString("+")
    // dot of embedding subspace mi against a sub-dim codeword list w
    def dotSubW(a: String, mi: Int, w: String): String =
      (1 to sub).map { i =>
        s"(CAST($a[${mi * sub + i}] AS DOUBLE)*CAST($w[$i] AS DOUBLE))"
      }.mkString("+")
    def dotWW(w: String): String =
      (1 to sub).map(i =>
        s"(CAST($w[$i] AS DOUBLE)*CAST($w[$i] AS DOUBLE))").mkString("+")
    val s0Cols = (0 until m).map(mi =>
      s"(2*(${dotSubFull("e.embedding", "c.v", mi)}) - " +
        s"(${dotSubFull("c.v", "c.v", mi)})) AS s_$mi").mkString(",\n    ")
    val r0Cols = (0 until m).map(mi =>
      s"row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY s_$mi DESC, j DESC) AS r_$mi").mkString(",\n    ")
    val c0Cols = (0 until m).map(mi =>
      s"max(CASE WHEN r_$mi = 1 THEN j END) AS c_$mi").mkString(", ")
    val updCtes = (0 until m).map { mi =>
      s"""upd_$mi AS MATERIALIZED (
         |  SELECT c0.c_$mi AS code, i.i AS i,
         |    CAST(round(avg(
         |      CAST(e.embedding[${mi * sub} + i.i + 1] AS DOUBLE)), 6)
         |      AS FLOAT) AS v
         |  FROM c0 JOIN ptrain e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(range($sub)) AS i) i
         |  GROUP BY c0.c_$mi, i.i),
         |cbr_$mi AS MATERIALIZED (SELECT code, list(v ORDER BY i) AS w
         |            FROM upd_$mi GROUP BY code),
         |cbf_$mi AS MATERIALIZED (
         |  SELECT c.j AS code,
         |    coalesce(r.w, c.v[${mi * sub + 1}:${(mi + 1) * sub}]) AS w
         |  FROM cb0 c LEFT JOIN cbr_$mi r ON r.code = c.j)""".stripMargin
    }.mkString(",\n")
    val encCtes = (0 until m).map { mi =>
      s"""enc_$mi AS MATERIALIZED (
         |  SELECT vec_id, code FROM (
         |    SELECT e.vec_id, f.code,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (2*(${dotSubW("e.embedding", mi, "f.w")}) -
         |          (${dotWW("f.w")})) DESC, f.code DESC) AS rn
         |    FROM embeddings e CROSS JOIN cbf_$mi f) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    val qtCtes = (0 until m).map { mi =>
      s"""qt_$mi AS MATERIALIZED (
         |  SELECT e.vec_id AS query_id, f.code,
         |    (${dotSubW("e.embedding", mi, "f.w")}) AS d
         |  FROM embeddings e CROSS JOIN cbf_$mi f
         |  WHERE e.vec_id < $maxQueryId)""".stripMargin
    }.mkString(",\n")
    val codesCols = (0 until m).map(mi => s"e$mi.code AS c_$mi")
      .mkString(", ")
    val codesJoin = (1 until m).map(mi =>
      s"JOIN enc_$mi e$mi USING (vec_id)").mkString(" ")
    s"""ptrain AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT ${graft.similarity.Knn.TrainSampleN}),
       |cb0 AS MATERIALIZED (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j,
       |    embedding AS v
       |  FROM (SELECT vec_id, embedding FROM ptrain
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |        LIMIT $ksub)),
       |p0 AS MATERIALIZED (
       |  SELECT e.vec_id, c.j,
       |    $s0Cols
       |  FROM ptrain e CROSS JOIN cb0 c),
       |r0 AS MATERIALIZED (
       |  SELECT vec_id, j,
       |    $r0Cols
       |  FROM p0),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id, $c0Cols
       |  FROM r0 GROUP BY vec_id),
       |$updCtes,
       |$encCtes,
       |codes AS MATERIALIZED (
       |  SELECT e0.vec_id, $codesCols
       |  FROM enc_0 e0 $codesJoin),
       |$qtCtes""".stripMargin
  }

  def knnPqSql(dim: Int, m: Int, ksub: Int, k: Int,
               maxQueryId: Long): String =
    s"""WITH ${pqChainCtes(dim, m, ksub, maxQueryId)},
       |scored AS MATERIALIZED (
       |  SELECT q0.query_id, c.vec_id AS neighbor_id,
       |    (${pqApprox(m)}) AS approx
       |  FROM codes c
       |  JOIN qt_0 q0 ON q0.code = c.c_0
       |  ${pqQJoins(m)}
       |  WHERE c.vec_id <> q0.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       |  round(approx, 6) AS approx_dot
       |FROM (SELECT query_id, neighbor_id, approx,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY approx DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  /** IVF-PQ replay (`Knn.ivfPqTopK`): the shared k-means cells chain
    * prunes candidates to each query's `nProbe` best cells, and scoring
    * inside the probed cells is the shared PQ ADC chain over code
    * columns — coarse quantizer and compressed-domain scoring composed,
    * both individually deterministic.
    */
  def knnIvfPqSql(dim: Int, nCells: Int, nProbe: Int, m: Int, ksub: Int,
                  k: Int, maxQueryId: Long): String = {
    def cos(a: String, b: String) = cosArr(a, b, dim)
    s"""WITH ${kmeansCellsCtes(dim, nCells)},
       |${pqChainCtes(dim, m, ksub, maxQueryId)},
       |qprobe AS MATERIALIZED (
       |  SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT a.vec_id, t.cid,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cos("a.embedding", "t.cvec")} DESC,
       |          t.cid DESC) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $maxQueryId) a
       |    CROSS JOIN cent t) x
       |  WHERE rn <= $nProbe),
       |scored AS MATERIALIZED (
       |  SELECT q0.query_id, c.vec_id AS neighbor_id,
       |    (${pqApprox(m)}) AS approx
       |  FROM codes c
       |  JOIN cells cl ON cl.vec_id = c.vec_id
       |  JOIN qprobe p ON p.cell = cl.cell
       |  JOIN qt_0 q0 ON q0.code = c.c_0 AND q0.query_id = p.query_id
       |  ${pqQJoins(m)}
       |  WHERE c.vec_id <> q0.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       |  round(approx, 6) AS approx_dot
       |FROM (SELECT query_id, neighbor_id, approx,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY approx DESC, neighbor_id) AS rn
       |      FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Two-stage PQ → exact-rerank replay (`Knn.pqRerankTopK`): the
    * [[knnPqSql]] candidate stage widened to `candidates` per query,
    * then full-dimension exact cosine over the short list only.
    */
  def knnPqRerankSql(dim: Int, m: Int, ksub: Int, k: Int, candidates: Int,
                     maxQueryId: Long): String = {
    val inner = knnPqSql(dim, m, ksub, candidates, maxQueryId)
    // strip the trailing ORDER BY of the candidate stage; rerank re-ranks
    val candSql = inner.stripSuffix(" ORDER BY query_id, rank")
    s"""WITH cand AS ($candSql),
       |rr AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosArr("q2.embedding", "e.embedding", dim)} AS cos
       |  FROM cand
       |  JOIN embeddings q2 ON q2.vec_id = cand.query_id
       |  JOIN embeddings e ON e.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       |  round(cos, 6) AS cosine
       |FROM (SELECT query_id, neighbor_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM rr) t
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** MMR diversification (`Knn.mmrDiversify`): the greedy selection is
    * unrolled into `kSel` chained CTE steps (no recursion — each step is
    * an argmax window over the bounded candidate set). rel/sim replay the
    * bit-identical cosine expansion; the MMR score uses the SAME two
    * double literals the Spark side multiplies with (`lambdaLit` /
    * `oneMinusLambdaLit` passed as source text — 1−0.7 recomputed in
    * doubles would be 0.30000000000000004, a different constant).
    */
  def mmrSql(dim: Int, nQueries: Long, kCand: Int, kSel: Int,
             lambdaLit: String, oneMinusLambdaLit: String): String = {
    val relCos = cosExpr("q", "e", dim)
    val rnCand = "ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY rel DESC, cid)"
    val candCtes =
      s"""q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |           WHERE vec_id < $nQueries),
         |pairs AS (SELECT q.query_id, e.vec_id AS cid, $relCos AS rel
         |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
         |cand AS MATERIALIZED (SELECT query_id, cid, rel FROM (
         |    SELECT query_id, cid, rel, $rnCand AS rn FROM pairs) t
         |  WHERE rn <= $kCand)""".stripMargin
    mmrBody(candCtes, dim, kSel, lambdaLit, oneMinusLambdaLit)
  }

  /** MMR over the IVF serving path (`Knn.mmrDiversifyIvf`): the
    * candidate CTEs are the [[knnIvfSql]] chain verbatim (md5
    * centroids, argmax cells, nProbe routing) truncated at rank ≤
    * kCand with RAW scores, feeding the SAME greedy unroll as
    * [[mmrSql]] — the oracle-side proof that diversification composes
    * with the ANN tier, not just the brute scan.
    */
  def mmrIvfSql(dim: Int, nQueries: Long, kCand: Int, kSel: Int,
                nCells: Int, nProbe: Int, lambdaLit: String,
                oneMinusLambdaLit: String): String = {
    val cosCT = cosExpr("c", "t", dim)
    val cosQT = cosExpr("a", "t", dim)
    val cosQC = cosExpr("q", "c", dim)
    val candCtes =
      s"""cent AS (
         |  SELECT vec_id AS cid, embedding FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
         |cells AS (
         |  SELECT vec_id, embedding, cid AS cell FROM (
         |    SELECT c.vec_id, c.embedding, t.cid,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY $cosCT DESC, t.cid DESC) AS rn
         |    FROM embeddings c CROSS JOIN cent t) x
         |  WHERE rn = 1),
         |qprobe AS (
         |  SELECT vec_id AS query_id, embedding, cid AS cell FROM (
         |    SELECT a.vec_id, a.embedding, t.cid,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY $cosQT DESC, t.cid DESC) AS rn
         |    FROM (SELECT * FROM embeddings WHERE vec_id < $nQueries) a
         |    CROSS JOIN cent t) x
         |  WHERE rn <= $nProbe),
         |ivfsc AS (
         |  SELECT q.query_id, c.vec_id AS cid, $cosQC AS rel
         |  FROM qprobe q JOIN cells c USING (cell)
         |  WHERE c.vec_id <> q.query_id),
         |cand AS MATERIALIZED (SELECT query_id, cid, rel FROM (
         |    SELECT query_id, cid, rel,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, cid) AS rn FROM ivfsc) t
         |  WHERE rn <= $kCand)""".stripMargin
    mmrBody(candCtes, dim, kSel, lambdaLit, oneMinusLambdaLit)
  }

  /** Shared MMR greedy unroll over a `cand(query_id, cid, rel)` CTE
    * chain — sims from the candidates' vectors, then kSel chained
    * argmax steps (see [[mmrSql]] for the literal-discipline note). */
  private def mmrBody(candCtes: String, dim: Int, kSel: Int,
                      lambdaLit: String,
                      oneMinusLambdaLit: String): String = {
    val simCos = cosExpr("a", "b", dim)
    val rnCand = "ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY rel DESC, cid)"
    // every multi-referenced CTE below is MATERIALIZED (r19, verdict
    // item 5): DuckDB inlines plain CTEs PER REFERENCE, and the
    // chained greedy steps reference cand/sims/sel$i repeatedly —
    // the un-marked form re-derived the whole candidate chain
    // (including the IVF assign cross join) once per reference,
    // exponentially in kSel: e_mmr_ivf's oracle measured 39.1 s at
    // sf0.01 vs 0.8 s materialized, rows identical.
    val head =
      s"""WITH $candCtes,
         |cv AS MATERIALIZED (SELECT c.query_id, c.cid, e.embedding
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.cid),
         |sims AS MATERIALIZED (SELECT a.query_id, a.cid AS a_id,
         |    b.cid AS b_id, $simCos AS sim
         |  FROM cv a JOIN cv b
         |    ON a.query_id = b.query_id AND a.cid <> b.cid),
         |sel1 AS MATERIALIZED (SELECT query_id, 1 AS step,
         |    cid AS selected_id, rel AS score FROM (
         |    SELECT query_id, cid, rel, $rnCand AS rn FROM cand) t
         |  WHERE rn = 1)""".stripMargin
    val steps = (2 to kSel).map { t =>
      val selu = (1 until t).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      s"""selu$t AS MATERIALIZED ($selu),
         |ms$t AS (SELECT s.query_id, s.a_id, max(s.sim) AS maxsim
         |  FROM sims s JOIN selu$t p
         |    ON p.query_id = s.query_id AND p.selected_id = s.b_id
         |  GROUP BY s.query_id, s.a_id),
         |mm$t AS (SELECT c.query_id, c.cid,
         |    CAST($lambdaLit AS DOUBLE) * c.rel -
         |    CAST($oneMinusLambdaLit AS DOUBLE) * m.maxsim AS mmr
         |  FROM cand c JOIN ms$t m
         |    ON m.query_id = c.query_id AND m.a_id = c.cid
         |  WHERE NOT EXISTS (SELECT 1 FROM selu$t p
         |    WHERE p.query_id = c.query_id AND p.selected_id = c.cid)),
         |sel$t AS MATERIALIZED (SELECT query_id, $t AS step,
         |    cid AS selected_id, mmr AS score FROM (
         |    SELECT query_id, cid, mmr, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY mmr DESC, cid) AS rn
         |    FROM mm$t) t WHERE rn = 1)""".stripMargin
    }
    val union = (1 to kSel).map(i => s"SELECT * FROM sel$i")
      .mkString(" UNION ALL ")
    (Seq(head) ++ steps).mkString(",\n") +
      s"""
         |SELECT query_id, CAST(step AS BIGINT) AS step, selected_id,
         |  round(score, 6) AS score
         |FROM ($union) u
         |ORDER BY query_id, step""".stripMargin
  }

  /** The curation-gate CTE chain (`toks` … `ckeep`) shared by the
    * `curate_e2e_pipeline` oracle and its streaming twin
    * `stream_curate_pipeline` — ONE definition, parameterized only by
    * the source relation, so the two replays cannot drift from each
    * other or from the engine-side `TextStats.curationGate`. Emits, in
    * order: tokenize (`toks`), Gopher word-shape stats + keep
    * (`gop`/`gkeep`), repetition stats + keep
    * (`runi`/`g2`/`r2`/`g3`/`r3`/`rch`/`rkeep`), and classifier score +
    * keep (`feats`/`w`/`scored`/`ckeep`). The caller splices it into a
    * WITH chain and joins `gkeep`/`rkeep`/`ckeep` (plus `gop`/`scored`
    * for stat columns). `toks`/`rch` filter NULL text explicitly —
    * equivalent to the unguarded form (NULL text yields zero token
    * rows either way) and identical to the engine's NULL-drop. */
  def curationGateCtes(source: String, dim: Int): String =
    s"""toks AS MATERIALIZED (
       |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
       |  FROM (SELECT doc_id,
       |          string_split_regex(trim(text), '\\s+') AS toks
       |        FROM $source WHERE text IS NOT NULL) t,
       |    unnest(range(0, len(toks))) AS u(p)),
       |gop AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    CAST(sum(length(tok)) AS BIGINT) AS word_chars,
       |    CAST(sum(CASE WHEN regexp_matches(tok, '[a-zA-Z]')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       |    CAST(sum(CASE WHEN tok IN ('the','be','to','of',
       |      'and','that','have','with') THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_stop,
       |    CAST(sum((length(tok) - length(replace(tok, '#', '')))
       |      + (length(tok) -
       |         length(replace(tok, '...', ''))) // 3)
       |      AS BIGINT) AS n_sym
       |  FROM toks GROUP BY doc_id),
       |gkeep AS (
       |  SELECT doc_id FROM gop
       |  WHERE n_words >= 50 AND n_words <= 100000
       |    AND 3 * n_words <= word_chars
       |    AND word_chars <= 10 * n_words
       |    AND 5 * n_alpha >= 4 * n_words
       |    AND 10 * n_sym <= n_words
       |    AND n_stop >= 2),
       |runi AS (
       |  SELECT doc_id, count(*) AS n_toks,
       |    count(*) - count(DISTINCT tok) AS dup_toks
       |  FROM toks GROUP BY doc_id),
       |g2 AS (
       |  SELECT doc_id, tok || ' ' ||
       |      lead(tok) OVER (PARTITION BY doc_id ORDER BY p)
       |      AS gram
       |  FROM toks),
       |r2 AS (
       |  SELECT doc_id,
       |    CAST(max(cnt * length(gram)) AS BIGINT) AS rep2_chars
       |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g2
       |        WHERE gram IS NOT NULL GROUP BY doc_id, gram) c
       |  GROUP BY doc_id),
       |g3 AS (
       |  SELECT doc_id, tok || ' ' ||
       |      lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY p) ||
       |      ' ' || lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY p)
       |      AS gram
       |  FROM toks),
       |r3 AS (
       |  SELECT doc_id,
       |    CAST(max(cnt * length(gram)) AS BIGINT) AS rep3_chars
       |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g3
       |        WHERE gram IS NOT NULL GROUP BY doc_id, gram) c
       |  GROUP BY doc_id),
       |rch AS (SELECT doc_id,
       |    CAST(length(trim(text)) AS BIGINT) AS n_chars
       |  FROM $source WHERE text IS NOT NULL),
       |rkeep AS (
       |  SELECT runi.doc_id FROM runi
       |  JOIN rch ON runi.doc_id = rch.doc_id
       |  LEFT JOIN r2 ON runi.doc_id = r2.doc_id
       |  LEFT JOIN r3 ON runi.doc_id = r3.doc_id
       |  WHERE 5 * coalesce(rep2_chars, 0) <= n_chars
       |    AND 50 * coalesce(rep3_chars, 0) <= 9 * n_chars
       |    AND 4 * dup_toks <= 3 * n_toks),
       |feats AS (
       |  SELECT doc_id, tok AS feat FROM toks
       |  UNION ALL
       |  SELECT doc_id, feat FROM (
       |    SELECT doc_id, tok || ' ' || lead(tok) OVER
       |        (PARTITION BY doc_id ORDER BY p) AS feat
       |    FROM toks) b
       |  WHERE feat IS NOT NULL),
       |w AS (${graft.ops.TextClassifier.standInWeightsSql(dim)}),
       |scored AS (
       |  SELECT doc_id, count(*) AS n_feats,
       |    CAST(sum(wgt) AS BIGINT) AS dot
       |  FROM (SELECT doc_id,
       |          ${graft.ops.TextClassifier.featureHashSql("feat", dim)}
       |            AS fid
       |        FROM feats) h
       |  JOIN w USING (fid)
       |  GROUP BY doc_id),
       |ckeep AS (
       |  SELECT doc_id FROM scored
       |  WHERE 1000 * dot >= 5 * n_feats)""".stripMargin
}
