package graft

import graft.ops.{TextClassifier, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench (r18 optimization aid): per-component cost of the
  * inline curation gate on one micro-batch-sized corpus, single task
  * (the streaming serving shape). Usage: runMain graft.ProfInline [sfDir]
  */
object ProfInline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .filter($"doc_id" < 1250).select($"doc_id", $"text")
      .coalesce(1).localCheckpoint()
    val n = docs.count()
    val wmap = TextClassifier.standInWeights(spark, 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$label%-28s min=${ts.min}%6.3fs  ($n docs)")
    }
    val toks = docs.select($"doc_id",
      split(trim($"text"), "\\s+").as("__toks"))
    time("split only") { toks.select(size($"__toks")).agg(sum("size(__toks)")).head(); n }
    time("full inline gate") {
      TextStats.curationStatsInline(docs, "doc_id", "text", wmap, 1024)
        .agg(sum($"dot")).head(); n }
    def one(label: String, c: org.apache.spark.sql.Column): Unit =
      time(label) { toks.select(c.as("x")).agg(max(hash($"x"))).head(); n }
    one("n_alpha rlike", expr(
      "CAST(size(filter(__toks, t -> t rlike '[a-zA-Z]')) AS BIGINT)"))
    one("n_sym replace", expr("aggregate(__toks, 0L, (a, t) -> a + CAST(" +
      "(length(t) - length(replace(t, '#', ''))) + " +
      "((length(t) - length(replace(t, '...', ''))) div 3) AS BIGINT))"))
    one("dup_toks distinct", size($"__toks") - size(array_distinct($"__toks")))
    def gramsArr(nn: Int) =
      s"CASE WHEN size(__toks) < $nn THEN array() " +
        s"ELSE transform(sequence(0, size(__toks) - $nn), " +
        s"i -> array_join(slice(__toks, i + 1, $nn), ' ')) END"
    one("grams2 build", expr(s"size(${gramsArr(2)})").cast("long"))
    one("grams2 sort", expr(s"size(array_sort(${gramsArr(2)}))").cast("long"))
    def repBest(nn: Int) = expr(
      s"""aggregate(array_sort(${gramsArr(nn)}),
         |  named_struct('prev', CAST(NULL AS STRING),
         |    'run', 0L, 'best', 0L),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run', CASE WHEN x = acc.prev THEN acc.run + 1L
         |      ELSE 1L END,
         |    'best', greatest(acc.best,
         |      (CASE WHEN x = acc.prev THEN acc.run + 1L
         |        ELSE 1L END) * CAST(length(x) AS BIGINT))),
         |  acc -> acc.best)""".stripMargin)
    one("repBest(2)", repBest(2))
    one("repBest(3)", repBest(3))
    val warr = typedLit((0 until 1024).map(i => wmap(i.toLong)))
    one("feats hash fold", aggregate(
      transform(expr(TextClassifier.featsExpr),
        f => TextClassifier.featureHash(f, 1024)),
      lit(0L), (acc, fid) => acc + element_at(warr, (fid + 1L).cast("int"))))
    one("feats hash only", aggregate(
      transform(expr(TextClassifier.featsExpr),
        f => TextClassifier.featureHash(f, 1024)),
      lit(0L), (acc, fid) => acc + fid))
    spark.stop()
  }
}
