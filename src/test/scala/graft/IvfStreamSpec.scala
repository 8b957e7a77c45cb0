package graft

import graft.similarity.Knn
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF top-k recall vs brute force ≥ 0.4 with 8 cells / 3 probes") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 10))
    val ivf = pairs(Knn.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nCells = 8, nProbe = 3))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
    // candidate set is genuinely pruned: ≤ nProbe/nCells of all pairs probed
    assert(ivf.size <= brute.size)
  }

  test("streaming dedup within watermark removes same-key duplicates") {
    val schema = Tables.eventsRaw(spark, TestSpark.sf).schema
    val stream = Tables.normalizeEventsTs(
      Streams.fileStream(spark, s"${TestSpark.sf}/events.*", schema))
    // event_type has 5 distinct values — streaming dedup keeps 5 rows
    val dedup = Streams.streamingDedup(stream, "ts", Seq("event_type"),
      "10 days")
    val q = dedup.writeStream.format("memory")
      .queryName("spec_stream_dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("spec_stream_dedup")
      .select("event_type").distinct().count()
    val total = spark.table("spec_stream_dedup").count()
    assert(n == 5 && total == 5)
  }
}
