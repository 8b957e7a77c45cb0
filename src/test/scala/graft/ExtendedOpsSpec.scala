package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics for the round-3 operator surface that the harness data
  * cannot exercise (the oracle sweep covers the data paths at 3 scales).
  */
class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unpivot drops pivot-fill nulls: melt(pivot(x)) == long groupBy") {
    // nation 2 has no segment B — pivot fills null, unpivot must drop it
    val rows = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"))
      .toDF("k", "seg")
    val wide = rows.groupBy($"k").pivot("seg", Seq("A", "B"))
      .agg(count(lit(1)))
    val long = wide.unpivot(Array(col("k")),
        Array(col("A"), col("B")), "seg", "n")
      .filter($"n".isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(long == Set((1L, "A", 2L), (1L, "B", 1L), (2L, "A", 1L)))
  }

  test("date spine fills empty days with zero, covers both endpoints") {
    val spine = spark.range(1).select(explode(sequence(
      lit(java.sql.Date.valueOf("2020-01-01")),
      lit(java.sql.Date.valueOf("2020-01-05")))).as("d"))
    val daily = Seq(("2020-01-02", 3L), ("2020-01-04", 1L))
      .toDF("ds", "n").select($"ds".cast("date").as("d"), $"n")
    val out = spine.join(daily, Seq("d"), "left")
      .na.fill(0L, Seq("n")).orderBy($"d")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(out == Seq("2020-01-01" -> 0L, "2020-01-02" -> 3L,
      "2020-01-03" -> 0L, "2020-01-04" -> 1L, "2020-01-05" -> 0L))
  }

  test("argmax via max_by(struct): highest value wins, ties by key") {
    val df = Seq((1L, "x", 5.0, 10L), (1L, "y", 5.0, 20L),
      (1L, "z", 3.0, 30L)).toDF("g", "name", "v", "k")
    val r = df.groupBy($"g")
      .agg(max_by($"name", struct($"v", $"k")).as("top"),
        min_by($"name", struct($"v", $"k")).as("bottom"))
      .collect().head
    assert(r.getString(1) == "y") // v tie 5.0 → higher k (20) wins
    assert(r.getString(2) == "z") // lowest v
  }

  test("regex scrub: replace-all and count agree; empty text is safe") {
    val df = Seq((1L, "alpha beta aqua"), (2L, ""), (3L, "none here"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        regexp_count($"text", lit("\\ba[a-z]*")).as("n"),
        regexp_replace($"text", "\\ba[a-z]*", "[TOK]").as("t"))
      .orderBy($"doc_id").collect()
    assert(out(0).getInt(1) == 2 &&
      out(0).getString(2) == "[TOK] beta [TOK]")
    assert(out(1).getInt(1) == 0 && out(1).getString(2) == "")
    assert(out(2).getInt(1) == 0)
  }

  test("foreachBatch incremental merge: multi-batch streaming append " +
    "equals the batch union (SURVEY §2.7 incremental O-20)") {
    // force MULTIPLE batches (maxFilesPerTrigger=1 over 4 files) and merge
    // each into a target dir via foreachBatch — the incremental form of
    // the global concat; the final read-back must equal the static input
    val base = java.nio.file.Files.createTempDirectory("graft-fb-")
    val srcDir = s"$base/src"; val tgtDir = s"$base/tgt"
    val ckpt = s"$base/ckpt"
    val src = Tables.events(spark, TestSpark.sf)
      .select($"event_id", $"event_type", $"user_id")
    src.repartition(4).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(tgtDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must exercise the multi-batch path")
    val got = spark.read.parquet(tgtDir)
    assert(got.count() == src.count())
    assert(got.agg(sum($"event_id")).head.getLong(0) ==
      src.agg(sum($"event_id")).head.getLong(0))
  }

  test("TopKAgg: bounded buffer equals full-sort top-k on random data") {
    import graft.functions.{KV, TopKAgg}
    val rng = new scala.util.Random(11)
    val agg = new TopKAgg(5)
    (0 until 20).foreach { _ =>
      val data = Seq.fill(50)(KV(rng.nextInt(10).toLong, rng.nextLong()))
      // arbitrary partial/merge order must not change the result
      val chunks = data.grouped(7).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = chunks.foldLeft(agg.zero)(agg.merge)
      val expect = data.sortBy(kv => (-kv.v, -kv.id)).take(5)
      assert(agg.finish(merged) == expect)
    }
  }

  test("TopKAgg distributed: per-group top-k equals window row_number") {
    import graft.functions.TopKAgg
    val df = Seq.tabulate(200)(i =>
      (s"g${i % 3}", (i * 37 % 11).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(8)
    val got = df.groupBy($"g").agg(TopKAgg.topK(4)($"v", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.v", $"col.id")
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id".desc)
    val expect = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 4)
      .select($"g", $"rank", $"v", $"id")
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("grouping sets: marker columns identify each grouping level") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3))
      .toDF("p", "s", "v")
    val out = df.groupingSets(
        Seq(Seq($"p", $"s"), Seq($"p"), Seq()), $"p", $"s")
      .agg(sum($"v").cast("long").as("t"),
        grouping($"p").cast("long").as("gp"),
        grouping($"s").cast("long").as("gs"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out.contains((Some("a"), Some("x"), 1L, 0L, 0L)))
    assert(out.contains((Some("a"), None, 3L, 0L, 1L)))
    assert(out.contains((None, None, 6L, 1L, 1L)))
    assert(out.size == 6) // 3 leaf + 2 per-p + 1 grand total
  }
}
