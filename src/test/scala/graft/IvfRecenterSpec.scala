package graft

import graft.functions.vector._
import graft.ops.AtomicSwap
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF index lifecycle: frozen-centroid appends accumulate occupancy
  * drift (a planted shifted batch piles into few cells);
  * `recenterIvfIndex` retrains on the live contents, rebalances the
  * layout, preserves every row, compacts to one file per cell, and
  * commits through the AtomicSwap crash-safe swap.
  */
class IvfRecenterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // batch A: 48 vectors in 4 well-separated directions (id % 4), tiny
  // deterministic jitter so cosines aren't exactly tied
  private def batchA = (0L until 48L).map { id =>
    val v = new Array[Float](8)
    v((id % 4).toInt * 2) = 1f
    v(7) = 0.01f * (id % 5)
    (id, v)
  }
  // batch B (the DRIFTED batch): 48 vectors all tight around ONE new
  // direction none of A's centroids represent
  private def batchB = (100L until 148L).map { id =>
    val v = Array.fill(8)(0.5f)
    v(6) = 0.5f + 0.01f * (id % 7)
    (id, v)
  }

  test("planted shifted batch drives occupancy skew up; recenter " +
      "rebalances, preserves rows, compacts, and leaves no swap debris") {
    val a = batchA.toDF("vec_id", "embedding")
    val b = batchB.toDF("vec_id", "embedding")
    val stale = Knn.kmeansCentroids(a, "vec_id", "embedding", 4)
    def assigned(df: org.apache.spark.sql.DataFrame,
                 cents: Seq[(Long, Array[Float])]) =
      df.select($"vec_id", $"embedding",
        vec_argmax_cosine($"embedding", cents).as("cell"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-recenter-spec-").toFile
    try {
      val p = s"${tmp.getAbsolutePath}/index"
      assigned(a, stale).write.partitionBy("cell").parquet(p)
      val balanced = Knn.ivfOccupancyStats(spark, p)
      assigned(b, stale).write.mode("append").partitionBy("cell").parquet(p)
      val drifted = Knn.ivfOccupancyStats(spark, p)
      // the whole shifted batch lands in ONE frozen cell: drift is real
      assert(drifted.nRows == 96L)
      assert(drifted.skew > balanced.skew,
        s"planted batch did not skew occupancy: $balanced -> $drifted")
      val cents = Knn.recenterIvfIndex(spark, p, "vec_id", "embedding", 4)
      val after = Knn.ivfOccupancyStats(spark, p)
      assert(after.nRows == 96L, s"recenter lost rows: $after")
      assert(after.skew < drifted.skew,
        s"recenter did not rebalance: $drifted -> $after")
      // compaction half: exactly one file per cell
      assert(graft.queries.Scratch.partitionDirs(spark, p, "cell=")
        .forall(_._2 == 1))
      // swap committed clean
      assert(!new java.io.File(p + ".old").exists())
      assert(!new java.io.File(p + ".compacting").exists())
      // probes against the NEW centroids see old and new vectors ranked
      val res = Knn.atRestProbeTopK(spark, p, cents,
        a.filter($"vec_id" < 2), "vec_id", "embedding", k = 3, nProbe = 2)
        .collect()
      assert(res.length == 6) // 2 queries × k=3
    } finally graft.queries.Scratch.rmTree(tmp)
  }

  test("AtomicSwap.recover: restores .old when live is missing, drops " +
      "stale .old next to an intact live dir") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-swap-spec-").toFile
    try {
      val live = new java.io.File(tmp, "idx")
      val old = new java.io.File(tmp, "idx.old")
      // crash window 1: aside-rename done, swap not — only .old exists
      old.mkdirs()
      java.nio.file.Files.writeString(old.toPath.resolve("f"), "x")
      AtomicSwap.recover(live.getPath)
      assert(live.isDirectory && !old.exists())
      assert(new java.io.File(live, "f").exists())
      // crash window 2: swap done, cleanup not — both exist, live wins
      old.mkdirs()
      java.nio.file.Files.writeString(old.toPath.resolve("stale"), "y")
      AtomicSwap.recover(live.getPath)
      assert(live.isDirectory && !old.exists())
      assert(new java.io.File(live, "f").exists())
    } finally graft.queries.Scratch.rmTree(tmp)
  }
}
