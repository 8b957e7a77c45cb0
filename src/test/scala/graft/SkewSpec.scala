package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew posture at scale: one hot key in a shuffled join puts its whole
  * partition on one task — the canonical 100 TB straggler. Two mitigations
  * ship in this engine: manual salting (`Relational.saltedJoin`, already
  * specced in IngestScaleSpec) and AQE's runtime skew-join split, pinned
  * here so the AQE path is demonstrably live in this Spark build.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // isolated session conf: thresholds lowered so test-size data trips the
    // skew detector; the shared session is never mutated
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    import spark.implicits._

    // 50k rows on ONE key, a handful elsewhere: partition holding key 0 is
    // orders of magnitude over the (lowered) threshold
    val left = spark.range(0, 50000).select(
        lit(0L).as("k"), col("id").as("payload"))
      .union(spark.range(1, 200).select(col("id").as("k"), col("id")))
    val right = spark.range(0, 200).select(col("id").as("k"),
      (col("id") * 10).as("v"))
    val joined = left.join(right, "k")
    val n = joined.count()
    assert(n == 50000 + 199)

    // after execution the final adaptive plan must mark the SMJ as skew-split
    val qe = joined.queryExecution.executedPlan
    val adaptive = qe.collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined, s"no adaptive plan:\n$qe")
    // count() ran its own QueryExecution; re-execute this one to finalize
    joined.collect()
    val smj = {
      def find(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[SortMergeJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          find(q.plan)
        case s: SortMergeJoinExec => Seq(s)
        case other => other.children.flatMap(find)
      }
      find(qe)
    }
    assert(smj.nonEmpty, "expected a sort-merge join in the final plan")
    assert(smj.exists(_.isSkewJoin),
      s"skew split did not trigger: ${smj.map(_.isSkewJoin)}")
  }
}
