package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property `j_bucketed_colocated` sells: a sort-merge join of
  * two tables bucketed on the join key with equal bucket counts runs
  * with ZERO shuffle exchange on either side — the layout-level join
  * strategy a 100 TB star schema relies on when the dim side is too big
  * to broadcast.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("bucketed sort-merge join plans no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bspec")
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$tmp/facts").saveAsTable("facts_bspec")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$tmp/dims").saveAsTable("dims_bspec")
    val j = spark.table("facts_bspec").hint("merge")
      .join(spark.table("dims_bspec").hint("merge"), Seq("k"))
    val plan = executed(j)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(j.count() == 1000)
    // mismatched bucket counts would reintroduce an exchange on one
    // side — the single-writer guarantee j_bucketed_colocated documents
    dims.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$tmp/dims4").saveAsTable("dims_bspec4")
    val j2 = spark.table("facts_bspec").hint("merge")
      .join(spark.table("dims_bspec4").hint("merge"), Seq("k"))
    try assert(executed(j2).contains("Exchange"))
    finally {
      // drop before deleting the backing dirs: dangling catalog entries
      // in the shared TestSpark session would pollute later suites
      Seq("facts_bspec", "dims_bspec", "dims_bspec4")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.queries.Scratch.rmTree(tmp.toFile)
    }
  }
}
