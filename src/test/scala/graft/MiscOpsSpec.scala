package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Coverage for the small operators that are sinks / generators rather
  * than oracle-checkable queries: K-3 TSV sink with pandas-style index
  * round-trip, F-10 uuid generation, S-12 skip-empty-dir guard, and the
  * HLL sketch accuracy bound behind `agg_approx_distinct`.
  */
class MiscOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("K-3 TSV sink: tab-separated with explicit index column round-trips") {
    val dir = Files.createTempDirectory("graft-tsv").toString
    val df = Tables.region(spark, TestSpark.sf)
      .orderBy("r_regionkey")
      .withColumn("index",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("r_regionkey")) - 1)
      .select("index", "r_regionkey", "r_name")
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true").csv(dir)
    val back = spark.read.option("sep", "\t").option("header", "true")
      .csv(dir)
    assert(back.count() == 5)
    assert(back.columns.toSeq == Seq("index", "r_regionkey", "r_name"))
    assert(back.orderBy("index").select("index").as[String]
      .collect().toSeq == Seq("0", "1", "2", "3", "4"))
  }

  test("F-10 uuid(): one random v4 uuid per row, well-formed") {
    val ids = spark.range(10).select(expr("uuid()").as("u"))
      .as[String].collect()
    assert(ids.distinct.length == 10)
    assert(ids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }

  test("F-11 creation timestamp: current_timestamp constant per query") {
    val ts = spark.range(100)
      .select(date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")
        .as("t")).as[String].collect()
    assert(ts.distinct.length == 1)
  }

  test("S-12 skip-empty-dir guard: manifest filter on per-dir file count") {
    val mf = Seq(("ds1", "hdf5"), ("ds1", "centers"), ("ds2", "hdf5"))
      .toDF("dataset", "kind")
    val nonEmpty = mf.groupBy("dataset").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).select("dataset")
    assert(nonEmpty.as[String].collect().toSeq == Seq("ds1"))
  }

  test("approx_count_distinct within HLL++ error bounds on lineitem") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey").as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
