package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format matrix beyond parquet + the reference's TSV/CSV/MM
  * formats: ORC (the other columnar format Spark ships a vectorized,
  * pushdown-capable reader for) and JSON-lines (the interchange format for
  * document pipelines). Both roundtrip the same tables the parquet paths
  * use, and ORC must push predicates like parquet does.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ORC roundtrip preserves rows and pushes predicates to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val orders = Tables.orders(spark, TestSpark.sf)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == orders.count())
    val q = back.filter($"o_orderstatus" === "F").select($"o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderstatus"), s"no ORC pushdown:\n${plan.take(800)}")
    assert(q.count() ==
      orders.filter($"o_orderstatus" === "F").count())
  }

  test("JSON-lines roundtrip preserves values incl. nulls and unicode") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"text", $"lang")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    // exact content equality both directions (null-safe)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }
}
