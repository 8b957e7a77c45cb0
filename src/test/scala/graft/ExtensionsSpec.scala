package graft

import graft.functions.GraftFunctions
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native vector expressions and the
  * flatMapGroupsWithState streaming sessionizer.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered vec_* functions parse and evaluate from spark.sql") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("ext_vec")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, vec_l2(a) AS n, " +
        "vec_cosine(a, a) AS c, lsh_bucket(a, 4) AS bk FROM ext_vec")
      .collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getLong(3) >= 0 && r.getLong(3) < 16)
    // quantized tier: codes of (1,2,3)/maxabs=3 → (42,85,127); self-dot
    val r2 = spark.sql(
      "SELECT vec_sq8(a) AS codes, " +
        "vec_i8_dot(vec_sq8(a), vec_sq8(a)) AS qq FROM ext_vec")
      .collect().head
    assert(r2.getSeq[Int](0) == Seq(42, 85, 127))
    assert(r2.getLong(1) == 42L * 42 + 85L * 85 + 127L * 127)
  }

  test("lsh_bucket via SQL requires a literal plane count") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0f), 2)).toDF("a", "n").createOrReplaceTempView("ext_bad")
    intercept[Exception] {
      spark.sql("SELECT lsh_bucket(a, n) FROM ext_bad").collect()
    }
  }

  test("wrong arity fails with a clean analysis-time error, not an IOOBE") {
    GraftFunctions.register(spark)
    Seq(Seq(1.0f)).toDF("a").createOrReplaceTempView("ext_arity")
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(a) FROM ext_arity").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).map(x => x +: chain(x.getCause)).getOrElse(Nil)
    assert(!chain(e).exists(_.isInstanceOf[IndexOutOfBoundsException]))
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("vec_dot(a, b)"))))
  }

  test("LevenshteinPrune rule: length-difference guard injected, " +
    "results unchanged") {
    val df = Seq("ALGERIA", "NIGERIA", "ARGENTINA", "IRAN", "IRAQ")
      .toDF("n1")
    def pairs = df.crossJoin(df.select($"n1".as("n2")))
      .filter($"n1" < $"n2" && levenshtein($"n1", $"n2") <= 2)
    // materialize the baseline on a FRESH plan before installing (a
    // QueryExecution caches its optimizedPlan, so reuse would mask the rule)
    val before = pairs.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet
    graft.plans.LevenshteinPrune.install(spark)
    try {
      graft.plans.LevenshteinPrune.install(spark) // idempotent
      assert(spark.experimental.extraOptimizations
        .count(_ == graft.plans.LevenshteinPrune) == 1)
      val guarded = pairs
      val optimized = guarded.queryExecution.optimizedPlan
      assert(optimized.toString.contains("abs((length(n1"),
        s"guard missing in:\n$optimized")
      val after = guarded.collect().map(r =>
        (r.getString(0), r.getString(1))).toSet
      assert(after == before && before.contains(("ALGERIA", "NIGERIA")))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.LevenshteinPrune)
    }
  }

  test("LevenshteinPrune rule: strict `< k` converges to exactly one guard") {
    val df = Seq("ALGERIA", "NIGERIA", "ARGENTINA", "IRAN", "IRAQ")
      .toDF("n1")
    def pairs = df.crossJoin(df.select($"n1".as("n2")))
      .filter($"n1" < $"n2" && levenshtein($"n1", $"n2") < 3)
    val before = pairs.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet
    graft.plans.LevenshteinPrune.install(spark)
    try {
      val optimized = pairs.queryExecution.optimizedPlan
      val guards = "abs\\(\\(length\\(n1".r
        .findAllIn(optimized.toString).length
      assert(guards == 1, s"expected exactly 1 guard, got $guards in:\n$optimized")
      val after = pairs.collect().map(r =>
        (r.getString(0), r.getString(1))).toSet
      assert(after == before && before.contains(("ALGERIA", "NIGERIA")))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.LevenshteinPrune)
    }
  }

  test("streaming sessionization == batch window sessionization") {
    val sf = TestSpark.sf
    val schema = Tables.eventsRaw(spark, sf).schema
    val streaming = Streams.runToMemoryAppend(spark,
        s"spec_sessions_${System.nanoTime()}") { scoped =>
        val stream = Tables.normalizeEventsTs(
          Streams.fileStream(scoped, s"$sf/events.*", schema,
            maxFilesPerTrigger = Int.MaxValue))
        Streams.streamingSessionCounts(stream, gapMicros = 21600000000L)
      }
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = Tables.events(spark, sf)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 21600000000L,
          1).otherwise(0))
      .groupBy($"user_id")
      .agg(sum($"new_session").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streaming.toSeq == batch.toSeq)
  }
}
