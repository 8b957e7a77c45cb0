package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness (r19, VERDICT item 3): time the co-activity edge
  * derivation variants ALTERNATING in one JVM over the same events
  * frame, so host phase hits all variants equally. Asserts the edge
  * COUNTS match before printing timings (the full per-query oracle
  * check still gates the real swap). Not part of the bench/driver
  * contract. Usage: runMain graft.CoactAB [sfDir] [reps]
  */
object CoactAB {

  /** r17 shape: distinct → repartition(etype,hr) → occupancy Window →
    * filter → self-join (second events pass) → distinct. */
  def vR17(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    val act = events
      .select($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("hr"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"hr")
    val counted = act.repartition($"event_type", $"hr")
      .withColumn("occ", count(lit(1)).over(w))
      .crossJoin(broadcast(graft.dedup.Dedup.inPlanCap(act)))
    val l = counted.filter($"occ" <= $"bkt_cap")
    val a2 = act.select($"user_id".as("u2"), $"event_type".as("et2"),
      $"hr".as("hr2"))
    l.join(a2,
        $"event_type" === $"et2" && $"hr" === $"hr2" &&
          $"user_id" < $"u2")
      .select($"user_id".as("a"), $"u2".as("b")).distinct()
  }

  /** Whatever production currently ships (after the r19 swap this is
    * the fused shape — kept so the harness always covers HEAD). */
  def vNow(s: SparkSession, events: DataFrame): DataFrame =
    graft.queries.Coactivity.undFromEvents(s, events)

  /** r18 shape (inlined for A/B history): distinct → bucket counts →
    * under-cap join-back (its own act-scale exchange) → collect_set →
    * pair explode → distinct. */
  def vR18(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    val act = events
      .select($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("hr"))
      .distinct()
    val occ = act.groupBy($"event_type", $"hr")
      .agg(count(lit(1)).as("occ"))
    val cap = occ.agg(coalesce(sum($"occ"), lit(0L)).as("n"))
      .select(graft.dedup.Dedup.capCol($"n").as("bkt_cap"))
    val kept = occ.crossJoin(broadcast(cap))
      .filter($"occ" <= $"bkt_cap")
      .select($"event_type", $"hr")
    act.join(kept, Seq("event_type", "hr"))
      .groupBy($"event_type", $"hr")
      .agg(sort_array(collect_set($"user_id")).as("us"))
      .select(explode(expr(
        """flatten(transform(us, (x, i) ->
          |  transform(slice(us, i + 2, size(us) - i - 1),
          |    y -> named_struct('a', x, 'b', y))))""".stripMargin))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b")).distinct()
  }

  /** r19 candidate: ONE explicit exchange keyed (event_type, hr)
    * up front; distinct, occupancy counts, under-cap join and the
    * collect_set group-by all satisfy their distributions from it
    * (partitioning exprs ⊆ every downstream clustering), so the only
    * other act-scale exchange left is the final pair distinct. */
  def vFused(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    val act = events
      .select($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("hr"))
      .repartition(graft.ops.Width.scaled(events, 64L << 10),
        $"event_type", $"hr")
      .dropDuplicates("user_id", "event_type", "hr")
    val occ = act.groupBy($"event_type", $"hr")
      .agg(count(lit(1)).as("occ"))
    val cap = occ.agg(coalesce(sum($"occ"), lit(0L)).as("n"))
      .select(graft.dedup.Dedup.capCol($"n").as("bkt_cap"))
    val kept = occ.crossJoin(broadcast(cap))
      .filter($"occ" <= $"bkt_cap")
      .select($"event_type", $"hr")
    act.join(kept, Seq("event_type", "hr"))
      .groupBy($"event_type", $"hr")
      .agg(sort_array(collect_set($"user_id")).as("us"))
      .select(explode(expr(
        """flatten(transform(us, (x, i) ->
          |  transform(slice(us, i + 2, size(us) - i - 1),
          |    y -> named_struct('a', x, 'b', y))))""".stripMargin))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b")).distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.events(spark, sfDir)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "r17" -> (() => vR17(spark, events)),
      "r18" -> (() => vR18(spark, events)),
      "now" -> (() => vNow(spark, events)),
      "fused" -> (() => vFused(spark, events)))
    // committed plan evidence: the DERIVATION's own plan (not a
    // post-checkpoint consumer — the r18 verdict's comparability gap)
    new java.io.File("plans/r19").mkdirs()
    variants.foreach { case (n, f) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r19/coactivity_und_$n.txt"),
        f().queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    // equivalence first: identical edge SETS, not just counts
    val counts = variants.map { case (n, f) => n -> f().count() }
    println(s"edge counts: $counts")
    require(counts.map(_._2).distinct.size == 1,
      s"edge counts diverge: $counts")
    val diff = vFused(spark, events).exceptAll(vNow(spark, events))
      .count() + vNow(spark, events).exceptAll(vFused(spark, events))
      .count()
    require(diff == 0, s"fused vs now edge sets differ by $diff rows")
    println("edge sets identical (fused vs now)")
    val times = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val rng = new scala.util.Random(42)
    for (r <- 1 to reps; (n, f) <- rng.shuffle(variants)) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times.getOrElseUpdate(n,
        scala.collection.mutable.ArrayBuffer[Double]()) += dt
      System.err.println(f"[ab] rep $r $n%-6s $dt%.3fs")
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"$n%-6s min=${ts.min}%.3f " +
        f"med=${ts.sorted.apply(ts.size / 2)}%.3f " +
        ts.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
