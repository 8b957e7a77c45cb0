package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the co-activity hot-bucket guard (planted flash-crowd
  * minute dropped, under-cap buckets untouched, breach observable),
  * norm-augmented MIPS through the IVF serving path, cross-doc
  * winnowing overlap pairs, and the interval-join width derivation.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:30")
  private val t1 = java.sql.Timestamp.valueOf("2024-03-01 13:10:30")
  private val t2 = java.sql.Timestamp.valueOf("2024-03-01 14:20:30")

  /** Synthetic events: `hot` users in ONE (click, 12:00) minute plus
    * two 2-user control buckets. act rows = hot + 4; the derived cap
    * bottoms out at 64 for any corpus under 2^8 rows. */
  private def eventsWithHotMinute(hot: Int) = {
    val hotRows = (0 until hot).map(u => (u.toLong, "click", t0))
    val normal = Seq((100L, "view", t1), (101L, "view", t1),
      (102L, "view", t2), (103L, "view", t2))
    (hotRows ++ normal).toDF("user_id", "event_type", "ts")
  }

  test("coactivity hot-bucket guard: a flash-crowd minute over the " +
      "derived cap emits ZERO edges; under-cap buckets are untouched") {
    // 70 hot users, act = 74 rows -> cap = max(64, 8*bitlen(75)) = 64:
    // the hot bucket (70 > 64) is dropped, controls survive
    val edges = graft.queries.Coactivity
      .undFromEvents(spark, eventsWithHotMinute(70))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((100L, 101L), (102L, 103L)),
      s"hot-minute edges must be dropped, controls kept: $edges")
    // 40 hot users, act = 44 -> cap = 64: under the cap, the same
    // bucket emits its full clique — the guard is a cap, not a filter
    val under = graft.queries.Coactivity
      .undFromEvents(spark, eventsWithHotMinute(40))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(under.size == 40 * 39 / 2 + 2,
      s"under-cap bucket must keep its clique: ${under.size}")
  }

  test("coactivity guard is observable: coactivity_cap metrics " +
      "(max_bucket, over_cap_rows) arrive via the standard listener") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.get("coactivity_cap").foreach { row =>
          captured.add((row.getAs[Long]("max_bucket"),
            row.getAs[Long]("over_cap_rows")))
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.queries.Coactivity
        .undFromEvents(spark, eventsWithHotMinute(70)).count()
      def found: Boolean = {
        var ok = false
        captured.forEach { case (maxBucket, overCap) =>
          if (maxBucket == 70L && overCap == 70L) ok = true
        }
        ok
      }
      val deadline = System.currentTimeMillis() + 20000
      while (!found && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(found, s"expected (max_bucket=70, over_cap_rows=70), " +
        s"got $captured")
    } finally spark.listenerManager.unregister(listener)
  }

  test("coactivity guard: a pair sharing BOTH a hot and an under-cap " +
      "bucket still surfaces (multi-band semantics, no lost signal)") {
    // users 0 and 1 are in the 70-user hot minute AND a private bucket
    val ev = eventsWithHotMinute(70)
      .unionByName(Seq((0L, "purchase", t1), (1L, "purchase", t1))
        .toDF("user_id", "event_type", "ts"))
    val edges = graft.queries.Coactivity.undFromEvents(spark, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((0L, 1L)),
      s"pair with an under-cap co-occurrence must survive: $edges")
    assert(!edges.contains((2L, 3L)),
      "hot-only pairs must stay dropped")
  }
}
