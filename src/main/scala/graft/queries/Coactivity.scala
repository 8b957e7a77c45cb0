package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE co-activity graph — the single derivation every `g_*` query
  * (triangle count, PageRank, k-core, link prediction) builds on:
  * users joined when they share an (event_type, minute) bucket,
  * oriented a < b, distinct to kill bucket multiplicity. One Scala
  * builder + one SQL prefix so the graph definition cannot silently
  * fork between queries: each engine is self-consistent per query, so
  * a divergence here would KEEP every per-query oracle green while
  * the "co-activity graph" quietly meant different graphs — exactly
  * the failure mode sharing removes.
  */
private[queries] object Coactivity {

  /** Undirected edge list `(a, b)`, a < b, distinct. NOT
    * checkpointed — consumers that traverse it more than once
    * materialize it themselves (or via ops that do). */
  def und(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val act = Tables.events(s, d)
      .select($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("hr"))
      .distinct()
    val a2 = act.select($"user_id".as("u2"), $"event_type", $"hr")
    act.join(a2,
        act("event_type") === a2("event_type") &&
          act("hr") === a2("hr") && act("user_id") < $"u2")
      .select($"user_id".as("a"), $"u2".as("b")).distinct()
  }

  /** DuckDB CTE prefix replaying [[und]]: `act` + `und`. `und` is
    * MATERIALIZED — every consumer references it at least twice, and
    * DuckDB's CTE inlining would otherwise re-derive the bucket
    * self-join per reference. */
  val sqlUnd: String =
    """act AS (
      |  SELECT DISTINCT user_id, event_type,
      |    date_trunc('minute', ts) AS hr
      |  FROM events),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT l.user_id AS a, r.user_id AS b
      |  FROM act l JOIN act r
      |    ON l.event_type = r.event_type AND l.hr = r.hr
      |      AND l.user_id < r.user_id)""".stripMargin

  /** The bidirectional form as an additional CTE (append after
    * [[sqlUnd]]): each undirected edge as two directed rows. */
  val sqlBi: String =
    """bi AS MATERIALIZED (
      |  SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b, a FROM und)""".stripMargin
}
