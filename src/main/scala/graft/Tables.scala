package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness star schema (TESTDATA.md). One parquet file per
  * table under `sfDir`. All reads are lazy scans — Catalyst pushes filters
  * and prunes columns down to the parquet reader, so callers should never
  * pre-materialize these.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // ICU-backed case mapping for UTF8_BINARY strings is pathologically slow
    // in this runtime (profiled: ~77ms per lower() call — ICU break-iterator
    // re-init per row). JVM case mapping is identical for this corpus and
    // what DuckDB's lower() does for ASCII.
    spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and as naive TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ) in
    * others. Both are normalized here to a session-UTC instant
    * `TimestampType` column: nanos are read as a long (`nanosAsLong`, set
    * here so the loader works under any session) and truncated to micros;
    * NTZ is cast, which under the UTC session timeZone every entry point
    * pins is a pure reinterpretation (identical microsecond values).
    * Downstream needs the LTZ type — `unix_micros` and streaming event-time
    * watermarks reject TIMESTAMP_NTZ outright. DuckDB reads either file
    * natively as naive TIMESTAMP with the same wall-clock values, so the
    * engines stay value-identical.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(eventsRaw(s, d))

  /** The events table as stored: `ts` stays a nanosecond long. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division — `/` on longs is double division, whose 256 ns
        // ulp at epoch-nanosecond magnitudes would corrupt the microsecond
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
