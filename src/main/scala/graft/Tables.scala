package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** `events.ts` is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    * timestamp type and rejects it outright, so it is read as a long
    * (`nanosAsLong`, set here so the loader works under any session) and
    * normalized to a microsecond TIMESTAMP_NTZ column. DuckDB reads the
    * same file natively as TIMESTAMP; truncating nanos → micros keeps the
    * engines value-identical (the generator's timestamps are second-grained
    * anyway).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(eventsRaw(s, d))

  /** The events table as stored: `ts` stays a nanosecond long. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  def normalizeEventsTs(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == LongType)
      // integer division — `/` on longs is double division, whose 256 ns
      // ulp at epoch-nanosecond magnitudes would corrupt the microsecond
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
