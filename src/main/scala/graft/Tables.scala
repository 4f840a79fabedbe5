package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Mirrors the reference's "bucket" concept (a project holding resource
  * frames — cf. reference src/helpers.py:109 `allocate_by_deployment`):
  * a directory of parquet tables is one bucket. All loads go through
  * here so filter pushdown + column pruning reach the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize events.ts to TimestampType regardless of how the
    * generator's parquet writer encoded it. Observed encodings across
    * driver testdata generations: TIMESTAMP(NANOS) (Spark reads it as
    * nanos-long under `nanosAsLong`; the data is µs-precision so the
    * DIV 1000 is lossless) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (Spark reads TIMESTAMP_NTZ; the generator writes naive UTC wall
    * clocks and the session timezone is UTC, so the cast re-labels the
    * same instant). Dispatching on the actual read schema keeps both
    * generations loadable with identical downstream values.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // the int64 branch GUARDS its nanos assumption: a generation
      // writing plain int64 MICROS (no logical type) would otherwise be
      // silently divided by 1000, shifting every timestamp 1000×. Any
      // plausible event time is ≥ 1e17 as nanos (≈ 1973) while micros
      // magnitudes sit ≈ 1e15 — reject, never guess. Row-local codegen
      // comparison; no extra job at load time.
      case LongType => df.withColumn("ts", expr(
        "timestamp_micros(CASE WHEN ts IS NULL OR ts >= 100000000000000000 " +
          "THEN ts DIV 1000 ELSE raise_error(concat('events.ts: int64 value ', " +
          "CAST(ts AS STRING), ' is too small to be nanos-since-epoch — refusing " +
          "to guess the encoding (plain int64 micros must be rejected, not " +
          "divided)')) END)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported parquet encoding $other")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
