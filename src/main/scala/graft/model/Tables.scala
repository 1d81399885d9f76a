package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_millis}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All engine inputs come through here so the scan layer is one place:
  * parquet → columnar vectorized read with predicate pushdown and column
  * pruning supplied by Catalyst. At 100 TB these would be partitioned /
  * bucketed tables behind a catalog; the loaders keep that substitution to a
  * one-line change.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Some testdata generations write parquet TIMESTAMP(NANOS), which Spark
    // refuses by default; allow it as nanosecond longs. The engine never
    // depends on one physical clock encoding — see tsMillis, which resolves
    // epoch-millis from the actual loaded DataType.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch-millis from the `ts` column, adaptive to its physical encoding
    * (matches DuckDB `epoch_ms(ts)` on the same data under a UTC session).
    * The reference never pins a clock encoding either — it normalizes to
    * epoch-millis at ingest (main/src/etl.rs:59-60), whatever the RPC
    * returned; this is the Spark analog at the scan seam. */
  def tsMillis(df: DataFrame): Column = tsMillisOf(df.schema("ts").dataType)

  def tsMillisOf(dt: DataType): Column = dt match {
    // TIMESTAMP(NANOS) read as nanos-long (legacy.parquet.nanosAsLong)
    case LongType => expr("ts div 1000000")
    // timestamp[us] without tz → TIMESTAMP_NTZ; interpret the wall-clock as
    // UTC (session tz is pinned to UTC in every entry point) to match
    // DuckDB's epoch_ms on the same naive value
    case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
    case TimestampType => unix_millis(col("ts"))
    case other => throw new IllegalArgumentException(
      s"unsupported physical encoding for ts: $other")
  }

  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
}
