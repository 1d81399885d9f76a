package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_millis}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType, TimestampNTZType, TimestampType}

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
    * returned; this is the Spark analog at the scan seam.
    *
    * The returned Column is BOUND to `df`'s own `ts` attribute, so it
    * stays unambiguous on a frame later joined against another ts-carrying
    * table, and it can never silently apply one encoding's conversion to
    * another frame's differently-typed ts.
    *
    * Pre-1970 caveat: the two encodings would round NEGATIVE instants
    * differently (the nanos-long branch truncates toward zero,
    * `unix_millis` floors). The seam assumes post-1970 data — ContractSpec
    * pins the live testdata to the 2000..2100 epoch range, where every
    * branch agrees. */
  def tsMillis(df: DataFrame): Column =
    tsMillisOf(df.schema("ts").dataType, df("ts"))

  /** Unbound form for callers that hold only the DataType; the returned
    * Column references a bare `ts` and must be applied to the same
    * single-ts frame the type was inspected from. */
  def tsMillisOf(dt: DataType): Column = tsMillisOf(dt, col("ts"))

  def tsMillisOf(dt: DataType, ts: Column): Column = dt match {
    // TIMESTAMP(NANOS) read as nanos-long (legacy.parquet.nanosAsLong).
    // nanos→millis must be INTEGER division: `floor(ts / 1e6)` would round
    // ts through a 53-bit double mantissa first (late-epoch nanos exceed
    // 2^53, so the quotient could land on the wrong milli). The decimal
    // domain holds any long exactly, the division result carries the full
    // 6 fractional digits, and decimal→long casts truncate toward zero —
    // bit-identical to the SQL `ts div 1000000` this replaces (the Column
    // form exists so the result can bind to a specific frame's attribute).
    case LongType =>
      ts.cast(DecimalType(20, 0)).divide(lit(1000000L)).cast(LongType)
    // timestamp[us] without tz → TIMESTAMP_NTZ; interpret the wall-clock as
    // UTC (session tz is pinned to UTC in every entry point) to match
    // DuckDB's epoch_ms on the same naive value
    case TimestampNTZType => unix_millis(ts.cast(TimestampType))
    case TimestampType => unix_millis(ts)
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
