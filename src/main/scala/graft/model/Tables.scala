package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // Testdata timestamps are parquet TIMESTAMP(NANOS), which Spark refuses
    // by default; read them as nanosecond longs (the engine standardizes on
    // epoch-millis columns anyway — see tsMillis).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch-millis from a nanos-long `ts` column (matches DuckDB
    * `epoch_ms(ts)` on the same data). */
  def tsMillis: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("ts div 1000000")

  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
}
