package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical layout of the objects store for cluster scale.
  *
  * The reference leans on MongoDB secondary indexes
  * (server/src/main.rs:532-590) for its read paths. The Spark-native
  * equivalent at 100 TB is table LAYOUT:
  *  - **bucket by `_id`**: the latest-wins MERGE (K1) and both
  *    dynamic-field joins (J1/J2: child.owner == parent._id) become
  *    shuffle-free — the store is already hash-partitioned on the join
  *    key, so Catalyst elides the Exchange on the bucketed side(s).
  *  - **partition by `type_package`**: the type-prefix read path (P5/P6)
  *    becomes partition pruning instead of a full scan; owner lookups ride
  *    on parquet min/max + dictionary filters within buckets.
  *
  * Bucketing goes through the catalog (`saveAsTable`) because bucket
  * metadata lives there; plain `.parquet()` writes cannot carry it.
  */
object StoreLayout {

  val DefaultBuckets = 32

  /** Write the objects table bucketed by `_id` (and sorted within buckets,
    * so merge-style reads are sequential). */
  def saveObjectsBucketed(
      df: DataFrame, table: String, buckets: Int = DefaultBuckets): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "_id")
      .sortBy("_id")
      .format("parquet")
      .saveAsTable(table)

  /** Write the dynamic-field children side bucketed by `owner` (the parent
    * id) with the same bucket count — J1/J2 then co-locate bucket-to-bucket
    * with no Exchange on either side. */
  def saveChildrenBucketed(
      df: DataFrame, table: String, buckets: Int = DefaultBuckets): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "owner")
      .sortBy("owner")
      .format("parquet")
      .saveAsTable(table)

  /** The J2 join on bucketed tables: parents bucketed by `_id`, children by
    * `owner`, same bucket count → both Exchanges elided (assert via
    * `.explain`/plan inspection; StoreLayoutSpec does). */
  def bucketedChildrenJoin(spark: SparkSession, parentsTable: String,
      childrenTable: String): DataFrame = {
    val parents = spark.table(parentsTable)
    val children = spark.table(childrenTable)
    parents.join(children, parents("_id") === children("owner"), "inner")
  }
}
