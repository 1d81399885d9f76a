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

  /** Build-once (per session catalog) registry of the three bucketed
    * serving tables for a data dir: the objects view bucketed by `_id`,
    * its dynamic-field children bucketed by `owner`, and the kept change
    * rows bucketed by `_id`. In deployment the ingest pipeline MAINTAINS
    * these (BucketStore's hash-bucket layout is the streaming twin of this
    * catalog shape); in Verify/Bench the first query to need them pays the
    * one-time build — ingest-side cost, not per-query cost. Returns
    * (objectsTable, childrenTable, changesTable). */
  def ensureServingTables(spark: SparkSession, dir: String,
      objects: => DataFrame, changes: => DataFrame,
      buckets: Int = DefaultBuckets): (String, String, String) = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val objT = s"g_objects_$tag"
    val chdT = s"g_children_$tag"
    val chgT = s"g_changes_$tag"
    if (!spark.catalog.tableExists(objT)) {
      dropStaleLocation(spark, objT)
      saveObjectsBucketed(objects, objT, buckets)
    }
    if (!spark.catalog.tableExists(chdT)) {
      dropStaleLocation(spark, chdT)
      saveChildrenBucketed(objects.filter(QuerySurface.dynamicFieldChildFilter), chdT, buckets)
    }
    if (!spark.catalog.tableExists(chgT)) {
      dropStaleLocation(spark, chgT)
      saveObjectsBucketed(changes, chgT, buckets)
    }
    (objT, chdT, chgT)
  }

  /** A table absent from this session's (in-memory) catalog may still have
    * a leftover warehouse directory from a previous JVM — saveAsTable's
    * CREATE path refuses to write over it, so clear it first. */
  private def dropStaleLocation(spark: SparkSession, table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }
}
