package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.llm.SimilarityOps
import graft.llm.SimilarityOps.IvfIndex

/** Streaming EMBEDDING admission — the vector-tier analog of
  * [[DedupStream]] (e5b ∘ e7 as a service): each microbatch of incoming
  * vectors is assigned to the served IVF index's FROZEN centroids (one
  * narrow map — FAISS-style `add`, never a recluster), semantically
  * screened against the corpus cells (within-cell cosine pairs only —
  * [[SimilarityOps.semanticScreen]]), and the admitted survivors are
  * APPENDED to the cell table. Per-batch cost is O(batch · avg-cell +
  * batch²-within-cell), independent of corpus size — the corpus is never
  * rescored against itself.
  *
  * On-disk state (same batch=-keyed idempotent-overwrite protocol as the
  * text index — [[IndexSides]]):
  * {{{
  * indexDir/centroids/            (cell, c: array<double>) — written by
  *                                build()/rebuild only; frozen between
  * indexDir/cells/batch=<lineage>-<id>/  (vec_id, cell, embedding)
  * indexDir/cellstats/batch=<lineage>-<id>/ (cell, n) sum-partials — the
  *                                screen's maxCell rail, no corpus re-agg
  * outDir/kept/batch=<lineage>-<id>/     admitted vectors (full rows)
  * outDir/dups/batch=<lineage>-<id>/     (id_a, id_b, cos) verdicts
  * outDir/metrics/batch=<lineage>-<id>/  one admission-accounting row,
  *                                incl. the batch's e9 drift reading
  * }}}
  * At deployment `cells/` is cell-partitioned so the screen join prunes
  * to the batch's probed cells and an append writes only touched
  * partitions. Centroid drift under sustained appends is observable per
  * batch (the metrics row carries the increment's mean cos-to-centroid,
  * [[SimilarityOps.ivfDriftStats]]' statistic) and the documented
  * response is a periodic offline [[build]] — the same out-of-band
  * rebuild discipline as the text index's compaction. */
object VectorStream {

  private val CellSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cell", IntegerType),
    StructField("embedding", ArrayType(FloatType))))
  private val CellStatsSchema = StructType(Seq(
    StructField("cell", IntegerType), StructField("n", LongType)))

  /** Build (or REBUILD) the served index from a corpus: Lloyd passes via
    * [[SimilarityOps.ivfBuild]], centroids + initial cell assignment
    * written as the serving state. Rebuild overwrites the centroids and
    * resets the cells to a single `batch=build-0` dir. */
  def build(spark: SparkSession, indexDir: String, corpus: DataFrame,
      nCells: Int = 16, iterations: Int = 2): Unit = {
    val idx = SimilarityOps.ivfBuild(corpus, nCells, iterations)
    import spark.implicits._
    idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    // Materialize the assignment BEFORE deleting the old cells tree: the
    // canonical rebuild feeds this very index's admitted corpus back in,
    // so the lazy frame may read from the files about to be deleted.
    val assigned = idx.cells
      .select(col("vec_id"), col("cell"), col("embedding")).persist()
    assigned.count()
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$indexDir/cells"), true)
    fs.delete(new Path(s"$indexDir/cellstats"), true)
    assigned.write.parquet(s"$indexDir/cells/batch=build-0")
    assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .write.parquet(s"$indexDir/cellstats/batch=build-0")
    assigned.unpersist(blocking = false)
  }

  /** The frozen centroid matrix — K×dim doubles, a bytes-sized plan
    * parameter (the same collect class as the scan bounds / skip lists
    * elsewhere in the repo). */
  def centroids(spark: SparkSession, indexDir: String): Array[Array[Double]] =
    spark.read.parquet(s"$indexDir/centroids")
      .orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)

  def corpusCells(spark: SparkSession, indexDir: String): DataFrame =
    IndexSides.readSide(spark, s"$indexDir/cells", CellSchema).drop("batch")

  /** The maintained (cell, n) cell-size side: sum-mergeable partials (K
    * rows per admitted batch — the same discipline as DedupStream's
    * (kh, df) seed stats) so the screen's maxCell rail reads maintained
    * counts instead of aggregating the corpus cells table per batch. */
  def corpusCellStats(spark: SparkSession, indexDir: String): DataFrame =
    IndexSides.readSide(spark, s"$indexDir/cellstats", CellStatsSchema).drop("batch")

  /** The semantic screen served ENTIRELY from maintained state: frozen
    * centroids + corpus cells + cell-size stats (nothing corpus-sized is
    * aggregated — the cells table is only joined on `cell`). */
  def screen(spark: SparkSession, indexDir: String, newVectors: DataFrame,
      threshold: Double, maxCell: Int = 256): DataFrame =
    SimilarityOps.semanticScreen(
      IvfIndex(centroids(spark, indexDir), corpusCells(spark, indexDir)),
      newVectors, threshold, maxCell,
      corpusCellStats = Some(corpusCellStats(spark, indexDir)))

  /** The served index as an [[IvfIndex]] — every e-tier operator
    * (ivfQueryTopK, knnClassify, semanticDedup, clusterBalancedSample,
    * ivfDriftStats) runs unchanged over the stream-maintained state. */
  def index(spark: SparkSession, indexDir: String): IvfIndex =
    IvfIndex(centroids(spark, indexDir), corpusCells(spark, indexDir))

  /** One microbatch: screen, admit, append. Public so batch backfills
    * reuse the exact streaming admission logic (the same
    * backfill-runs-the-livescan-path parity as [[DedupStream]]). */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
      outDir: String, threshold: Double, lineage: String = "batch"): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // trailing empty trigger: no state change
    val cents = centroids(spark, indexDir)
    val key = s"batch=$lineage-$batchId"
    // Materialize the verdicts BEFORE any write (the screen lazily reads
    // the cells dirs this batch is about to append to); a same-lineage
    // replay sees its own previous append only via identity pairs, which
    // the screen's id_a <> id_b filter drops. The maxCell rail reads the
    // maintained cell-size stats — no corpus aggregation per batch.
    val pairs = screen(spark, indexDir, batch, threshold).persist()
    pairs.count()
    // Never index a vec_id twice (the DedupStream probe discipline): a
    // re-ingest under a different lineage is not rejected by the pair
    // verdict. Broadcast semi-join on the (small) batch id set — the
    // corpus side is a one-column scan, bucket-pruned at deployment.
    val prior = IndexSides.readSide(spark, s"$indexDir/cells", CellSchema)
      .filter(col("batch") =!= key.stripPrefix("batch="))
      .select("vec_id")
      .join(broadcast(batch.select("vec_id")), Seq("vec_id"), "left_semi")
      .persist()
    val dupIds = pairs.select(col("id_b").as("vec_id")).distinct().persist()
    val rejected = dupIds.unionByName(prior).distinct()
    val kept = batch.join(rejected, Seq("vec_id"), "left_anti").persist()
    kept.count()
    val keptAssigned = SimilarityOps.ivfAssign(kept, cents)
      .select(col("vec_id"), col("cell"), col("embedding")).persist()
    try {
      pairs.write.mode("overwrite").parquet(s"$outDir/dups/$key")
      kept.write.mode("overwrite").parquet(s"$outDir/kept/$key")
      keptAssigned.write.mode("overwrite").parquet(s"$indexDir/cells/$key")
      // cell-size stats partial beside the cells (replay overwrites its
      // own partial — never double-counts), so the next batch's rail
      // reads maintained counts
      keptAssigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$indexDir/cellstats/$key")
      // Admission accounting + the per-batch e9 drift reading: the
      // increment's mean cos-to-assigned-centroid is THE rebuild dial,
      // so the service exports it with every batch (a drop across
      // batches = distribution shift = schedule an offline build()).
      val drift = SimilarityOps
        .ivfDriftStats(
          IvfIndex(cents, SimilarityOps.ivfAssign(batch.limit(0), cents)), batch)
        .filter(col("segment") === "increment")
        .select("mean_cos")
        .collect().headOption.map(_.getDouble(0))
      import spark.implicits._
      Seq((lineage, batchId, batch.count(), kept.count(), dupIds.count(),
          prior.count(), drift))
        .toDF("lineage", "batch_id", "n_in", "n_kept", "n_sem_rejected",
          "n_prior_known", "increment_mean_cos")
        .write.mode("overwrite").parquet(s"$outDir/metrics/$key")
    } finally {
      pairs.unpersist(blocking = false)
      prior.unpersist(blocking = false)
      dupIds.unpersist(blocking = false)
      kept.unpersist(blocking = false)
      keptAssigned.unpersist(blocking = false)
    }
  }

  /** Fold the per-batch dirs ([[IndexSides.compact]]'s write-then-flip;
    * cells rows are not partials, cell-size stats re-aggregate to one
    * row per cell). */
  def compact(spark: SparkSession, indexDir: String): Unit =
    IndexSides.compact(spark, indexDir, Seq(
      ("cells", CellSchema, identity[DataFrame] _),
      ("cellstats", CellStatsSchema,
        (df: DataFrame) => df.groupBy("cell").agg(sum("n").as("n")))))

  /** Per-batch admission accounting across the stream's whole history. */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    val path = new Path(s"$outDir/metrics")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no metrics at $outDir/metrics")
    spark.read.parquet(s"$outDir/metrics")
      .drop("batch").orderBy("lineage", "batch_id")
  }

  /** Start the admission stream over a streaming (vec_id, embedding)
    * frame. [[build]] must have been run once (the serving centroids). */
  def start(vectors: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.9): StreamingQuery = {
    val lineage = IndexSides.lineageOf(checkpointDir)
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, indexDir, outDir, threshold, lineage)
      }
      .start()
  }
}
