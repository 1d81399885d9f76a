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
    * written as the serving state. Rebuild resets the cells to a single
    * `batch=build-0` dir.
    *
    * Crash-safe by STAGING: the complete new tree (centroids + cells +
    * cellstats) is written under sibling `.rebuilding` dirs while the
    * live index stays untouched and readable (the canonical rebuild
    * feeds this very index's admitted corpus back in, so the old files
    * must survive until the staged tree is complete), then each side is
    * swapped in with [[IndexSides.compact]]'s rename-pair/`.old`
    * protocol. No crash point leaves an empty index: a death during
    * staging leaves the live tree untouched; a death mid-swap leaves
    * every side readable via its `.old` fallback, and the worst window
    * (between side flips) serves a mixed old/new tree — degraded recall,
    * never false admissions of the whole batch — healed by rerunning
    * build(). Cells flip BEFORE centroids so the old, self-consistent
    * (centroids, cells) pair stays live as long as possible. */
  def build(spark: SparkSession, indexDir: String, corpus: DataFrame,
      nCells: Int = 16, iterations: Int = 2): Unit = {
    val idx = SimilarityOps.ivfBuild(corpus, nCells, iterations)
    import spark.implicits._
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sides = Seq("cells", "cellstats", "centroids")
    sides.foreach(s => fs.delete(new Path(s"$indexDir/$s.rebuilding"), true))
    val assigned = idx.cells
      .select(col("vec_id"), col("cell"), col("embedding")).persist()
    assigned.write.parquet(s"$indexDir/cells.rebuilding/batch=build-0")
    assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .write.parquet(s"$indexDir/cellstats.rebuilding/batch=build-0")
    idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "c")
      .coalesce(1).write.parquet(s"$indexDir/centroids.rebuilding")
    assigned.unpersist(blocking = false)
    sides.foreach { s =>
      val cur = new Path(s"$indexDir/$s")
      val old = new Path(s"$indexDir/$s.old")
      val tmp = new Path(s"$indexDir/$s.rebuilding")
      if (!fs.exists(cur) && fs.exists(old)) fs.rename(old, cur) // heal
      fs.delete(old, true)
      if (fs.exists(cur)) fs.rename(cur, old)
      fs.rename(tmp, cur)
      fs.delete(old, true)
    }
  }

  private val CentroidSchema = StructType(Seq(
    StructField("cell", IntegerType),
    StructField("c", ArrayType(DoubleType))))

  /** The frozen centroid matrix — K×dim doubles, a bytes-sized plan
    * parameter (the same collect class as the scan bounds / skip lists
    * elsewhere in the repo). Reads through [[IndexSides.readSide]] so a
    * crash inside build()'s rename pair falls back to `.old` — the
    * serving centroids are never absent mid-swap. */
  def centroids(spark: SparkSession, indexDir: String): Array[Array[Double]] = {
    val rows = IndexSides
      .readSide(spark, s"$indexDir/centroids", CentroidSchema)
      .orderBy("cell")
      .collect()
    require(rows.nonEmpty, s"no centroids at $indexDir/centroids — run build() first")
    rows.map(_.getSeq[Double](1).toArray)
  }

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
      outDir: String, threshold: Double, lineage: String = "batch",
      maxCell: Int = 256): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // trailing empty trigger: no state change
    val cents = centroids(spark, indexDir)
    val key = s"batch=$lineage-$batchId"
    val batchTag = key.stripPrefix("batch=")
    // The screen's corpus reads EXCLUDE the batch's own dir (the same
    // partition-pruned exclusion the prior probe below uses): a
    // same-lineage replay would otherwise see its previous append — the
    // identity pairs are dropped by the id_a <> id_b filter, but the
    // maxCell rail's combined counts would double-count the previously
    // kept vectors, flipping a cell that was under the cap on the
    // original run over it on replay and ADMITTING previously-rejected
    // dups. Excluding the key makes replay read exactly the original
    // run's corpus. Materialize before any write all the same (the plan
    // lazily reads the dirs this batch overwrites).
    val corpusExcl = IndexSides.readSide(spark, s"$indexDir/cells", CellSchema)
      .filter(col("batch") =!= batchTag).drop("batch")
    val statsExcl = IndexSides.readSide(spark, s"$indexDir/cellstats", CellStatsSchema)
      .filter(col("batch") =!= batchTag).drop("batch")
    val pairs = SimilarityOps.semanticScreen(
      IvfIndex(cents, corpusExcl), batch, threshold, maxCell,
      corpusCellStats = Some(statsExcl)).persist()
    pairs.count()
    // Never index a vec_id twice (the DedupStream probe discipline): a
    // re-ingest under a different lineage is not rejected by the pair
    // verdict. Broadcast semi-join on the (small) batch id set — the
    // corpus side is a one-column scan, bucket-pruned at deployment.
    val prior = IndexSides.readSide(spark, s"$indexDir/cells", CellSchema)
      .filter(col("batch") =!= batchTag)
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
      checkpointDir: String, threshold: Double = 0.9,
      maxCell: Int = 256): StreamingQuery = {
    val lineage = IndexSides.lineageOf(checkpointDir)
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, indexDir, outDir, threshold, lineage, maxCell)
      }
      .start()
  }
}
