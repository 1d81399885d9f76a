package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.llm.SimilarityOps
import graft.llm.SimilarityOps.{IvfIndex, IvfPqIndex, PqIndex}

/** Streaming EMBEDDING admission — the vector-tier analog of
  * [[DedupStream]] (e5b ∘ e7 as a service): each microbatch of incoming
  * vectors is assigned to the served IVF index's FROZEN centroids (one
  * narrow map — FAISS-style `add`, never a recluster), semantically
  * screened against the corpus cells (within-cell cosine pairs only —
  * [[SimilarityOps.semanticScreen]]), and the admitted survivors are
  * APPENDED to the cell table, plus ENCODED on the frozen PQ codebooks
  * (the e11b/e12 serving artifacts — codes are the e5b `add` discipline
  * applied to compression: only [[build]] ever re-trains codebooks).
  * Per-batch cost is O(batch · avg-cell + batch²-within-cell),
  * independent of corpus size — the corpus is never rescored against
  * itself.
  *
  * On-disk state — a GENERATION TREE whose five sides are published
  * together by ONE atomic directory rename (the BucketStore
  * all-or-nothing manifest discipline applied to the rebuild seam):
  * {{{
  * indexDir/tree-<g>/centroids/           (cell, c: array<double>)
  * indexDir/tree-<g>/codebooks/           (s, cell, c: array<double>) —
  *                                PQ codebooks, frozen between builds
  * indexDir/tree-<g>/cells/batch=<lineage>-<id>/  (vec_id, cell, embedding)
  * indexDir/tree-<g>/cellstats/batch=<lineage>-<id>/ (cell, n) sum-partials —
  *                                the screen's maxCell rail, no corpus re-agg
  * indexDir/tree-<g>/codes/batch=<lineage>-<id>/ (vec_id, cell, codes) —
  *                                the coded corpus (e11b scan / e12 lists)
  * outDir/kept/batch=<lineage>-<id>/     admitted vectors (full rows)
  * outDir/dups/batch=<lineage>-<id>/     (id_a, id_b, cos) verdicts
  * outDir/metrics/batch=<lineage>-<id>/  one admission-accounting row,
  *                                incl. the batch's e9 drift reading
  * }}}
  * Readers resolve the HIGHEST-generation `tree-<g>` dir; because a tree
  * becomes visible only via the atomic rename of its fully-staged
  * `.staging-<g>` sibling, the resolved tree is always complete and
  * self-consistent — there is no window in which new cells are served
  * against old centroids or stale cell stats (the per-side-swap design
  * this replaces had exactly that mixed-tree window). At deployment
  * `cells/` and `codes/` are cell-partitioned so the screen join prunes
  * to the batch's probed cells and an append writes only touched
  * partitions. Centroid drift under sustained appends is observable per
  * batch (the metrics row carries the increment's mean cos-to-centroid,
  * [[SimilarityOps.ivfDriftStats]]' statistic) and the documented
  * response is a periodic offline [[build]] — the same out-of-band
  * rebuild discipline as the text index's compaction. Single-writer
  * discipline throughout: build/compact run between microbatches. */
object VectorStream {

  private val CellSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cell", IntegerType),
    StructField("embedding", ArrayType(FloatType))))
  private val CellStatsSchema = StructType(Seq(
    StructField("cell", IntegerType), StructField("n", LongType)))
  private val CodesSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cell", IntegerType),
    StructField("codes", ArrayType(IntegerType))))
  private val CentroidSchema = StructType(Seq(
    StructField("cell", IntegerType),
    StructField("c", ArrayType(DoubleType))))
  private val CodebookSchema = StructType(Seq(
    StructField("s", IntegerType),
    StructField("cell", IntegerType),
    StructField("c", ArrayType(DoubleType))))

  /** The five tree members; also the flat legacy side names a
    * pre-generation layout keeps at `indexDir` until the second
    * publication reclaims them ([[IndexSides.publishTree]] retention). */
  private val SideNames =
    Seq("cells", "cellstats", "centroids", "codebooks", "codes")

  /** The live serving tree: the highest-generation `tree-<g>` dir (always
    * complete — publication is atomic), falling back to `indexDir` itself
    * for pre-generation flat layouts (readable; the next build or
    * compaction migrates them). Public so tests and operational tooling
    * can address the live sides directly. */
  def liveRoot(spark: SparkSession, indexDir: String): String =
    IndexSides.liveRoot(spark, indexDir)

  /** Build (or REBUILD) the served index from a corpus: Lloyd passes via
    * [[SimilarityOps.ivfBuild]] for the coarse cells and
    * [[SimilarityOps.pqBuild]] for the PQ codebooks, all five sides
    * written as one serving tree.
    *
    * Crash-safe by STAGING + ATOMIC PUBLICATION: the complete new tree
    * (centroids, codebooks, cells, cellstats, codes) is written under a
    * `.staging-<g>` sibling while the live tree stays untouched and
    * readable (the canonical rebuild feeds this very index's admitted
    * corpus back in, so the old files must survive until the staged tree
    * is complete), then ONE `fs.rename` — whose boolean result is
    * REQUIRED, Hadoop renames fail by returning false — publishes it as
    * `tree-<g>`. A death during staging leaves the live tree untouched
    * (readers resolve the previous generation; a rerun restages from
    * scratch); there is no mid-swap window because there is no
    * multi-step swap. Superseded trees, staging leftovers and (after one
    * further publication) pre-generation flat sides are GC'd by
    * [[IndexSides.publishTree]] under its one-generation retention
    * window (latest + previous kept), so a reader that resolved the old
    * tree — or the flat legacy layout — just before the rename finishes
    * its scan on intact files. Best-effort beyond one intervening
    * publication per read: a reader slower than a full rebuild cycle can
    * still lose its generation; a crash mid-GC only leaves reclaimable
    * orphans that resolution ignores. */
  def build(spark: SparkSession, indexDir: String, corpus: DataFrame,
      nCells: Int = 16, iterations: Int = 2,
      pqM: Int = 4, pqK: Int = 16): Unit = {
    val idx = SimilarityOps.ivfBuild(corpus, nCells, iterations)
    val pq = SimilarityOps.pqBuild(corpus, pqM, pqK, iterations)
    import spark.implicits._
    val assigned = idx.cells
      .select(col("vec_id"), col("cell"), col("embedding")).persist()
    try IndexSides.publishTree(spark, indexDir, legacyNames = SideNames) { staging =>
      assigned.write.parquet(s"$staging/cells/batch=build-0")
      assigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .write.parquet(s"$staging/cellstats/batch=build-0")
      SimilarityOps.pqEncode(assigned, pq.codebooks, carry = Seq("cell"))
        .select(col("vec_id"), col("cell"),
          array((pq.codebooks.indices).map(s => col(s"code_$s")): _*).as("codes"))
        .write.parquet(s"$staging/codes/batch=build-0")
      idx.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "c")
        .coalesce(1).write.parquet(s"$staging/centroids")
      pq.codebooks.zipWithIndex
        .flatMap { case (cb, s) => cb.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) } }
        .toDF("s", "cell", "c")
        .coalesce(1).write.parquet(s"$staging/codebooks")
    } finally assigned.unpersist(blocking = false)
  }

  /** The frozen centroid matrix — K×dim doubles, a bytes-sized plan
    * parameter (the same collect class as the scan bounds / skip lists
    * elsewhere in the repo). */
  def centroids(spark: SparkSession, indexDir: String): Array[Array[Double]] =
    centroidsAt(spark, liveRoot(spark, indexDir))

  private def centroidsAt(spark: SparkSession, root: String): Array[Array[Double]] = {
    val rows = IndexSides
      .readSide(spark, s"$root/centroids", CentroidSchema)
      .orderBy("cell")
      .collect()
    require(rows.nonEmpty, s"no centroids at $root/centroids — run build() first")
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** The frozen PQ codebooks — m·K×(dim/m) doubles, the same bytes-sized
    * plan-parameter class as the centroids. */
  def codebooks(spark: SparkSession, indexDir: String): Seq[Array[Array[Double]]] =
    codebooksAt(spark, liveRoot(spark, indexDir))

  private def codebooksAt(spark: SparkSession, root: String): Seq[Array[Array[Double]]] = {
    val rows = IndexSides
      .readSide(spark, s"$root/codebooks", CodebookSchema)
      .orderBy("s", "cell")
      .collect()
    require(rows.nonEmpty, s"no codebooks at $root/codebooks — run build() first")
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray)
  }

  def corpusCells(spark: SparkSession, indexDir: String): DataFrame =
    IndexSides.readSide(spark,
      s"${liveRoot(spark, indexDir)}/cells", CellSchema).drop("batch")

  /** The maintained (cell, n) cell-size side: sum-mergeable partials (K
    * rows per admitted batch — the same discipline as DedupStream's
    * (kh, df) seed stats) so the screen's maxCell rail reads maintained
    * counts instead of aggregating the corpus cells table per batch. */
  def corpusCellStats(spark: SparkSession, indexDir: String): DataFrame =
    IndexSides.readSide(spark,
      s"${liveRoot(spark, indexDir)}/cellstats", CellStatsSchema).drop("batch")

  private def codesAt(spark: SparkSession, root: String, m: Int,
      withCell: Boolean): DataFrame = {
    val raw = IndexSides.readSide(spark, s"$root/codes", CodesSchema).drop("batch")
    val codeCols = (0 until m).map(s => raw("codes")(s).as(s"code_$s"))
    raw.select((col("vec_id") +: (if (withCell) Seq(col("cell")) else Nil)) ++
      codeCols: _*)
  }

  /** The semantic screen served ENTIRELY from maintained state: frozen
    * centroids + corpus cells + cell-size stats (nothing corpus-sized is
    * aggregated — the cells table is only joined on `cell`). */
  def screen(spark: SparkSession, indexDir: String, newVectors: DataFrame,
      threshold: Double, maxCell: Int = 256): DataFrame =
    screenAt(spark, liveRoot(spark, indexDir), newVectors, threshold,
      maxCell, excludeTag = None)

  /** [[screen]] with one `batch=<tag>` dir excluded from the corpus
    * reads — [[admitBatch]]'s replay discipline, shared with the
    * dual-tier [[CurationStream]] pre-commit verdict (see
    * [[DedupStream.sideExcluding]] for the rationale; compaction carries
    * the latest per-lineage dir, so the tag stays addressable). */
  private[streaming] def screenExcluding(spark: SparkSession, indexDir: String,
      newVectors: DataFrame, threshold: Double, maxCell: Int,
      tag: String): DataFrame =
    screenAt(spark, liveRoot(spark, indexDir), newVectors, threshold,
      maxCell, excludeTag = Some(tag))

  /** The one screen definition: root resolved by the CALLER (once per
    * logical operation — the mixed-tree guard), corpus cells + stats read
    * under it with an optional batch-dir exclusion. */
  private def screenAt(spark: SparkSession, root: String,
      newVectors: DataFrame, threshold: Double, maxCell: Int,
      excludeTag: Option[String]): DataFrame = {
    def excl(df: DataFrame): DataFrame =
      excludeTag.fold(df)(t => df.filter(col("batch") =!= t)).drop("batch")
    SimilarityOps.semanticScreen(
      IvfIndex(centroidsAt(spark, root),
        excl(IndexSides.readSide(spark, s"$root/cells", CellSchema))),
      newVectors, threshold, maxCell,
      corpusCellStats = Some(
        excl(IndexSides.readSide(spark, s"$root/cellstats", CellStatsSchema))))
  }

  /** D8b served from maintained state (the [[screen]] discipline applied
    * to benchmark decontamination): benchmark vectors probe their nProbe
    * nearest cells of the frozen centroids, and the maxCell rail reads
    * the maintained (cell, n) stats side — nothing corpus-sized is
    * aggregated per benchmark arrival. */
  def decontaminate(spark: SparkSession, indexDir: String,
      benchVectors: DataFrame, threshold: Double, nProbe: Int = 2,
      maxCell: Int = 256): DataFrame = {
    val root = liveRoot(spark, indexDir)
    SimilarityOps.semanticContamination(
      IvfIndex(centroidsAt(spark, root),
        IndexSides.readSide(spark, s"$root/cells", CellSchema).drop("batch")),
      benchVectors, threshold, nProbe, maxCell,
      corpusCellStats = Some(IndexSides
        .readSide(spark, s"$root/cellstats", CellStatsSchema).drop("batch")))
  }

  /** The served index as an [[IvfIndex]] — every e-tier operator
    * (ivfQueryTopK, knnClassify, semanticDedup, clusterBalancedSample,
    * ivfDriftStats) runs unchanged over the stream-maintained state.
    * The live root is resolved ONCE for both sides — a rebuild publishing
    * between two separate resolutions could otherwise pair one tree's
    * centroids with another's cells (the mixed-tree read the generation
    * design exists to rule out). */
  def index(spark: SparkSession, indexDir: String): IvfIndex = {
    val root = liveRoot(spark, indexDir)
    IvfIndex(centroidsAt(spark, root),
      IndexSides.readSide(spark, s"$root/cells", CellSchema).drop("batch"))
  }

  /** E13c over the maintained index: filtered vector search with the
    * ADAPTIVE probe width, the corpus count read from the (cell, n)
    * STATS side — one sum over cell-count rows (bytes), never a pass
    * over the member table; the live root is resolved once for
    * centroids, cells and stats (the mixed-tree guard). */
  def filteredTopK(spark: SparkSession, indexDir: String,
      allowed: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 2,
      maxProbe: Int = Int.MaxValue): DataFrame = {
    val root = liveRoot(spark, indexDir)
    val total = IndexSides
      .readSide(spark, s"$root/cellstats", CellStatsSchema).drop("batch")
      .agg(sum("n")).head()
    SimilarityOps.ivfFilteredTopKAdaptive(
      IvfIndex(centroidsAt(spark, root),
        IndexSides.readSide(spark, s"$root/cells", CellSchema).drop("batch")),
      allowed, queries, k, nProbe, maxProbe,
      totalCount = Some(if (total.isNullAt(0)) 0L else total.getLong(0)))
  }

  /** The served PQ index (e11b's deployment form): frozen codebooks +
    * the stream-maintained coded corpus — [[SimilarityOps.pqTopK]] runs
    * unchanged over it, scanning codes only. */
  def pqIndex(spark: SparkSession, indexDir: String): PqIndex = {
    val root = liveRoot(spark, indexDir)
    val cbs = codebooksAt(spark, root)
    PqIndex(cbs, codesAt(spark, root, cbs.size, withCell = false))
  }

  /** The served IVFADC index (e12's deployment form): coarse centroids +
    * frozen codebooks + the coded cells side — codes carry their IVF
    * cell, so [[SimilarityOps.ivfAdcTopK]] probes and ADC-ranks the
    * stream-maintained state directly. */
  def ivfPqIndex(spark: SparkSession, indexDir: String): IvfPqIndex = {
    val root = liveRoot(spark, indexDir)
    val cbs = codebooksAt(spark, root)
    IvfPqIndex(centroidsAt(spark, root), cbs,
      codesAt(spark, root, cbs.size, withCell = true))
  }

  /** One microbatch: screen, admit, append (cells + stats + codes).
    * Public so batch backfills reuse the exact streaming admission logic
    * (the same backfill-runs-the-livescan-path parity as
    * [[DedupStream]]). */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
      outDir: String, threshold: Double, lineage: String = "batch",
      maxCell: Int = 256): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // trailing empty trigger: no state change
    val root = liveRoot(spark, indexDir)
    val cents = centroidsAt(spark, root)
    val cbs = codebooksAt(spark, root)
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
    val pairs = screenAt(spark, root, batch, threshold, maxCell,
      excludeTag = Some(batchTag)).persist()
    pairs.count()
    // Never index a vec_id twice (the DedupStream probe discipline): a
    // re-ingest under a different lineage is not rejected by the pair
    // verdict. Broadcast semi-join on the (small) batch id set — the
    // corpus side is a one-column scan, bucket-pruned at deployment.
    val prior = IndexSides.readSide(spark, s"$root/cells", CellSchema)
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
      keptAssigned.write.mode("overwrite").parquet(s"$root/cells/$key")
      // cell-size stats partial beside the cells (replay overwrites its
      // own partial — never double-counts), so the next batch's rail
      // reads maintained counts
      keptAssigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$root/cellstats/$key")
      // the coded-corpus partial: admitted vectors encoded on the FROZEN
      // codebooks (one narrow projection — build() alone re-trains), so
      // e11b/e12 serve the admitted corpus without touching embeddings
      SimilarityOps.pqEncode(keptAssigned, cbs, carry = Seq("cell"))
        .select(col("vec_id"), col("cell"),
          array(cbs.indices.map(s => col(s"code_$s")): _*).as("codes"))
        .write.mode("overwrite").parquet(s"$root/codes/$key")
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

  /** Fold the per-batch dirs into one consolidated dir per side (cells
    * and codes rows are not partials, cell-size stats re-aggregate to
    * one row per cell), published as a NEW generation tree by
    * [[IndexSides.compact]] — the frozen centroids/codebooks are carried
    * verbatim, the superseded tree is retained one publication for
    * in-flight readers, and the live tree's files are never touched
    * mid-protocol (same discipline as [[build]]'s rebuild seam). */
  /** The tier's sides + frozen extras — ONE definition shared by
    * [[compact]] and [[compactIfDue]] (the DedupStream discipline). */
  private def compactionSides: Seq[(String, StructType, DataFrame => DataFrame)] = Seq(
    ("cells", CellSchema, identity[DataFrame] _),
    ("cellstats", CellStatsSchema,
      (df: DataFrame) => df.groupBy("cell").agg(sum("n").as("n"))),
    ("codes", CodesSchema, identity[DataFrame] _))
  private val compactionExtras = Seq("centroids", "codebooks")

  def compact(spark: SparkSession, indexDir: String): Unit =
    IndexSides.compact(spark, indexDir, compactionSides, extras = compactionExtras)

  /** The cron seam: compact iff `policy` fires on this tier's sides —
    * same decision rule as [[DedupStream.compactIfDue]]. Returns whether
    * a compaction ran. */
  def compactIfDue(spark: SparkSession, indexDir: String,
      policy: CompactionPolicy = CompactionPolicy()): Boolean =
    IndexSides.compactIfDue(spark, indexDir, compactionSides,
      extras = compactionExtras, policy = policy)

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
