package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.llm.DedupOps

/** Streaming incremental dedup — the online form of
  * [[graft.llm.DedupOps.incrementalNearDups]] (D5): each microbatch of
  * incoming documents is near-dup-checked against the maintained corpus
  * index, duplicates are rejected with a verdict row naming what they
  * matched, and the admitted survivors' bands + shingles are APPENDED to
  * the index. Per-batch cost is O(batch + matches), independent of corpus
  * size — the property that makes continuous dedup viable at 100 TB,
  * where re-running the batch pipeline per increment would re-shingle the
  * whole lake.
  *
  * On-disk state (all parquet, one immutable dir per batch —
  * `mode=overwrite` into a (lineage, batchId)-keyed dir makes replay of a
  * failed microbatch idempotent, the same recipe as the DLQ sink, while a
  * NEW checkpoint lineage restarting batch numbering at 0 cannot clobber
  * a previous lineage's admissions):
  * {{{
  * indexDir/shingles/batch=<lineage>-<id>/  (doc_id, sh_arr)   verify side
  * indexDir/bands/batch=<lineage>-<id>/     (doc_id, band, key) LSH side
  * outDir/kept/batch=<lineage>-<id>/        admitted documents (full rows)
  * outDir/dups/batch=<lineage>-<id>/        (id_a, id_b, jaccard) verdicts
  * }}}
  * At deployment scale `bands/` is bucketed by (band, key) so the
  * per-batch candidate join shuffles only the increment, and `shingles/`
  * by doc_id for the verify join; both then serve as ordinary tables.
  * Small-file accumulation (one dir per microbatch) is the standard
  * streaming-table concern with the standard answer: back the two sides
  * with a real table format (Delta/Iceberg) whose OPTIMIZE/rewrite
  * compaction runs out-of-band — the same swap seam as BucketStore's
  * MERGE INTO note, leaving the admission logic untouched. */
object DedupStream {

  private val ShingleSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("sh_arr", ArrayType(LongType))))
  private val BandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", StringType)))

  /** Read one side of the corpus index; an absent dir (first batch ever)
    * is an empty corpus, not an error. The probe goes through the Hadoop
    * FileSystem resolved from the session's hadoopConfiguration — a
    * java.nio check would answer false for an HDFS/S3 indexDir and
    * silently disable dedup on exactly the deployments this operator is
    * for. The `batch=` partition dir is surfaced as a column so callers
    * can exclude a replayed batch's own previous append; public readers
    * drop it. */
  private def readSide(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBatch = schema.add(StructField("batch", StringType))
    if (fs.exists(path))
      spark.read.schema(withBatch).parquet(dir)
        .select(withBatch.fieldNames.map(col): _*)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withBatch)
  }

  def corpusShingles(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"$indexDir/shingles", ShingleSchema).drop("batch")

  def corpusBands(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"$indexDir/bands", BandSchema).drop("batch")

  /** Lineage tag for idempotent per-batch dirs: batchIds restart from 0
    * whenever a stream begins a NEW checkpoint, so a bare `batch=<id>` key
    * would let a second lineage overwrite the first's admissions. Keyed by
    * the checkpoint location, the tag is stable across restarts of the
    * same stream (replay still overwrites its own dir idempotently) and
    * distinct for a new lineage. */
  private def lineageOf(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString

  /** One microbatch: verdict, admit, append. Public so batch backfills can
    * reuse the exact streaming admission logic (parity with the reference's
    * backfill-runs-the-livescan-path design). */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
      outDir: String, threshold: Double, lineage: String = "batch"): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // trailing empty trigger: no state change
    val batchSh = DedupOps.shingleArrays(batch)
    val pairs = DedupOps.incrementalNearDups(
      batchSh, corpusShingles(spark, indexDir), corpusBands(spark, indexDir),
      threshold).persist()
    // Force the verdicts NOW: `pairs` lazily reads the index dirs this
    // batch is about to append to — materializing before any write keeps
    // the read set consistent (a replayed batch, whose previous attempt
    // already appended, sees its own docs only via identity pairs, which
    // incrementalNearDups drops).
    pairs.count()
    val key = s"batch=$lineage-$batchId"
    // A doc_id already admitted by a PREVIOUS batch must never be indexed
    // (or kept) a second time: a re-ingest under a different lineage is
    // not rejected by the pair verdict (its only match is its own identity
    // pair), and a double-indexed doc corrupts future Jaccard verification
    // (duplicated shingle rows double-count n_inter). The batch's OWN dir
    // is excluded from the probe — partition pruning skips every other dir
    // — so a same-lineage replay still rewrites itself idempotently.
    // Probe = corpus ids ∩ batch ids via a broadcast semi-join on the
    // (small) batch id set — the corpus side contributes a one-column scan,
    // never a shuffle, and at deployment the doc_id-bucketed shingle table
    // prunes to the buckets the batch ids hash into.
    val priorIds = readSide(spark, s"$indexDir/shingles", ShingleSchema)
      .filter(col("batch") =!= key.stripPrefix("batch="))
      .select("doc_id")
      .join(broadcast(batchSh.select("doc_id")), Seq("doc_id"), "left_semi")
    val dupIds = pairs.select(col("id_b").as("doc_id")).distinct()
    val rejected = dupIds.unionByName(priorIds).distinct()
    val keptSh = batchSh.join(rejected, Seq("doc_id"), "left_anti").persist()
    keptSh.count()
    try {
      pairs.write.mode("overwrite").parquet(s"$outDir/dups/$key")
      batch.join(rejected, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/kept/$key")
      keptSh.write.mode("overwrite").parquet(s"$indexDir/shingles/$key")
      DedupOps.bandIndex(DedupOps.signaturesFromShingleArrays(keptSh))
        .write.mode("overwrite").parquet(s"$indexDir/bands/$key")
    } finally {
      pairs.unpersist(blocking = false)
      keptSh.unpersist(blocking = false)
      // intermediate persists inside incrementalNearDups; safe here because
      // this pipeline owns the session's dedup work for the batch duration
      DedupOps.releaseCaches()
    }
  }

  /** Start the admission stream over a streaming (doc_id, text, …) frame. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.5): StreamingQuery = {
    val lineage = lineageOf(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, indexDir, outDir, threshold, lineage)
      }
      .start()
  }
}
