package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ObjectsModel

/** Bucketed, incrementally-merged objects store (K1/K2 physical layout).
  *
  * The round-4 layout rewrote the FULL store every microbatch
  * (generation dirs + atomic CURRENT flip) — crash-safe but O(store) per
  * merge: at a 100 TB store and a 1 s trigger that is 100 TB of rewrite
  * per second of wall-clock. This layout keeps the identical crash-safety
  * protocol (immutable data dirs + an atomically-renamed CURRENT pointer)
  * but scopes each merge to the hash buckets the batch actually touches,
  * the same move the reference gets from MongoDB's per-document upsert
  * (main/src/etl.rs:1249-1266 — each `$lt` guard touches one _id's doc):
  *
  * {{{
  * storeDir/
  *   CURRENT            # atomic pointer: name of the live manifest
  *   manifest-<n>       # immutable: "buckets=<B>" + one "<k> <relpath>" per bucket
  *   delta-<n>/_b=<k>/  # immutable parquet for bucket k, written by merge n
  * }}}
  *
  * A merge of batch rows touching `t` distinct buckets:
  *   1. reads ONLY those `t` bucket dirs (listed in the live manifest),
  *   2. latest-wins-merges them with the batch (one `_id` shuffle over
  *      touched data only — all rows of an _id share `pmod(hash(_id), B)`,
  *      so per-bucket merge == global merge),
  *   3. writes `delta-<n+1>/_b=<k>` for the touched buckets,
  *   4. writes `manifest-<n+1>` mapping touched buckets to the new delta
  *      and untouched buckets to their EXISTING dirs (whose files are not
  *      rewritten — byte-identical across the merge, StreamingSpec asserts),
  *   5. atomically flips CURRENT, then GCs with a ONE-MANIFEST RETENTION
  *      window: the previous manifest and every bucket dir it references
  *      stay intact through one further merge, so a reader that resolved
  *      CURRENT just before the flip finishes its scan on intact files —
  *      the same reader-on-previous discipline as the index tiers'
  *      generation trees ([[IndexSides.publishTree]]). Pre-migration
  *      layouts (gen-* dirs, legacy flat parquet) get the same window:
  *      reclaimed only once a previous manifest exists to retain.
  *
  * Cost per microbatch is therefore ∝ touched-bucket bytes, not store
  * bytes: with B sized so a bucket ≈ a few hundred MB (B ≈ 300k at
  * 100 TB), a trickle batch of k ids rewrites ≤ k buckets. A crash at any
  * step leaves CURRENT naming a complete manifest whose dirs are all
  * intact (data and manifest are written before the flip; GC runs after).
  *
  * This is still a named deployment seam: on a lakehouse, Delta/Iceberg
  * `MERGE INTO` replaces this file protocol one-for-one (their
  * manifest/snapshot machinery is this, industrialized, with file-level
  * rather than bucket-level scoping). The read/merge SIGNATURES are the
  * seam; the streaming tests pin the semantics any swap must keep.
  */
object BucketStore {

  /** Local-test default; production sizes B so a bucket ≈ 100–500 MB. */
  val DefaultBuckets = 32

  /** Bucket of a key: non-negative Murmur3 mod B. Deterministic for a
    * given Spark lineage; B is pinned per store in its manifest header. */
  private def bucketCol(key: String, b: Int) = pmod(hash(col(key)), lit(b)).cast("int")

  /** Default combine: the objects store's latest-wins MERGE. Stores with
    * other key/merge semantics (e.g. DedupStream's group assignments,
    * where the batch row simply supersedes by doc_id) pass their own. */
  private val latestWinsCombine: (DataFrame, DataFrame) => DataFrame =
    (cur, batch) => ObjectsModel.latestWins(cur.unionByName(batch))

  /** Upsert combine for stores whose batch rows carry the full new truth
    * for their key: batch wins, untouched current rows carry over. */
  def upsertCombine(key: String): (DataFrame, DataFrame) => DataFrame =
    (cur, batch) =>
      batch.unionByName(cur.join(batch.select(key), Seq(key), "left_anti"))

  final case class Manifest(n: Long, buckets: Int, entries: Map[Int, String])

  def currentPointer(storeDir: String): Option[String] = {
    val cur = Paths.get(storeDir, "CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim) else None
  }

  /** Pre-bucketed layouts: gen-pointer stores ("gen-<n>" CURRENT) and flat
    * parquet dirs (_SUCCESS, no CURRENT). Both stay readable and migrate
    * into the bucketed layout on their next merge. */
  private def legacyFlat(storeDir: String): Boolean =
    Files.exists(Paths.get(storeDir, "_SUCCESS"))

  /** True if any readable layout (bucketed, gen-pointer, or legacy flat)
    * is present. */
  def exists(storeDir: String): Boolean =
    currentPointer(storeDir).isDefined || legacyFlat(storeDir)

  private def readManifest(storeDir: String, name: String): Manifest = {
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(Paths.get(storeDir, name)).asScala.toList
    val b = lines.head.stripPrefix("buckets=").toInt
    val entries = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(k, p) = l.split(" ", 2); k.toInt -> p
    }.toMap
    Manifest(name.stripPrefix("manifest-").toLong, b, entries)
  }

  def read(spark: SparkSession, storeDir: String): DataFrame =
    currentPointer(storeDir) match {
      case Some(m) if m.startsWith("manifest-") =>
        val man = readManifest(storeDir, m)
        val paths = man.entries.values.toSeq.sorted.map(p => s"$storeDir/$p")
        if (paths.isEmpty) throw new IllegalStateException(s"empty store at $storeDir")
        spark.read.parquet(paths: _*)
      case Some(gen) => spark.read.parquet(s"$storeDir/$gen")
      case None if legacyFlat(storeDir) => spark.read.parquet(storeDir)
      case None => throw new IllegalStateException(s"no store at $storeDir")
    }

  /** Latest-wins MERGE of `batch` into the store, rewriting only the
    * buckets containing the batch's keys. Single-writer discipline (same
    * as the generation protocol it replaces): callers are the microbatch
    * loop and maintenance-window replay, never concurrent. */
  def merge(spark: SparkSession, storeDir: String, batch: DataFrame,
      numBuckets: Int = DefaultBuckets, key: String = "_id",
      combine: (DataFrame, DataFrame) => DataFrame = latestWinsCombine): Unit = {
    Files.createDirectories(Paths.get(storeDir))
    currentPointer(storeDir) match {
      case Some(m) if m.startsWith("manifest-") =>
        mergeIncremental(spark, storeDir, batch, readManifest(storeDir, m), key, combine)
      case Some(gen) => // one-time migration from the generation layout
        rewriteAll(spark, storeDir, spark.read.parquet(s"$storeDir/$gen"), batch, numBuckets, 0L, key, combine)
      case None if legacyFlat(storeDir) => // one-time migration from flat parquet
        rewriteAll(spark, storeDir, spark.read.parquet(storeDir), batch, numBuckets, 0L, key, combine)
      case None => // store creation
        rewriteAll(spark, storeDir, batch.limit(0), batch, numBuckets, 0L, key, combine)
    }
  }

  private def mergeIncremental(spark: SparkSession, storeDir: String,
      batch: DataFrame, man: Manifest, key: String,
      combine: (DataFrame, DataFrame) => DataFrame): Unit = {
    // Touched-bucket ids: ≤ B ints — a bytes-sized plan parameter, same
    // class as the skip-list and centroid collects elsewhere in the repo.
    val touched = batch.select(bucketCol(key, man.buckets).as("_b"))
      .distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return // empty batch: the store is already correct
    val curPaths = touched.toSeq.sorted.flatMap(man.entries.get).map(p => s"$storeDir/$p")
    val cur = if (curPaths.nonEmpty) spark.read.parquet(curPaths: _*) else batch.limit(0)
    writeAndFlip(spark, storeDir, combine(cur, batch), man.buckets, man.n + 1,
      man.entries, key)
  }

  private def rewriteAll(spark: SparkSession, storeDir: String, cur: DataFrame,
      batch: DataFrame, numBuckets: Int, n: Long, key: String,
      combine: (DataFrame, DataFrame) => DataFrame): Unit =
    writeAndFlip(spark, storeDir, combine(cur, batch), numBuckets, n, Map.empty, key)

  /** Write merged rows as `delta-<n>/_b=<k>`, publish `manifest-<n>`
    * (touched buckets → the new delta; the rest carried over), flip
    * CURRENT atomically, GC. `repartition(_b)` gives one file per bucket
    * per merge; partitionBy strips `_b` from the data files so the stored
    * schema stays exactly the change-row schema. */
  private def writeAndFlip(spark: SparkSession, storeDir: String, merged: DataFrame,
      buckets: Int, n: Long, carried: Map[Int, String], key: String = "_id"): Unit = {
    import scala.jdk.CollectionConverters._
    val deltaName = s"delta-$n"
    merged.withColumn("_b", bucketCol(key, buckets))
      .repartition(col("_b"))
      .write.mode("overwrite").partitionBy("_b")
      .parquet(s"$storeDir/$deltaName")
    // Manifest entries come from the dirs actually written (not the
    // predicted touched set) so a bucket that merged to zero rows can
    // never dangle.
    val written = {
      val s = Files.list(Paths.get(storeDir, deltaName))
      try s.iterator().asScala.map(_.getFileName.toString).toList
        .filter(_.startsWith("_b=")).map(d => d.stripPrefix("_b=").toInt -> s"$deltaName/$d")
        .toMap
      finally s.close()
    }
    val entries = carried ++ written
    val manName = s"manifest-$n"
    val body = (s"buckets=$buckets" ::
      entries.toSeq.sortBy(_._1).map { case (k, p) => s"$k $p" }.toList).mkString("\n")
    Files.writeString(Paths.get(storeDir, manName), body)
    val tmp = Paths.get(storeDir, "CURRENT.tmp")
    Files.writeString(tmp, manName)
    Files.move(tmp, Paths.get(storeDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gc(storeDir, manName, entries)
  }

  /** Delete everything NEITHER the live NOR the immediately-previous
    * manifest references: older manifests, per-bucket delta leaves
    * superseded two merges ago (a delta dir may stay half-live for many
    * merges), and — once a previous manifest exists to serve the
    * retention window — pre-migration gen-* dirs and legacy flat
    * parquet. Keeping exactly one superseded manifest alive means a
    * reader that resolved CURRENT just before this flip scans intact
    * files; one publication deep, like the index-tier trees. Best-effort,
    * after the flip — a crash mid-GC only leaves reclaimable orphans.
    * Never touches `_defer` (the pipeline's pause-spill area) or the DLQ,
    * which live outside the gen-/delta-/manifest- namespace. */
  private def gc(storeDir: String, keepManifest: String, entries: Map[Int, String]): Unit = {
    import scala.jdk.CollectionConverters._
    val n = keepManifest.stripPrefix("manifest-").toLong
    val root = Paths.get(storeDir)
    val top = {
      val s = Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    val prevName = top.map(_.getFileName.toString)
      .filter(_.startsWith("manifest-"))
      .flatMap(m => scala.util.Try(m.stripPrefix("manifest-").toLong).toOption)
      .filter(_ < n).sorted.lastOption.map(k => s"manifest-$k")
    val keepManifests = Set(keepManifest) ++ prevName
    val referenced = entries.values.toSet ++
      prevName.map(readManifest(storeDir, _).entries.values.toSet)
        .getOrElse(Set.empty[String])
    // no previous manifest → this flip IS the migration (or store birth):
    // the pre-migration layout serves as the retained generation
    val retainLegacy = prevName.isEmpty
    top.foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("manifest-") && !keepManifests.contains(name))
        Files.deleteIfExists(p)
      else if (name.startsWith("gen-")) { if (!retainLegacy) deleteRecursively(p) }
      else if (name == "_SUCCESS" || ((name.endsWith(".parquet") || name.endsWith(".parquet.crc")) && !Files.isDirectory(p))) {
        if (!retainLegacy) Files.deleteIfExists(p) // legacy flat files, post-migration
      }
      else if (name.startsWith("delta-")) {
        val leaves = {
          val s = Files.list(p)
          try s.iterator().asScala.toList finally s.close()
        }
        leaves.foreach { leaf =>
          val rel = s"$name/${leaf.getFileName}"
          if (leaf.getFileName.toString.startsWith("_b=") && !referenced.contains(rel))
            deleteRecursively(leaf)
        }
        val remaining = {
          val s = Files.list(p)
          try s.iterator().asScala.toList finally s.close()
        }
        if (!remaining.exists(_.getFileName.toString.startsWith("_b=")))
          deleteRecursively(p)
      }
    }
  }

  private def deleteRecursively(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }
}
