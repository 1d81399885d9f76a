package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compaction trigger policy for the maintained index tiers: fire when
  * any side's foldable NEW batch dirs (the previous `compacted`
  * consolidation excluded — refolding it alone is the no-op case) reach
  * a dir count or byte threshold. The defaults suit a cron'd loop: ~a
  * handful of microbatch dirs folds cheaply, and the byte bound keeps a
  * burst of fat batches from waiting out the dir count. The decision
  * itself ([[DedupStream.compactIfDue]], [[VectorStream.compactIfDue]])
  * reads only dir listings + content summaries, never data — so the cron
  * loop is one pure function call per tier. */
final case class CompactionPolicy(
    maxFoldableDirs: Int = 8, maxFoldableBytes: Long = 256L << 20) {
  require(maxFoldableDirs >= 1 && maxFoldableBytes >= 1)
}

/** Shared machinery for batch=-keyed maintained index sides — the
  * dir-per-microbatch append layout both admission loops
  * ([[DedupStream]] text, [[VectorStream]] embeddings) use:
  * idempotent per-(lineage, batch) overwrite for replay safety, and
  * GENERATION-TREE publication for every state change that rewrites
  * existing files (rebuilds AND compactions): the new state is fully
  * staged under `.staging-<g>`, made live by ONE atomic rename to
  * `tree-<g>`, and the previous generation is retained one publication
  * so a reader that resolved the old tree just before the rename
  * finishes its scan on intact files. The per-side two-rename swap this
  * replaces moved the live files aside mid-protocol, so a reader whose
  * parquet file listing predated the swap lost its folded files —
  * retention of a renamed dir cannot fix that (the listed paths
  * themselves die with the rename); only publish-and-retire-in-place
  * can, which is what generations are. */
private[streaming] object IndexSides {

  def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Published generation numbers under `root`, ascending. */
  def treeGens(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("tree-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("tree-").toLong).toOption)
      .sorted
  }

  /** The live serving tree: the highest-generation `tree-<g>` dir (always
    * complete — publication is atomic), falling back to `root` itself for
    * pre-generation flat layouts (readable; the first compaction or
    * rebuild migrates them). */
  def liveRoot(spark: SparkSession, root: String): String = {
    val gens = treeGens(fsOf(spark, root), root)
    gens.lastOption.map(g => s"$root/tree-$g").getOrElse(root)
  }

  /** Read one side; an absent dir (first batch ever) is an empty corpus,
    * not an error. Goes through the Hadoop FileSystem resolved from the
    * session (a java.nio probe would answer false on HDFS/S3 and
    * silently disable the corpus). The `batch=` partition dir is
    * surfaced as a column so callers can exclude a replayed batch's own
    * previous append; public readers drop it. The `.old` fallback reads
    * state a pre-generation binary's in-place compaction left mid-swap
    * — generations never produce one, but inherited layouts can carry
    * it. */
  def readSide(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$dir.old")
    val withBatch = schema.add(StructField("batch", StringType))
    val readable = if (fs.exists(path)) Some(dir)
      else if (fs.exists(old)) Some(s"$dir.old") else None
    readable match {
      case Some(d) =>
        spark.read.schema(withBatch).parquet(d)
          .select(withBatch.fieldNames.toIndexedSeq.map(col): _*)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withBatch)
    }
  }

  /** Stage and atomically publish one new generation tree under `root`.
    *
    * `stage(stagingDir)` must write the COMPLETE tree (every side) under
    * the staging dir while the live tree stays untouched and readable
    * (canonical rebuilds feed the live index's own corpus back in, so
    * the old files must survive until the staged tree is complete).
    * Publication is ONE `fs.rename` — whose boolean result is REQUIRED,
    * Hadoop renames fail by returning false. A death during staging
    * leaves the live tree untouched (readers resolve the previous
    * generation; a rerun restages from scratch); there is no mid-swap
    * window because there is no multi-step swap.
    *
    * GC runs with a ONE-GENERATION RETENTION WINDOW (latest + previous
    * kept): a reader that resolved the old tree just before the rename
    * finishes its scan on intact files. The window covers one
    * intervening publication per read under the single-writer
    * discipline; a reader slower than a full publish cycle can still
    * lose its generation — best-effort beyond that bound, and a crash
    * mid-GC only leaves reclaimable orphans that resolution ignores.
    * `legacyNames` are the pre-generation FLAT side dirs at `root`
    * (plus their `.old`/`.compacting`/`.rebuilding` variants): they get
    * the same one-publication retention — kept alive while `tree-1` is
    * the only generation (a flat-layout reader may still be scanning
    * them), reclaimed from the second publication on. */
  def publishTree(spark: SparkSession, root: String, legacyNames: Seq[String])
      (stage: String => Unit): Long = {
    val fs = fsOf(spark, root)
    val gen = treeGens(fs, root).lastOption.getOrElse(0L) + 1
    val staging = s"$root/.staging-$gen"
    fs.delete(new Path(staging), true)
    stage(staging)
    val dest = new Path(s"$root/tree-$gen")
    require(fs.rename(new Path(staging), dest),
      s"publish rename $staging -> $dest failed; live tree untouched")
    treeGens(fs, root).filter(_ < gen - 1)
      .foreach(g => fs.delete(new Path(s"$root/tree-$g"), true))
    val reclaimFlat = gen >= 2
    fs.listStatus(new Path(root)).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith(".staging-") && n != s".staging-$gen") ||
          (reclaimFlat && legacyNames.exists(s =>
            n == s || n == s"$s.old" || n == s"$s.compacting" || n == s"$s.rebuilding"))
      }
      .foreach(fs.delete(_, true))
    gen
  }

  /** Fold the per-batch `batch=<lineage>-<id>` dirs of each side into one
    * consolidated `batch=compacted` dir (the Delta/Iceberg OPTIMIZE
    * analog at the same seam), applying the side's `fold` to the
    * consolidated frame (identity for row sides; a re-aggregation for
    * sum-mergeable stats partials), and publishing the result as a NEW
    * GENERATION via [[publishTree]] — the live tree's files are never
    * touched, so in-flight readers keep scanning intact paths and the
    * retention window covers readers that resolved the superseded tree.
    *
    * Replay safety is ENFORCED, not advisory: each lineage has at most
    * ONE uncommitted (hence replayable) batch — the latest — and a
    * replay recognizes its own previous append only through that dir's
    * key. So each lineage's highest-numbered dir is carried over AS A
    * DIR (tiny: one microbatch) while everything else, previous
    * `compacted` included, folds into the consolidated dir. Compacted
    * rows carry batch="compacted", which can never equal a live
    * `<lineage>-<id>` key.
    *
    * `extras` are tree members carried verbatim into the new generation
    * (the vector tier's frozen centroids/codebooks); any OTHER member of
    * a live generation tree is also carried verbatim, so a compaction
    * can never silently drop a side it wasn't told about. A flat legacy
    * layout contributes only the named sides + extras (its root holds
    * unrelated state — group stores, output dirs).
    *
    * Single-writer discipline: run between microbatches. A no-op when no
    * side has anything to fold. */
  /** The `batch=` dir keys of one side under a LIVE tree root. */
  private def batchDirsOf(fs: FileSystem, live: String, side: String): Seq[String] = {
    val p = new Path(s"$live/$side")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
  }

  /** The replay-addressable dirs a compaction must carry AS DIRS: the
    * latest batch id per lineage (each lineage's only replayable batch). */
  private def carriedOf(dirs: Seq[String]): Set[String] =
    dirs.filter(_ != "compacted")
      .flatMap { key =>
        val i = key.lastIndexOf('-')
        if (i < 0) None
        else scala.util.Try(key.substring(i + 1).toLong).toOption
          .map(id => (key.substring(0, i), id, key))
      }
      .groupBy(_._1).values.map(_.maxBy(_._2)._3).toSet

  /** One side's (all dirs, carried, foldable) split — the ONE definition
    * [[compact]] executes and [[shouldCompact]] decides on, so the
    * trigger policy can never diverge from what a compaction would
    * actually fold. */
  private def foldSplitOf(fs: FileSystem, live: String,
      side: String): (Seq[String], Set[String], Seq[String]) = {
    val dirs = batchDirsOf(fs, live, side)
    val carried = carriedOf(dirs)
    (dirs, carried, dirs.filterNot(carried.contains))
  }

  /** A side a pre-generation binary's crash left mid-in-place-swap (the
    * live dir gone, its `.old` present) — [[compact]] heals it on entry,
    * so the TRIGGER must treat it as due: deciding on the un-healed
    * listing alone would count zero foldables for that side and a
    * cron built on [[compactIfDue]] would decline forever, leaving the
    * side's data invisible. */
  private def needsHeal(fs: FileSystem, live: String, name: String): Boolean =
    !fs.exists(new Path(s"$live/$name")) && fs.exists(new Path(s"$live/$name.old"))

  /** Pure decision for the cron seam: does the policy say compact NOW?
    * Reads only dir listings + content summaries — never data. Exactly
    * the sides [[compact]] would fold; `true` implies compact() will do
    * real work — fold (its no-op rule is foldable ⊆ {compacted}, and this
    * counts only non-`compacted` foldables) or at least heal: a side
    * awaiting compact()'s crash-heal is due unconditionally, the heal
    * itself being the point. */
  def shouldCompact(spark: SparkSession, root: String, sideNames: Seq[String],
      policy: CompactionPolicy = CompactionPolicy()): Boolean = {
    val fs = fsOf(spark, root)
    val live = liveRoot(spark, root)
    sideNames.exists(needsHeal(fs, live, _)) || sideNames.exists { side =>
      val (_, _, foldable) = foldSplitOf(fs, live, side)
      val fresh = foldable.filterNot(_ == "compacted")
      fresh.size >= policy.maxFoldableDirs || (fresh.nonEmpty &&
        fresh.map(d => fs.getContentSummary(
          new Path(s"$live/$side/batch=$d")).getLength).sum >= policy.maxFoldableBytes)
    }
  }

  /** The cron loop's single call: compact iff the policy fires. Returns
    * whether compact() RAN — which usually published a new generation,
    * but a heal-only firing (a side awaiting the crash-heal, nothing to
    * fold) heals in place and publishes nothing; don't use the return
    * value as a publication counter. */
  def compactIfDue(spark: SparkSession, root: String,
      sides: Seq[(String, StructType, DataFrame => DataFrame)],
      extras: Seq[String] = Nil,
      policy: CompactionPolicy = CompactionPolicy()): Boolean = {
    val due = shouldCompact(spark, root, sides.map(_._1), policy)
    if (due) compact(spark, root, sides, extras)
    due
  }

  def compact(spark: SparkSession, root: String,
      sides: Seq[(String, StructType, DataFrame => DataFrame)],
      extras: Seq[String] = Nil): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, root)
    val live = liveRoot(spark, root)
    val sideNames = sides.map(_._1)
    // heal a pre-generation binary's crash mid-in-place-swap: the side
    // was moved to `.old` and the process died before the replacement
    // landed. Hadoop rename FAILS BY RETURNING FALSE, not by throwing.
    (sideNames ++ extras).foreach { s =>
      val p = new Path(s"$live/$s"); val old = new Path(s"$live/$s.old")
      if (!fs.exists(p) && fs.exists(old))
        require(fs.rename(old, p), s"compact: heal rename $old -> $p failed")
    }
    val plan = sides.map { case (side, schema, fold) =>
      val (dirs, carried, foldable) = foldSplitOf(fs, live, side)
      (side, schema, fold, dirs, carried, foldable)
    }
    // No-op when no side has anything NEW to fold: a side whose only
    // foldable dir is the previous `compacted` consolidation would just
    // rewrite identical content, and publishing a generation anyway
    // advances the eviction window under idle cron'd compaction loops —
    // churning out the very tree a slow reader may still be scanning.
    if (plan.forall(p => p._6.forall(_ == "compacted"))) return
    val verbatim: Seq[String] =
      if (live == root) extras.filter(s => fs.exists(new Path(s"$live/$s")))
      else fs.listStatus(new Path(live)).toSeq
        .map(_.getPath.getName)
        .filterNot(sideNames.contains)
        .filterNot(n => n.endsWith(".old") || n.endsWith(".compacting")
          || n.endsWith(".rebuilding"))
    publishTree(spark, root, legacyNames = sideNames ++ extras) { staging =>
      plan.foreach { case (side, schema, fold, dirs, carried, foldable) =>
        if (dirs.nonEmpty) {
          if (foldable.nonEmpty)
            fold(readSide(spark, s"$live/$side", schema)
                .filter(col("batch").isin(foldable: _*)).drop("batch"))
              .write.parquet(s"$staging/$side/batch=compacted")
          carried.foreach { key =>
            org.apache.hadoop.fs.FileUtil.copy(
              fs, new Path(s"$live/$side/batch=$key"),
              fs, new Path(s"$staging/$side/batch=$key"), false, conf)
          }
        }
      }
      verbatim.foreach { name =>
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new Path(s"$live/$name"),
          fs, new Path(s"$staging/$name"), false, conf)
      }
    }
  }

  /** Lineage tag for idempotent per-batch dirs: batchIds restart from 0
    * whenever a stream begins a NEW checkpoint, so a bare `batch=<id>`
    * key would let a second lineage overwrite the first's admissions.
    * Keyed by the checkpoint location, the tag is stable across restarts
    * of the same stream (replay still overwrites its own dir
    * idempotently) and distinct for a new lineage. */
  def lineageOf(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
}
