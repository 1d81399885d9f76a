package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared machinery for batch=-keyed maintained index sides — the
  * dir-per-microbatch append layout both admission loops
  * ([[DedupStream]] text, [[VectorStream]] embeddings) use:
  * idempotent per-(lineage, batch) overwrite for replay safety, `.old`
  * crash-fallback reads, and write-then-flip compaction that folds
  * everything but each lineage's latest (still-replayable) dir. */
private[streaming] object IndexSides {

  /** Read one side; an absent dir (first batch ever) is an empty corpus,
    * not an error. Goes through the Hadoop FileSystem resolved from the
    * session (a java.nio probe would answer false on HDFS/S3 and
    * silently disable the corpus). The `batch=` partition dir is
    * surfaced as a column so callers can exclude a replayed batch's own
    * previous append; public readers drop it. A crash inside compact()'s
    * rename pair leaves the complete previous tree under `.old` — never
    * read an empty corpus. */
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

  /** Fold the per-batch `batch=<lineage>-<id>` dirs of each side into one
    * consolidated `batch=compacted` dir (the Delta/Iceberg OPTIMIZE
    * analog at the same seam), applying the side's `fold` to the
    * consolidated frame (identity for row sides; a re-aggregation for
    * sum-mergeable stats partials).
    *
    * Replay safety is ENFORCED, not advisory: each lineage has at most
    * ONE uncommitted (hence replayable) batch — the latest — and a
    * replay recognizes its own previous append only through that dir's
    * key. So each lineage's highest-numbered dir is carried over AS A
    * DIR (tiny: one microbatch) while everything else, previous
    * `compacted` included, folds into the consolidated dir.
    *
    * Crash-safety is write-then-flip per side: the new tree is fully
    * built under `<side>.compacting`, then two atomic renames swap it in
    * (`<side>` → `<side>.old` → deleted). A crash between the renames
    * leaves only `<side>.old`, which [[readSide]] falls back to and the
    * next compact self-heals. Compacted rows carry batch="compacted",
    * which can never equal a live `<lineage>-<id>` key. Single-writer
    * discipline: run between microbatches. */
  def compact(spark: SparkSession, indexDir: String,
      sides: Seq[(String, StructType, DataFrame => DataFrame)]): Unit =
    sides.foreach { case (side, schema, fold) =>
      val dir = s"$indexDir/$side"
      val path = new Path(dir)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = path.getFileSystem(conf)
      val old = new Path(s"$dir.old")
      if (!fs.exists(path) && fs.exists(old))
        // heal a crash between the two flips below. Hadoop rename FAILS
        // BY RETURNING FALSE, not by throwing — every rename in this
        // protocol checks the boolean, because a swallowed failure
        // followed by the delete below would destroy the last good copy.
        require(fs.rename(old, path), s"compact: heal rename $old -> $path failed")
      if (fs.exists(path)) {
        val batchDirs = fs.listStatus(path).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
          .map(_.getPath.getName.stripPrefix("batch="))
        // latest batch id per lineage stays a replay-addressable dir
        val carried = batchDirs.filter(_ != "compacted")
          .flatMap { key =>
            val i = key.lastIndexOf('-')
            if (i < 0) None
            else scala.util.Try(key.substring(i + 1).toLong).toOption
              .map(id => (key.substring(0, i), id, key))
          }
          .groupBy(_._1).values.map(_.maxBy(_._2)._3).toSet
        val foldable = batchDirs.filterNot(carried.contains)
        if (foldable.nonEmpty) {
          val tmp = new Path(s"$dir.compacting")
          fs.delete(tmp, true)
          fold(readSide(spark, dir, schema)
              .filter(col("batch").isin(foldable: _*)).drop("batch"))
            .write.parquet(s"$dir.compacting/batch=compacted")
          carried.foreach { key =>
            org.apache.hadoop.fs.FileUtil.copy(
              fs, new Path(s"$dir/batch=$key"),
              fs, new Path(s"$dir.compacting/batch=$key"), false, conf)
          }
          fs.delete(old, true)
          require(fs.rename(path, old), s"compact: rename $path -> $old failed")
          require(fs.rename(tmp, path), s"compact: rename $tmp -> $path failed")
          // only drop the fallback once the new tree is verifiably live
          if (fs.exists(path)) fs.delete(old, true)
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
