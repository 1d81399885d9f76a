package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.MultimodalOps
import graft.model.Tables

/** Dev profiling for the media tiers (the r20 optimization round's
  * measure-first harness): isolates fixture GENERATION, container
  * DECODE and per-print COMPUTE inside the heavy m3/m4/m5 rows so an
  * optimization targets the stage that actually costs, not the row
  * total. Actions run through the noop sink (every column computed,
  * nothing collected — guide §1.4). */
object DevMediaTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val docs = Tables.documents(spark, sfDir).persist()
    time("warmup docs")(docs.count())
    val images = docs.filter(!MultimodalOps.isVideoId(col("doc_id")))
    val videos = docs.filter(MultimodalOps.isVideoId(col("doc_id")))

    // ---- image tier: generation vs decode vs prints --------------------
    time("gen plain PNG (asMediaTable images)")(
      noop(MultimodalOps.asMediaTable(images)))
    time("gen cropT PNG (asCropMirrorMediaTable)")(
      noop(MultimodalOps.asCropMirrorMediaTable(images)))
    val cmm = MultimodalOps.asCropMirrorMediaTable(images).persist()
    time("materialize cropT media")(cmm.count())
    time("decode only (decodeMeta over cached media)")(
      noop(MultimodalOps.decodeMeta(spark, cmm).toDF()))
    time("tileKPrintFrame over cached media (decode+4-fam ktiles)")(
      noop(MultimodalOps.tileKPrintFrame(cmm)))
    time("tilePrintFrame over cached media (decode+plain tiles)")(
      noop(MultimodalOps.tilePrintFrame(cmm)))
    time("lensTileFrame over cached media (decode+all families)")(
      noop(MultimodalOps.lensTileFrame(cmm)))
    cmm.unpersist()

    // ---- video tier: generation vs combined decode ---------------------
    time("gen AVI (asMediaTable videos)")(
      noop(MultimodalOps.asMediaTable(videos)))
    time("gen mirror AVI (asMirrorMixMediaTable)")(
      noop(MultimodalOps.asMirrorMixMediaTable(videos)))
    val vm = MultimodalOps.asMirrorMixMediaTable(videos).persist()
    time("materialize mirror AVI media")(vm.count())
    time("decodeVideoFull over cached media")(
      noop(MultimodalOps.decodeVideoFull(spark, vm).toDF()))
    vm.unpersist()

    // ---- audio tier ------------------------------------------------------
    time("gen audio (asAudioTable)")(
      noop(MultimodalOps.asAudioTable(docs)))
    val am = MultimodalOps.asAudioTable(docs).persist()
    time("materialize audio")(am.count())
    time("decodeAudioFull over cached audio")(
      noop(MultimodalOps.decodeAudioFull(spark, am).toDF()))
    am.unpersist()

    docs.unpersist()
    spark.stop()
  }
}
