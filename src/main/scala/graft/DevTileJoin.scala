package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.MultimodalOps
import graft.model.Tables

/** Dev profiling: join-strategy variants for the m4r crop∘dihedral tile
  * search (the round's heaviest row). The candidate join's sides are
  * mis-estimated (the fanned 4-family b side gets broadcast at ~100 MiB
  * while the lt-only a side is ~8 MiB), so this times the same search
  * under (a) the planner's choice, (b) a forced a-side broadcast,
  * (c) a shuffle-hash hint — all result-identical. */
object DevTileJoin {
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
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null); r
    }

    val docs = Tables.documents(spark, sfDir).persist()
    docs.count()
    val images = docs.filter(!MultimodalOps.isVideoId(col("doc_id")))
    val prints = MultimodalOps.tileKPrintFrame(
      MultimodalOps.asCropMirrorMediaTable(images)).persist()
    time("materialize ktile prints")(prints.count())

    def search(hint: String): DataFrame = {
      val maxHamming = 3; val maxBucket = 100; val maxOffset = 1; val minMatched = 2
      val allBands = prints.select(col("doc_id"), col("fam"), col("tx"),
        col("ty"), col("h_hi"), col("h_lo"),
        posexplode(array(
          col("h_lo").bitwiseAND(lit(65535L)),
          shiftright(col("h_lo"), 16).bitwiseAND(lit(65535L)),
          col("h_hi").bitwiseAND(lit(65535L)),
          shiftright(col("h_hi"), 16).bitwiseAND(lit(65535L))))
          .as(Seq("band", "key")))
      val ok = allBands.groupBy("fam", "tx", "ty", "band", "key")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") <= maxBucket)
        .select("fam", "tx", "ty", "band", "key")
      val bands = allBands.join(ok, Seq("fam", "tx", "ty", "band", "key"))
      def sided(df: DataFrame, side: String): DataFrame =
        df.select(col("fam").as(s"fam_$side"),
          col("tx").as(s"tx_$side"), col("ty").as(s"ty_$side"),
          col("band").as(s"band_$side"), col("key").as(s"key_$side"),
          col("doc_id").as(s"id_$side"),
          col("h_hi").as(s"h${side}_hi"), col("h_lo").as(s"h${side}_lo"))
      val aRaw = sided(bands.filter(col("fam") === "lt"), "a")
      val aSide = hint match {
        case "bcast_a" => broadcast(aRaw)
        case "shuffle" => aRaw.hint("shuffle_hash")
        case _ => aRaw
      }
      val bSide = sided(bands, "b")
        .withColumn("join_tx",
          explode(sequence(col("tx_b") - maxOffset, col("tx_b") + maxOffset)))
        .withColumn("join_ty",
          explode(sequence(col("ty_b") - maxOffset, col("ty_b") + maxOffset)))
      val ham = (bit_count(col("ha_hi").bitwiseXOR(col("hb_hi"))) +
        bit_count(col("ha_lo").bitwiseXOR(col("hb_lo")))).cast("long")
      aSide.join(bSide,
          col("join_tx") === col("tx_a") && col("join_ty") === col("ty_a") &&
            col("band_a") === col("band_b") &&
            col("key_a") === col("key_b") &&
            col("id_a") < col("id_b"))
        .filter(ham <= maxHamming)
        .select(col("id_a"), col("id_b"), col("fam_b").as("fam"),
          col("tx_a"), col("ty_a"),
          (col("tx_b") - col("tx_a")).as("dx"),
          (col("ty_b") - col("ty_a")).as("dy"))
        .distinct()
        .groupBy(col("id_a"), col("id_b"), col("fam"), col("dx"), col("dy"))
        .agg(count(lit(1)).as("n_matched"))
        .filter(col("n_matched") >= minMatched)
        .orderBy("id_a", "id_b", "fam", "dx", "dy")
    }

    for (h <- Seq("planner", "bcast_a", "shuffle", "planner", "bcast_a", "shuffle")) {
      time(s"m4r search [$h]")(println(s"  rows=" + search(h).count()))
    }
    spark.stop()
  }
}
