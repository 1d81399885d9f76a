package graft

import org.apache.spark.sql.SparkSession

import graft.llm.DedupOps
import graft.model.Tables

/** Dev profiling: stage-by-stage timing of the MinHash near-dup pipeline. */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup docs.count")(docs.count())
    val ss = time("shingleSet count")(DedupOps.shingleSet(docs).count())
    println(s"  sset rows=$ss")
    val sigs = DedupOps.minhashSignatures(docs)
    time("signatures count")(sigs.count())
    val cands = DedupOps.lshCandidates(sigs)
    val nc = time("candidates count")(cands.count())
    println(s"  cand pairs=$nc")
    time("full minhashNearDups")(DedupOps.minhashNearDups(docs, 0.5).count())
    time("full again (warm)")(DedupOps.minhashNearDups(docs, 0.5).count())
    DedupOps.releaseCaches()
    time("d4 ngramJaccardDups")(DedupOps.ngramJaccardDups(docs, 0.3).count())
    DedupOps.releaseCaches()
    time("d3b simhashNearDups")(DedupOps.simhashNearDups(docs).count())
    DedupOps.releaseCaches()
    val emb = Tables.embeddings(spark, sfDir)
    time("warmup emb.count")(emb.count())
    time("e4 ivfTopK")(
      graft.llm.SimilarityOps.ivfTopK(emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5).count())
    spark.stop()
  }
}
