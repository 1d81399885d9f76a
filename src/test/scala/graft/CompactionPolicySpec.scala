package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{CompactionPolicy, DedupStream, VectorStream}

/** The compaction trigger policy (round-13 verdict item 5): the cron loop
  * is ONE pure function call per tier — `compactIfDue` reads dir listings,
  * fires on the policy's dir-count / byte thresholds, and preserves the
  * idle no-op (a freshly compacted tier never fires again until new
  * admissions accumulate, so an idle cron can't churn the retention
  * window). Both tiers drive full admit→threshold→compact cycles. */
class CompactionPolicySpec extends SparkSpec {
  import spark.implicits._

  private def gens(root: String): Seq[String] =
    Option(new java.io.File(root).list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.startsWith("tree-")).sorted

  test("text tier: dir-count threshold fires exactly at the policy bound, idle no-op holds") {
    val tmp = Files.createTempDirectory("graft_cpol_text").toString
    val policy = CompactionPolicy(maxFoldableDirs = 3)
    def admit(id: Long): Unit = DedupStream.admitBatch(
      Seq((id, s"wholly distinct document number $id with body ${id * 37}"))
        .toDF("doc_id", "text"),
      id, s"$tmp/index", s"$tmp/out", 0.5, "b1")

    admit(0); admit(1)
    // 2 dirs: latest (1) is carried, foldable fresh = {0} → under the bound
    assert(!DedupStream.compactIfDue(spark, s"$tmp/index", policy))
    assert(gens(s"$tmp/index").isEmpty, "a declined decision must not publish")

    admit(2); admit(3)
    // foldable fresh = {0,1,2} hits maxFoldableDirs=3 → compaction runs
    val before = DedupStream.corpusShingles(spark, s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet
    assert(DedupStream.compactIfDue(spark, s"$tmp/index", policy))
    assert(gens(s"$tmp/index") === Seq("tree-1"))
    // served state identical across the compaction
    val after = DedupStream.corpusShingles(spark, s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet
    assert(after === before)

    // idle no-op: the just-compacted tier has nothing fresh to fold — the
    // cron's next tick must neither fire nor advance the generation tree
    assert(!DedupStream.compactIfDue(spark, s"$tmp/index", policy))
    assert(gens(s"$tmp/index") === Seq("tree-1"))

    // one new admission is under the dir bound again
    admit(4)
    assert(!DedupStream.compactIfDue(spark, s"$tmp/index", policy))

    // ...but a byte-threshold policy fires on ANY fresh foldable dir once
    // the carried latest rotates it out of replay scope
    admit(5)
    val bytePolicy = CompactionPolicy(maxFoldableDirs = 1000, maxFoldableBytes = 1L)
    assert(DedupStream.compactIfDue(spark, s"$tmp/index", bytePolicy))
    assert(gens(s"$tmp/index").contains("tree-2"))
    assert(!DedupStream.compactIfDue(spark, s"$tmp/index", bytePolicy),
      "byte policy must also no-op on a freshly compacted tier")
    val served = DedupStream.corpusShingles(spark, s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet
    assert(served === Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("a side awaiting crash-heal makes the trigger fire even under threshold") {
    val tmp = Files.createTempDirectory("graft_cpol_heal").toString
    val policy = CompactionPolicy(maxFoldableDirs = 1000)
    DedupStream.admitBatch(
      Seq((1L, "solitary document for the heal case with its words"))
        .toDF("doc_id", "text"),
      0L, s"$tmp/index", s"$tmp/out", 0.5, "b1")
    // simulate a pre-generation binary's crash mid-in-place-swap: the live
    // side moved aside to `.old`, the replacement never landed
    val live = new java.io.File(s"$tmp/index/shingles")
    assert(live.renameTo(new java.io.File(s"$tmp/index/shingles.old")))
    // the thresholds are nowhere near firing, but the heal makes it due —
    // a cron built on compactIfDue must not decline forever
    assert(DedupStream.compactIfDue(spark, s"$tmp/index", policy),
      "a side awaiting heal must be due unconditionally")
    assert(new java.io.File(s"$tmp/index/shingles").exists(),
      "compact() must have healed the side")
    // healed and nothing to fold: the next tick is quiet again
    assert(!DedupStream.compactIfDue(spark, s"$tmp/index", policy))
  }

  test("vector tier: threshold cycle with frozen extras carried, idle no-op holds") {
    val tmp = Files.createTempDirectory("graft_cpol_vec").toString
    def e(a: Float, b: Float, c: Float, d: Float) = Array(a, b, c, d)
    val corpus = Seq((500L, e(1f, 0f, 0f, 0f)), (600L, e(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    VectorStream.build(spark, s"$tmp/index", corpus, nCells = 2, iterations = 2)
    val policy = CompactionPolicy(maxFoldableDirs = 2)
    def admit(id: Long, v: Array[Float]): Unit = VectorStream.admitBatch(
      Seq((id, v)).toDF("vec_id", "embedding"),
      id, s"$tmp/index", s"$tmp/out", 0.9, "v1")

    admit(0L, e(0f, 0f, 1f, 0f))
    // both existing dirs are each lineage's latest (build-0, v1-0) — all
    // carried, nothing foldable, so the policy must not fire
    assert(!VectorStream.compactIfDue(spark, s"$tmp/index", policy))
    admit(1L, e(0f, 0f, 0f, 1f))
    admit(2L, e(0.5f, 0.5f, 0f, 0f))
    // now v1's foldable fresh dirs reach the bound → fires
    val before = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet
    assert(VectorStream.compactIfDue(spark, s"$tmp/index", policy))
    val gensAfter = gens(s"$tmp/index")
    assert(gensAfter.nonEmpty)
    // the serving set and the frozen extras survive the cycle
    val after = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet
    assert(after === before)
    assert(new java.io.File(
      s"$tmp/index/${gensAfter.last}/centroids").exists(),
      "frozen centroids must ride into the new generation")
    // idle no-op on the fresh tree
    assert(!VectorStream.compactIfDue(spark, s"$tmp/index", policy))
    assert(gens(s"$tmp/index") === gensAfter)
  }
}
