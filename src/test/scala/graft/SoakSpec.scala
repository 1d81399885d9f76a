package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.streaming.{DedupStream, VectorStream}

/** Rebuild-under-reads soak — the integration form of the two per-tier
  * reader-on-previous retention specs: admission batches and index
  * publications (compactions; vector-tier REBUILDS that change the cell
  * count) run while reader threads continuously resolve and scan the
  * served state, asserting no read ever observes a missing or mixed
  * tree.
  *
  * Invariants each read must satisfy (writer maintains two atomic
  * checkpoints around every admission):
  *  - completeness: the observed id set ⊇ everything committed BEFORE
  *    the read resolved its tree (admissions only add; compaction and
  *    rebuild preserve content);
  *  - boundedness: observed ⊆ everything ever handed to an admission
  *    (a torn in-flight append may surface a PREFIX of the newest batch
  *    — per-file commits are atomic renames — but never foreign rows);
  *  - coherence (vector tier): every cell id is valid for the SAME
  *    tree's centroid count even while rebuilds flip nCells 2↔3 — the
  *    single-resolution [[VectorStream.index]] guarantee;
  *  - and no read throws: superseded trees stay intact one publication
  *    deep, and the writer paces publications by READER CYCLES (each
  *    publication waits until every in-flight read completed) rather
  *    than wall time — the retention window is ONE publication per
  *    in-flight read by design, and this is the single-writer
  *    between-microbatches discipline the scaladocs pin, made
  *    load-independent for CI.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  /** Runs `body` in reader threads while `writer` executes. The writer
    * paces PUBLICATIONS with [[Pacer.quiesce]] — waiting until EVERY
    * reader completes the cycle it had in flight — instead of wall
    * sleeps, so the one-publication retention window is respected by
    * construction even on a heavily loaded machine: a read that resolved
    * the pre-publication tree is guaranteed finished before the next
    * publication can evict that tree. */
  private class Pacer(nThreads: Int) {
    val cycles: IndexedSeq[java.util.concurrent.atomic.AtomicLong] =
      IndexedSeq.fill(nThreads)(new java.util.concurrent.atomic.AtomicLong(0L))
    @volatile var stop = false
    /** Block until EACH reader advances at least one full cycle past the
      * call point — the cycle it may have had in flight at publication
      * time has then completed (bounded; fails open on stop/timeout). */
    def quiesce(): Unit = {
      val targets = cycles.map(_.get() + 1)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (cycles.zip(targets).exists { case (c, t) => c.get() < t } &&
          !stop && System.nanoTime() < deadline)
        Thread.sleep(20)
    }
  }

  private def runReaders(pacer: Pacer, body: () => Unit)(
      writer: => Unit): Seq[String] = {
    val failures = new ConcurrentLinkedQueue[String]
    val threads = pacer.cycles.indices.map { i =>
      val t = new Thread(() => {
        while (!pacer.stop) {
          try { body(); pacer.cycles(i).incrementAndGet() }
          catch { case e: Throwable =>
            failures.add(s"reader$i: ${e.getClass.getSimpleName}: ${e.getMessage}")
            pacer.stop = true
          }
        }
      }, s"soak-reader-$i")
      t.start(); t
    }
    try writer finally { pacer.stop = true; threads.foreach(_.join(30000)) }
    failures.toArray(Array.empty[String]).toSeq
  }

  test("text tier: reads stay complete and bounded across admissions + compactions") {
    val tmp = Files.createTempDirectory("graft_soak_text").toString
    def doc(i: Long) = (i, s"document $i carries words w${i}a w${i}b w${i}c " +
      s"w${i}d w${i}e plus shared filler tokens")
    val committed = new AtomicReference(Set.empty[Long])
    val offered = new AtomicReference(Set.empty[Long])
    // seed state so readers have a tree from the first cycle
    offered.set(Set(1L)); DedupStream.admitBatch(
      Seq(doc(1L)).toDF("doc_id", "text"), 0L, s"$tmp/index", s"$tmp/out", 0.5, "l1")
    committed.set(Set(1L))

    val pacer = new Pacer(2)
    val failures = runReaders(pacer, () => {
      val mustHave = committed.get() // BEFORE resolving — admissions only add
      val seen = DedupStream.corpusShingles(spark, s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet
      // the groups BucketStore flips a manifest per admission — its
      // one-manifest retention must satisfy the same invariants
      val groups = DedupStream.corpusGroups(spark, s"$tmp/index")
        .select("doc_id").as[Long].collect().toSet
      // the bloom side (one OR-mergeable partial per admission, folded by
      // compact) must keep its no-false-negative guarantee mid-rebuild:
      // every committed doc's fingerprint probes all-set in any served read
      val bits = DedupStream.corpusBloom(spark, s"$tmp/index")
      val flags = graft.llm.DedupOps.bloomScreen(
          mustHave.toSeq.map(doc).toDF("doc_id", "text"), bits)
        .select("maybe_dup").as[Boolean].collect()
      assert(flags.forall(identity),
        s"bloom read lost committed fingerprints (${flags.count(!_)} of ${flags.length})")
      // upper bound snapshotted AFTER the scans: `offered` grows
      // monotonically and is set before each admission, so anything a
      // scan can surface was offered by the time the scan finished (a
      // pre-scan snapshot would spuriously flag a concurrent admission)
      val mayHave = offered.get()
      assert(mustHave.subsetOf(seen), s"read lost committed docs: ${mustHave -- seen}")
      assert(seen.subsetOf(mayHave), s"read surfaced foreign docs: ${seen -- mayHave}")
      assert(mustHave.subsetOf(groups), s"groups read lost docs: ${mustHave -- groups}")
      assert(groups.subsetOf(mayHave), s"groups read foreign docs: ${groups -- mayHave}")
    }) {
      (2L to 7L).foreach { i =>
        offered.set(offered.get() + i)
        DedupStream.admitBatch(Seq(doc(i)).toDF("doc_id", "text"),
          i, s"$tmp/index", s"$tmp/out", 0.5, "l1")
        committed.set(committed.get() + i)
        // EVERY admission is a groups-manifest publication (BucketStore
        // flips CURRENT per merge), so the one-publication window must be
        // respected per admission, not just per index-tree compaction
        pacer.quiesce()
        if (i % 3 == 0) {
          DedupStream.compact(spark, s"$tmp/index")
          pacer.quiesce()
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // the final state is exactly every admitted doc, served from a tree
    assert(DedupStream.liveRoot(spark, s"$tmp/index").contains("/tree-"))
    assert(DedupStream.corpusShingles(spark, s"$tmp/index")
      .select("doc_id").as[Long].collect().toSet === (1L to 7L).toSet)
  }

  test("vector tier: reads stay coherent across admissions, compactions and nCells-flipping rebuilds") {
    val tmp = Files.createTempDirectory("graft_soak_vec").toString
    // one axis per vector (16 dims cover every id used) so nothing
    // screens as a semantic dup
    def e(i: Int) = Array.tabulate(16)(d => if (d == i % 16) 1f else 0f)
    val committed = new AtomicReference(Set.empty[Long])
    val offered = new AtomicReference(Set.empty[Long])
    offered.set(Set(1L, 2L))
    VectorStream.build(spark, s"$tmp/index",
      Seq((1L, e(0)), (2L, e(1))).toDF("vec_id", "embedding"),
      nCells = 2, iterations = 1)
    committed.set(Set(1L, 2L))

    val pacer = new Pacer(2)
    val failures = runReaders(pacer, () => {
      val mustHave = committed.get()
      val ix = VectorStream.index(spark, s"$tmp/index") // ONE root for both sides
      val nCents = ix.centroids.length
      val rows = ix.cells.select("vec_id", "cell").as[(Long, Int)].collect()
      val mayHave = offered.get() // AFTER the scan — see the text tier note
      val seen = rows.map(_._1).toSet
      assert(mustHave.subsetOf(seen), s"read lost committed vecs: ${mustHave -- seen}")
      assert(seen.subsetOf(mayHave), s"read surfaced foreign vecs: ${seen -- mayHave}")
      val badCell = rows.filter(r => r._2 < 0 || r._2 >= nCents)
      assert(badCell.isEmpty,
        s"MIXED TREE: cells $badCell against $nCents centroids")
    }) {
      (3L to 8L).foreach { i =>
        offered.set(offered.get() + i)
        VectorStream.admitBatch(
          Seq((i, e(i.toInt))).toDF("vec_id", "embedding"),
          i, s"$tmp/index", s"$tmp/out", 0.99, "l1")
        committed.set(committed.get() + i)
        i match {
          case 4L =>
            VectorStream.compact(spark, s"$tmp/index"); pacer.quiesce()
          case 6L => // REBUILD with a different cell count: a mixed read
            // (old centroids + new cells or vice versa) becomes detectable
            VectorStream.build(spark, s"$tmp/index",
              VectorStream.corpusCells(spark, s"$tmp/index")
                .select("vec_id", "embedding"),
              nCells = 3, iterations = 1)
            pacer.quiesce()
          case 8L =>
            VectorStream.build(spark, s"$tmp/index",
              VectorStream.corpusCells(spark, s"$tmp/index")
                .select("vec_id", "embedding"),
              nCells = 2, iterations = 1)
            pacer.quiesce()
          case _ => ()
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === (1L to 8L).toSet)
    assert(VectorStream.centroids(spark, s"$tmp/index").length === 2)
  }
}
