package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps
import graft.streaming.VectorStream

/** The embedding-tier admission service: build a served IVF index, screen
  * and admit vector microbatches against it, and keep every e-tier
  * operator servable from the stream-maintained state. */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def e(x: Float, y: Float, z: Float, w: Float) = Array(x, y, z, w)

  test("vector admission: semantic dups rejected with the corpus keeper, survivors searchable") {
    val tmp = Files.createTempDirectory("graft_vecstream").toString
    val corpus = Seq(
      (500L, e(1f, 0f, 0f, 0f)), (600L, e(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    VectorStream.build(spark, s"$tmp/index", corpus, nCells = 2, iterations = 2)

    // batch 0: vec 3 is a semantic twin of corpus vec 500 (lower id — the
    // d5 non-monotone lesson: the CORPUS member must keep id_a); vec 700
    // is genuinely new
    VectorStream.admitBatch(
      Seq((3L, e(0.999f, 0.01f, 0f, 0f)), (700L, e(0f, 0f, 1f, 0f)))
        .toDF("vec_id", "embedding"),
      0L, s"$tmp/index", s"$tmp/out", 0.9, "v1")
    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(700L), "the twin is rejected despite its lower id")
    val dups = spark.read.parquet(s"$tmp/out/dups")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((500L, 3L)), "corpus member is the keeper id_a")
    val indexed = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet
    assert(indexed === Set(500L, 600L, 700L))

    // within-batch dedup: two twins arrive together — lower id admits,
    // higher id rejects against it; a dup of the JUST-admitted 700 also
    // rejects (the index the screen reads includes prior admissions)
    VectorStream.admitBatch(
      Seq((801L, e(0f, 0.999f, 0.01f, 0f)), (802L, e(0f, 0.998f, 0.02f, 0f)),
        (803L, e(0f, 0.01f, 0.999f, 0f)))
        .toDF("vec_id", "embedding"),
      1L, s"$tmp/index", s"$tmp/out", 0.9, "v1")
    val kept2 = spark.read.parquet(s"$tmp/out/kept")
      .select("vec_id").as[Long].collect().toSet
    assert(kept2 === Set(700L), "801 dups corpus 600, 802 dups 600/801, 803 dups 700")

    // the served state drives the ordinary e-tier operators unchanged
    val served = VectorStream.index(spark, s"$tmp/index")
    val topk = SimilarityOps.ivfQueryTopK(served,
      Seq((9000L, e(0f, 0f, 0.9f, 0.1f))).toDF("vec_id", "embedding"),
      k = 1, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(topk === Seq(700L), "admitted vector is the nearest served neighbor")

    // metrics: one accounting row per batch, with the drift dial reading
    val m = VectorStream.metrics(spark, s"$tmp/out")
      .select("batch_id", "n_in", "n_kept", "n_sem_rejected", "n_prior_known")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(m === Set((0L, 2L, 1L, 1L, 0L), (1L, 3L, 0L, 3L, 0L)), s"got $m")
    val drift = VectorStream.metrics(spark, s"$tmp/out")
      .select("increment_mean_cos").as[Option[Double]].collect().toSeq
    assert(drift.forall(d => d.exists(x => x >= -1.0 && x <= 1.0)),
      s"every batch exports a drift reading: $drift")
  }

  test("adaptive filtered search serves off the maintained index, total from the stats side (e13c streaming)") {
    val tmp = Files.createTempDirectory("graft_vecfilter").toString
    // the LlmSpec under-return fixture, here as MAINTAINED state:
    // quarter-circle vectors, 2 cells — an allow-set clustered in the
    // far cell under-returns at fixed nProbe = 1
    val vecs = (0 to 10).map { i =>
      val th = i * 0.1
      (i.toLong, e(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f))
    }
    VectorStream.build(spark, s"$tmp/index", vecs.toDF("vec_id", "embedding"),
      nCells = 2, iterations = 1)
    val served = VectorStream.index(spark, s"$tmp/index")
    val query = vecs.toDF("vec_id", "embedding").filter(col("vec_id") === 0)
    val farCell = served.cells.filter(col("vec_id") === 10L)
      .select("cell").as[Int].head()
    val near0 = served.cells.filter(col("vec_id") === 0L)
      .select("cell").as[Int].head()
    assume(farCell != near0, "fixture sanity: 0 and 10 split cells")
    val farAllowed = served.cells
      .filter(col("cell") === farCell && col("vec_id") =!= 0L).select("vec_id")
    val partial = SimilarityOps
      .ivfFilteredTopK(served, farAllowed, query, 3, nProbe = 1).collect()
    assert(partial.length < 3, s"fixture sanity: ${partial.toSeq}")
    // the SERVING wrapper: corpus total read from the (cell, n) stats
    // side (bytes), dial widens the probe set, full filtered top-k
    // returns — equal to the exact pre-filter baseline
    val got = VectorStream.filteredTopK(spark, s"$tmp/index", farAllowed,
      query, 3, nProbe = 1)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    val exact = SimilarityOps.filteredTopK(
      vecs.toDF("vec_id", "embedding"), farAllowed, query, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
      .map { case (r, n) => (r.toLong, n) }
    assert(got.length === 3 && got === exact, s"got $got vs exact $exact")
    graft.llm.DedupOps.releaseCaches()
  }

  test("replay and re-ingest are idempotent; compaction preserves the served index") {
    val tmp = Files.createTempDirectory("graft_vecstream2").toString
    val corpus = Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    VectorStream.build(spark, s"$tmp/index", corpus, nCells = 2, iterations = 2)
    val batch = Seq((10L, e(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    // same-lineage replay overwrites its own dir — no double-indexing
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .filter(col("vec_id") === 10L).count() === 1)
    // a foreign-lineage re-ingest is caught by the prior-known probe
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "l2")
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .filter(col("vec_id") === 10L).count() === 1)
    val prior = VectorStream.metrics(spark, s"$tmp/out")
      .filter(col("lineage") === "l2")
      .select("n_prior_known").as[Long].collect().toSeq
    assert(prior === Seq(1L))
    // compaction folds the batch dirs; the served cells are unchanged
    val before = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    VectorStream.admitBatch(
      Seq((11L, e(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding"),
      1L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    // a reader that resolved the pre-compaction tree (file listing is
    // captured at DataFrame creation) must complete after the swap — the
    // superseded generation is retained one publication
    val preCompact = VectorStream.corpusCells(spark, s"$tmp/index")
    VectorStream.compact(spark, s"$tmp/index")
    val after = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    assert(after === before + ((11L, after.find(_._1 == 11L).get._2)))
    assert(preCompact.select("vec_id").as[Long].collect().toSet
      === after.map(_._1), "pre-compaction reader lost files to the swap")
    // a rebuild resets the serving state from the admitted corpus
    VectorStream.build(spark, s"$tmp/index",
      VectorStream.corpusCells(spark, s"$tmp/index").select("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === after.map(_._1))
  }

  test("the served screen reads maintained cell stats, never aggregating the cells table (plan gate)") {
    val tmp = Files.createTempDirectory("graft_vecgate").toString
    VectorStream.build(spark, s"$tmp/index",
      Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    VectorStream.admitBatch(
      Seq((10L, e(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding"),
      0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    // the stats side's per-cell sums equal the cells table's true sizes
    val statSums = VectorStream.corpusCellStats(spark, s"$tmp/index")
      .groupBy("cell").agg(sum("n").as("n"))
      .as[(Int, Long)].collect().toMap
    val trueSizes = VectorStream.corpusCells(spark, s"$tmp/index")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(statSums === trueSizes)
    // plan gate (the d9b discipline applied to the vector tier): no
    // Aggregate in the screening plan may read the corpus CELLS scan
    // without an intervening join — sizes must come from the stats side
    val probe = Seq((20L, e(0.999f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")
    val scr = VectorStream.screen(spark, s"$tmp/index", probe, 0.9)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def cellsScanNoJoin(p: LogicalPlan): Boolean = p match {
      case _: Join => false
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.getName == "cells")
        case _ => false
      }
      case other => other.children.exists(cellsScanNoJoin)
    }
    val offending = scr.queryExecution.optimizedPlan.collect {
      case a: Aggregate if cellsScanNoJoin(a.child) => a
    }
    assert(offending.isEmpty,
      s"corpus-cells aggregation in the screening plan:\n${offending.mkString("\n")}")
    assert(scr.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((1L, 20L)))
  }

  test("same-lineage replay re-applies the original verdict under the maxCell rail") {
    val tmp = Files.createTempDirectory("graft_vecstream4").toString
    // single cell: every vector shares it, so the rail's combined count is
    // exactly corpus + batch
    val corpus = Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    VectorStream.build(spark, s"$tmp/index", corpus, nCells = 1, iterations = 2)
    // original run: nc(2) + nn(2) = 4 ≤ maxCell=4 → screened; 10 dups
    // corpus 1, 11 admits
    val batch = Seq((10L, e(0.999f, 0.01f, 0f, 0f)), (11L, e(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "r1",
      maxCell = 4)
    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    // same-lineage replay: the screen must read the ORIGINAL corpus (own
    // append excluded) — with the previous append counted, the cell would
    // read 3 + 2 = 5 > 4, the rail would drop it from pair generation and
    // the previously-rejected dup 10 would be admitted
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "r1",
      maxCell = 4)
    val keptReplay = spark.read.parquet(s"$tmp/out/kept")
      .select("vec_id").as[Long].collect().toSet
    assert(keptReplay === Set(11L), "replay re-rejects the semantic dup")
    val dupsReplay = spark.read.parquet(s"$tmp/out/dups")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dupsReplay === Set((1L, 10L)))
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 2L, 11L))
    // the maintained stats side agrees with the true cell sizes (no
    // double count from the replay)
    val statSums = VectorStream.corpusCellStats(spark, s"$tmp/index")
      .groupBy("cell").agg(sum("n").as("n")).as[(Int, Long)].collect().toMap
    assert(statSums === Map(0 -> 3L))
  }

  test("rebuild publishes atomically: staging leftovers invisible, one tree serves every side together") {
    val tmp = Files.createTempDirectory("graft_vecstream5").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$tmp/index/$s")
    VectorStream.build(spark, s"$tmp/index",
      Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    VectorStream.admitBatch(
      Seq((10L, e(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding"),
      0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    val served = Set(1L, 2L, 10L)
    // crash DURING staging: partial `.staging-<g>` leftovers — readers
    // resolve the live tree and never look inside a staging dir, so
    // there is no window in which new cells pair with old centroids
    fs.mkdirs(p(".staging-2/cells/batch=build-0"))
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === served)
    assert(VectorStream.centroids(spark, s"$tmp/index").length === 2)
    // a rerun build() restages from scratch and publishes with ONE
    // rename; superseded generations and leftovers are GC'd
    VectorStream.build(spark, s"$tmp/index",
      VectorStream.corpusCells(spark, s"$tmp/index").select("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === served)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/index"))
      .map(_.getPath.getName).toSet
    // retention window: latest + previous kept (a reader that resolved the
    // old tree right before the rename finishes on intact files)
    assert(names.filter(_.startsWith("tree-")) === Set("tree-1", "tree-2"),
      s"latest + previous retained: $names")
    assert(!names.exists(_.startsWith(".staging-")), s"staging GC'd: $names")
    // a reader pinned to the PREVIOUS generation still scans intact files
    // after the new publication — the reader-during-cleanup guarantee
    assert(VectorStream.corpusCells(spark, s"$tmp/index/tree-1")
      .select("vec_id").as[Long].collect().toSet === served)
    // a third build evicts tree-1: the window is one generation deep
    VectorStream.build(spark, s"$tmp/index",
      VectorStream.corpusCells(spark, s"$tmp/index").select("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    val names3 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/index"))
      .map(_.getPath.getName).toSet.filter(_.startsWith("tree-"))
    assert(names3 === Set("tree-2", "tree-3"), s"one-gen retention: $names3")
    // every side lives inside the single published tree
    val root = VectorStream.liveRoot(spark, s"$tmp/index")
    Seq("centroids", "codebooks", "cells", "cellstats", "codes").foreach { s =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s")), s"$s in $root")
    }
    // and the rebuilt index still screens: a dup of an admitted vector
    // rejects
    VectorStream.admitBatch(
      Seq((20L, e(0f, 0f, 0.999f, 0.01f))).toDF("vec_id", "embedding"),
      1L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === served)
  }

  test("PQ codes side: served codes equal frozen-codebook encode; replay idempotent; e11b/e12 served from the stream") {
    val tmp = Files.createTempDirectory("graft_vecstream6").toString
    val corpus = Seq(
      (1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)),
      (3L, e(0f, 0f, 1f, 0f)), (4L, e(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    VectorStream.build(spark, s"$tmp/index", corpus, nCells = 2, iterations = 2)
    // 10 is no corpus member's semantic dup (cos ≈ 0.7 < 0.9) → admitted
    val batch = Seq((10L, e(0.7f, 0.7f, 0f, 0f))).toDF("vec_id", "embedding")
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    // same-lineage replay overwrites its own codes partial — no dupes
    VectorStream.admitBatch(batch, 0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    val pq = VectorStream.pqIndex(spark, s"$tmp/index")
    val codeRows = pq.codes.orderBy("vec_id").collect()
    assert(codeRows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 10L))
    // served codes ≡ encoding the served cells on the FROZEN codebooks —
    // admission never re-trains, so the two derivations must agree
    val expect = SimilarityOps.pqEncode(
      VectorStream.corpusCells(spark, s"$tmp/index"), pq.codebooks)
      .orderBy("vec_id").collect()
    assert(codeRows.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    // e11b: full-precision query against the served coded corpus
    val q = Seq((9000L, e(0.6f, 0.6f, 0f, 0f))).toDF("vec_id", "embedding")
    val adcTop = SimilarityOps.pqTopK(pq, q, 1)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(adcTop === Seq(10L), "admitted vector is the served ADC neighbor")
    // e12: the stream-maintained coded cells drive IVFADC directly
    val ivfadcTop = SimilarityOps.ivfAdcTopK(
      VectorStream.ivfPqIndex(spark, s"$tmp/index"), q, 1, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ivfadcTop === Seq(10L))
  }

  test("benchmark decontamination served from the maintained index (d8b streaming)") {
    val tmp = Files.createTempDirectory("graft_vecstream7").toString
    VectorStream.build(spark, s"$tmp/index",
      Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)),
        (3L, e(0f, 0f, 1f, 0f)), (4L, e(0f, 0f, 0f, 1f)))
        .toDF("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    VectorStream.admitBatch(
      Seq((10L, e(0.7f, 0.7f, 0f, 0f))).toDF("vec_id", "embedding"),
      0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    // a benchmark holding a copy of the ADMITTED vector plus a stranger
    val bench = Seq((9100L, e(0.7f, 0.7f, 0f, 0f)),
      (9200L, e(-1f, -1f, -1f, -1f))).toDF("vec_id", "embedding")
    val hits = VectorStream.decontaminate(spark, s"$tmp/index", bench,
      0.9, nProbe = 1).collect()
    assert(hits.exists(r => r.getLong(0) == 10L && r.getLong(1) == 9100L
      && r.getDouble(2) >= 0.999999), s"copy of admitted vector not flagged: ${hits.toSeq}")
    assert(!hits.exists(_.getLong(1) == 9200L), "stranger wrongly flagged")
    // the maintained (cell, n) stats rail and the batch operator over the
    // served index (sizes re-aggregated from cells) land on one result
    val viaIndex = SimilarityOps.semanticContamination(
      VectorStream.index(spark, s"$tmp/index"), bench, 0.9, nProbe = 1)
      .collect()
    assert(hits.toSeq.map(_.toSeq) === viaIndex.toSeq.map(_.toSeq))
  }

  test("an inherited mid-swap .old layout never reads an empty corpus (fallback + self-heal)") {
    val tmp = Files.createTempDirectory("graft_vecstream3").toString
    VectorStream.build(spark, s"$tmp/index",
      Seq((1L, e(1f, 0f, 0f, 0f)), (2L, e(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"),
      nCells = 2, iterations = 2)
    VectorStream.admitBatch(
      Seq((10L, e(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding"),
      0L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    VectorStream.admitBatch(
      Seq((11L, e(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding"),
      1L, s"$tmp/index", s"$tmp/out", 0.9, "l1")
    val before = VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet
    assert(before === Set(1L, 2L, 10L, 11L))
    // simulate an INHERITED mid-swap layout: a pre-generation binary's
    // in-place compaction moved the side to `.old` and died before the
    // replacement landed (generation compaction itself never produces
    // this state — it only ever adds a complete tree)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = VectorStream.liveRoot(spark, s"$tmp/index")
    val cells = new org.apache.hadoop.fs.Path(s"$root/cells")
    val old = new org.apache.hadoop.fs.Path(s"$root/cells.old")
    val fs = cells.getFileSystem(conf)
    assert(fs.rename(cells, old))
    // readers fall back to `.old` — no window ever sees an empty corpus
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === before)
    // the next compact self-heals (rename back) before staging, then
    // publishes the fold as a new generation
    VectorStream.compact(spark, s"$tmp/index")
    assert(VectorStream.corpusCells(spark, s"$tmp/index")
      .select("vec_id").as[Long].collect().toSet === before)
    // the superseded tree is retained INTACT (healed, no `.old`) for
    // readers that resolved it pre-publication…
    assert(fs.exists(cells) && !fs.exists(old), "healed tree retained, .old gone")
    // …and the new live tree carries every side
    val root2 = VectorStream.liveRoot(spark, s"$tmp/index")
    assert(root2 !== root, "compaction published a new generation")
    Seq("centroids", "codebooks", "cells", "cellstats", "codes").foreach { s =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root2/$s")), s"$s in $root2")
    }
  }
}
