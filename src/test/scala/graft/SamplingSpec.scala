package graft

import org.apache.spark.sql.functions._

import graft.llm.SamplingOps
import graft.model.Tables

/** Sampling / data-mixing operators (T6-T8): determinism and monotonicity
  * of the hash sample, and exact equivalence of the two-phase distributed
  * prefix-sum pack with the single-window reference form. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("hash sample is deterministic and monotone in the rate") {
    val s5 = SamplingOps.hashSample(docs, 5, 100, "s1").select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = SamplingOps.hashSample(docs, 10, 100, "s1").select("doc_id").collect().map(_.getLong(0)).toSet
    val s10b = SamplingOps.hashSample(docs, 10, 100, "s1").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 === s10b, "same salt+rate must reproduce the same sample")
    assert(s5.subsetOf(s10), "raising the rate must only ADD documents")
    assert(s10.nonEmpty && s10.size < docs.count())
    // a different salt is a fresh draw
    val other = SamplingOps.hashSample(docs, 10, 100, "s2").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other !== s10)
  }

  test("scalable two-phase budget pack is row-identical to the window form") {
    val simple = SamplingOps.packToBudget(docs, 8000L).collect().toSeq
    // partitions > docs-per-range exercises empty partitions in the offset map
    for (parts <- Seq(4, 32, 700)) {
      val scalable = SamplingOps.packToBudgetScalable(docs, 8000L, parts).collect().toSeq
      assert(scalable === simple, s"parts=$parts diverged")
    }
    assert(simple.nonEmpty)
  }

  test("budget pack fills greedily: kept set is a quality-prefix within budget") {
    val kept = SamplingOps.packToBudget(docs, 8000L)
    val total = kept.agg(sum("n_tokens")).head().getLong(0)
    assert(total <= 8000L)
    // the next-best excluded doc would not have fit
    val minKeptQ = kept.agg(min("quality_score")).head().getDouble(0)
    assert(kept.count() > 0 && minKeptQ > 0.0)
  }

  test("sequence pack tiles the token stream exactly: scalable ≡ window form") {
    val simple = SamplingOps.packSequences(docs, 2048L).collect().toSeq
    for (parts <- Seq(8, 64)) {
      val scalable = SamplingOps.packSequencesScalable(docs, 2048L, parts).collect().toSeq
      assert(scalable === simple, s"parts=$parts diverged")
    }
    // offsets tile with no gaps or overlaps: start = previous start + tokens
    val rows = simple.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.sliding(2).foreach {
      case Seq((_, n, s, _, _), (_, _, s2, _, _)) => assert(s2 === s + n)
      case _ =>
    }
    rows.foreach { case (_, _, s, seqId, off) =>
      assert(seqId === s / 2048 && off === s % 2048)
    }
    assert(rows.head._3 === 0L)
  }

  test("source-stratified quota mix caps each dump; lang form unchanged (t8b)") {
    val quotas = Map("src0" -> 800L, "src7" -> 800L, "src12" -> 600L)
    val mix = SamplingOps.mixByKeyQuota(docs, quotas, "source").persist()
    try {
      val perSrc = mix.groupBy("source").agg(sum("n_tokens").as("toks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perSrc.keySet.subsetOf(quotas.keySet))
      perSrc.foreach { case (src, toks) =>
        assert(toks <= quotas(src), s"$src over quota: $toks")
      }
    } finally mix.unpersist(blocking = false)
    // the generic form with keyCol = lang IS t8 (row-identical)
    val langQuotas = Map("en" -> 3000L, "de" -> 1000L)
    assert(SamplingOps.mixByKeyQuota(docs, langQuotas, "lang").collect().toSeq ===
      SamplingOps.mixByQuota(docs, langQuotas).collect().toSeq)
  }

  test("chunking tiles every word with the configured overlap (t12)") {
    import spark.implicits._
    val words = (0 until 100).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = SamplingOps.chunkDocuments(df, chunkTokens = 10, overlap = 3)
      .as[(Long, Long, Long, Long, String)].collect()
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.length === 14) // 1 + ceil((100-10)/7)
    // reconstruction: first chunk + each later chunk minus its overlap
    val rebuilt = doc1.head._5.split(" ").toSeq ++
      doc1.tail.toSeq.flatMap(_._5.split(" ").drop(3).toSeq)
    assert(rebuilt === words)
    // consecutive chunks share exactly the overlap words
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(a._5.split(" ").takeRight(3).toSeq === b._5.split(" ").take(3).toSeq)
      assert(b._3 === a._3 + 7)
    }
    // an under-length doc is one whole chunk
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 2L, "tiny doc")))
  }

  test("chunking reconstructs any doc at any width/overlap (t12 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = for {
      chunkTokens <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, chunkTokens - 1)
      nDocs <- Gen.choose(1, 4)
      lens <- Gen.listOfN(nDocs, Gen.choose(1, 40))
    } yield (chunkTokens, overlap, lens)
    val prop = Prop.forAll(gen) { case (chunkTokens, overlap, lens) =>
      val texts = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"d${i}w$j").mkString(" "))
      }
      val out = SamplingOps.chunkDocuments(
        texts.toDF("doc_id", "text"), chunkTokens, overlap)
        .as[(Long, Long, Long, Long, String)].collect()
      texts.forall { case (id, text) =>
        val words = text.split(" ", -1).toSeq
        val chunks = out.filter(_._1 == id).sortBy(_._2)
        // every doc chunks; starts advance by step; reconstruction exact
        chunks.nonEmpty &&
          chunks.zipWithIndex.forall { case (c, i) =>
            c._3 == i.toLong * (chunkTokens - overlap) } &&
          (chunks.head._5.split(" ", -1).toSeq ++
            chunks.tail.toSeq.flatMap(_._5.split(" ", -1).drop(overlap).toSeq)
          ) == words &&
          chunks.forall(c => c._4 <= chunkTokens && c._4 > 0)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("language mix respects each quota and only includes whitelisted langs") {
    val quotas = Map("en" -> 5000L, "de" -> 2000L, "es" -> 2000L, "fr" -> 2000L, "zh" -> 1500L)
    val mix = SamplingOps.mixByQuota(docs, quotas).persist()
    try {
      val perLang = mix.groupBy("lang").agg(sum("n_tokens").as("toks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perLang.keySet.subsetOf(quotas.keySet))
      perLang.foreach { case (lang, toks) =>
        assert(toks <= quotas(lang), s"$lang over quota: $toks")
      }
      assert(perLang.size === quotas.size, "every quota'd language present in the fixture mix")
    } finally mix.unpersist(blocking = false)
  }

  test("temperature budgets: exact sqrt weights, floor split, flattening (t16)") {
    import spark.implicits._
    // en = 400 tokens, de = 100 → w = (20, 10), budget 300 → (200, 100)
    val tiny = Seq(
      (1L, (1 to 400).map(i => s"e$i").mkString(" "), "en"),
      (2L, (1 to 100).map(i => s"d$i").mkString(" "), "de")).toDF("doc_id", "text", "lang")
    val got = SamplingOps.temperatureBudgets(tiny, 300L)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got === Seq(("de", 100L, 10.0, 100L), ("en", 400L, 20.0, 200L)))
    // τ=1/2 flattens: the smallest slice's budget share strictly exceeds
    // its token share, the largest slice's falls below it (on the fixture)
    val full = SamplingOps.temperatureBudgets(docs, 8000L)
      .as[(String, Long, Double, Long)].collect().toSeq
    val totTok = full.map(_._2).sum.toDouble
    val totBud = full.map(_._4).sum.toDouble
    val smallest = full.minBy(_._2); val largest = full.maxBy(_._2)
    assert(smallest._4 / totBud > smallest._2 / totTok)
    assert(largest._4 / totBud < largest._2 / totTok)
    // budgets never exceed the requested total (floor split)
    assert(full.map(_._4).sum <= 8000L)
  }

  test("quantile gate invariants hold for arbitrary corpora and fractions (t17 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // tiny vocabulary + short lengths → frequent score TIES across docs,
    // the case the tie-inclusive threshold rule exists for; "the"/"a"
    // drive the stopword term of the composite
    val word = Gen.oneOf("the", "a", "data", "x")
    val text = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      keepDen <- Gen.choose(1, 6)
      keepNum <- Gen.choose(1, keepDen)
      texts <- Gen.choose(1, 3).flatMap(nl => Gen.listOfN(nl,
        Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, text))))
    } yield (keepNum, keepDen, texts)
    val prop = Prop.forAll(gen) { case (keepNum, keepDen, perLang) =>
      val rows = perLang.zipWithIndex.flatMap { case (ts, li) =>
        ts.map(t => (s"l$li", t))
      }.zipWithIndex.map { case ((lang, t), i) => (i.toLong, t, lang) }
      val df = rows.toDF("doc_id", "text", "lang")
      val kept = SamplingOps.quantileGate(df, keepNum, keepDen)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      val bins = graft.llm.TextOps.textStats(df).select("doc_id", "quality_score")
        .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 10000)).toMap
      rows.groupBy(_._3).forall { case (lang, rs) =>
        val target = (rs.length * keepNum + keepDen - 1) / keepDen
        val k = kept.filter(_._2 == lang)
        val keptIds = k.map(_._1).toSet
        val dropped = rs.filterNot(r => keptIds(r._1))
        k.length >= target && k.nonEmpty && {
          val thrB = k.head._3
          k.forall(x => x._3 == thrB && bins(x._1) >= thrB) && // at/above thr
          dropped.forall(d => bins(d._1) < thrB) &&            // cutoff exact
          rs.count(r => bins(r._1) > thrB) < target            // thr minimal
        }
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("quantile gate: per-language cutoff semantics and minimal tie-inclusive keep (t17)") {
    val kept = SamplingOps.quantileGate(docs, 2, 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(kept.nonEmpty)
    // recompute per-language from the full scored corpus, driver-side
    // (t1's quality_score is the same composite the gate bins)
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = graft.llm.TextOps.textStats(docs)
      .select("doc_id", "quality_score")
      .collect().map(r => (r.getLong(0), langs(r.getLong(0)), r.getDouble(1)))
    val keptByLang = kept.groupBy(_._2)
    scored.groupBy(_._2).foreach { case (lang, rows) =>
      val target = (rows.length * 2 + 4) / 5 // ceil(0.4 n)
      val k = keptByLang.getOrElse(lang, Array.empty)
      assert(k.length >= target, s"$lang kept ${k.length} < target $target")
      // cutoff semantics: every kept score >= every dropped score
      val keptIds = k.map(_._1).toSet
      val dropped = rows.filterNot(r => keptIds(r._1))
      if (k.nonEmpty && dropped.nonEmpty)
        assert(k.map(_._3).min >= dropped.map(_._3).max, s"$lang cutoff violated")
      // minimality: strictly-above-threshold rows alone must NOT reach the
      // target (only threshold ties push past it)
      val thrB = k.head._4
      val above = rows.count(r => math.round(r._3 * 10000) > thrB)
      assert(above < target, s"$lang threshold not minimal")
      // every kept row carries the same threshold and sits at/above it
      k.foreach { r =>
        assert(r._4 === thrB)
        assert(math.round(r._3 * 10000) >= thrB)
      }
    }
  }
}
