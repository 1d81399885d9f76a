package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: quality stats, language-ID, token counting, document
  * fingerprinting. All are narrow per-row projections (codegen'd built-ins,
  * no UDFs) except the fingerprint, which does one map-side-combined
  * aggregation — every one scales linearly with no shuffle of raw text.
  */
object TextOps {

  /** Portable 60-bit hash (same on the DuckDB oracle side):
    * first 15 hex digits of md5 as a long. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val P: Long = 1000000007L

  /** Occurrences of a literal substring — exact, regex-free, portable. */
  def substrCount(text: Column, pat: String): Column =
    ((length(text) - length(replace(text, lit(pat), lit("")))) / pat.length).cast("long")

  /** Whitespace token count (spaces + 1) — the ONE definition t1, t3, t14
    * and t18b share, so the n_tokens/ws_tokens columns cannot drift. */
  def wsTokens(text: Column): Column = substrCount(text, " ") + 1

  /** T1 — per-document quality stats: token count (whitespace), average
    * token length, stopword ratio, composite quality score. */
  def textStats(documents: DataFrame): DataFrame = {
    val t = col("text")
    val padded = concat(lit(" "), t, lit(" "))
    val nTokens = wsTokens(t)
    val nStop = substrCount(padded, " the ") + substrCount(padded, " a ")
    documents.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      nTokens.as("n_tokens"),
      round((length(t) - nTokens + 1).cast("double") / nTokens, 4).as("avg_token_len"),
      round(nStop.cast("double") / nTokens, 4).as("stopword_ratio"),
      round(least(nTokens.cast("double") / lit(100.0), lit(1.0)) * 0.5 +
        (nStop.cast("double") / nTokens) * 0.5, 4).as("quality_score")
    ).orderBy("doc_id")
  }

  /** T2 — language-ID by stopword-lexicon hit counts (n-gram heuristic).
    * Deterministic argmax with tie order en→de→es→fr. The lexicons are
    * engine config; on real corpora you'd use charset ranges + larger
    * lexicons, but the operator shape (per-row scoring, no shuffle) is the
    * same at any scale. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " una "),
    "fr" -> Seq(" le ", " les ", " une "))

  def langId(documents: DataFrame): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val scores = Lexicons.map { case (lang, words) =>
      lang -> words.map(w => substrCount(padded, w)).reduce(_ + _)
    }
    val scored = scores.foldLeft(documents) { case (df, (lang, c)) =>
      df.withColumn(s"s_$lang", c)
    }
    // First-wins argmax (ties resolved by lexicon order).
    val langs = Lexicons.map(_._1)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val rest = langs.drop(i + 1)
        if (rest.isEmpty) elseCol
        else when(rest.map(r => col(s"s_$lang") >= col(s"s_$r")).reduce(_ && _), lang)
          .otherwise(elseCol)
    }
    val outCols = Seq(col("doc_id"), col("lang").as("lang_declared"), pred.as("lang_pred")) ++
      langs.map(l => col(s"s_$l"))
    scored.select(outCols: _*).orderBy("doc_id")
  }

  /** T3 — BPE-ish token counting: whitespace tokens plus regex word-piece
    * tokens ([a-z]+ | digit runs | single non-alnum). */
  def tokenCounts(documents: DataFrame): DataFrame = {
    val t = col("text")
    documents.select(
      col("doc_id"),
      wsTokens(t).as("ws_tokens"),
      size(regexp_extract_all(t, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
        .as("bpe_tokens")
    ).orderBy("doc_id")
  }

  /** T5 — quality filter: keep documents whose composite quality score
    * clears a threshold — the action a training-data pipeline takes with
    * T1's score. Pure narrow filter; at 100 TB this is the gate that
    * decides what moves to the next stage, so it must (and does) pipeline
    * with the scan. */
  def qualityFilter(documents: DataFrame, minScore: Double): DataFrame =
    textStats(documents)
      .filter(col("quality_score") >= minScore)
      .select("doc_id", "quality_score")
      .orderBy("doc_id")

  /** T10 — repetition signals (the Gopher/MassiveText repetition rules,
    * Rae et al. 2021 §A1.1, restated word-wise for single-line docs):
    *  - `dup_word_frac`: 1 − distinct/total words — high for docs that
    *    loop over a small vocabulary;
    *  - `top2_frac`: share of the doc's words covered by its most
    *    frequent word bigram (count × 2 / n_words, capped at 1; the
    *    occurrence-overlap refinement is a documented approximation) —
    *    high for boilerplate chants and templated spam.
    * Shape: the per-doc fractions are narrow maps; the bigram mode needs
    * one (doc, gram) count with map-side combine plus a per-doc max —
    * the same doc-keyed aggregation class as T4. A pipeline thresholds
    * these exactly like T5's quality gate. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val base = documents
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        size(col("w")).cast("long").as("n_words"),
        round(lit(1.0) -
          size(array_distinct(col("w"))).cast("double") / size(col("w")), 4)
          .as("dup_word_frac"))
    val grams = base.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> " +
          "concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))")).as("g"))
    val top = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_c"))
    base.drop("w").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
        round(least(lit(1.0),
          coalesce(col("top_c"), lit(0L)).cast("double") * 2.0 / col("n_words")), 4)
          .as("top2_frac"))
      .orderBy("doc_id")
  }

  /** T11 — PII scrubbing (the C4/RefinedWeb-style redaction stage):
    * replace emails, dotted-quad IPs, and long digit runs (ids, phone
    * numbers) with typed placeholder tokens, and count each class so the
    * pipeline can threshold or audit redaction rates. Patterns use
    * explicit character classes only — the subset where Java regex
    * (Spark) and RE2 (DuckDB) agree, which the oracle pins on the full
    * corpus (an identity passthrough there — the fixture is synthetic
    * word-soup; the seeded-PII semantics are spec-tested). Replacement
    * order matters: emails before IPs before digit runs, so a redacted
    * class can't re-match as a later one. Pure narrow codegen'd map. */
  def piiScrub(documents: DataFrame): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val digits = "[0-9]{7,}"
    val t = col("text")
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(ip), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(digits), lit(0))).cast("long").as("n_digit_runs"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, email, "<EMAIL>"),
          ip, "<IP>"),
        digits, "<NUM>").as("text_clean"))
      .orderBy("doc_id")
  }

  /** T4 — document fingerprint: order-independent 60-bit bag-of-words hash
    * (sum of distinct-word hashes mod p). Rolling/positional variants are a
    * windowed extension; the bag form is what content-dedup pipelines key
    * on. Explode → two-level aggregation with map-side combine. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy("doc_id")
      .agg((sum(h60(col("w")) % P) % P).as("fingerprint"))
      .orderBy("doc_id")

  /** T19 — UNIGRAM-LM quality scoring (the CCNet/KenLM-class LM filter
    * restated on a unigram model): each document's negative log-likelihood
    * under the corpus's own word distribution — high-NLL docs are
    * rare-token gibberish, low-NLL docs boilerplate; pipelines band on
    * `avg_nll` exactly like CCNet's perplexity head/middle/tail split.
    *
    * Portability discipline (the q1 integer-cents rule applied to logs):
    * each word contributes round(−ln(n_w/N)·10⁴) as a LONG, and the
    * per-doc reduction is an EXACT integer sum — no float-summation-order
    * hazard between engine and oracle; `avg_nll` is derived from the
    * exact integers at the end.
    *
    * Scale shape: one map-side-combined (word, n) count (shuffle ∝
    * vocabulary — in deployment this is the MAINTAINED wordcounts side,
    * `DedupStream.corpusWordCounts`, so scoring an increment never
    * re-tokenizes the corpus), the corpus total as a driver scalar
    * (bytes — the centroid-collect discipline), a word-keyed join of the
    * token stream against the vocab (AQE broadcasts a small vocab), and
    * one map-side-combinable per-doc sum of longs. */
  def unigramNll(documents: DataFrame): DataFrame = {
    val words = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    // tracked-persist the vocab: the total's driver read and the scoring
    // join's BUILD side share one tokenize pass (the words probe side
    // still tokenizes once — persisting the corpus-token-sized frame
    // would cost more than the narrow re-map); released by the standard
    // DedupOps.releaseCaches() call every batch query path already makes
    val freq = DedupOps.tracked(words.groupBy("word").agg(count(lit(1)).as("n")))
    val stats = freq.agg(sum("n")).head()
    // empty corpus → no word rows flow; the literal just needs to be sane
    val total = if (stats.isNullAt(0)) 1L else stats.getLong(0)
    words.join(freq, "word")
      .select(col("doc_id"),
        round(-log(col("n").cast("double") / total.toDouble) * 10000.0)
          .cast("long").as("wn"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("wn").as("nll_x10k"))
      .select(col("doc_id"), col("n_words"), col("nll_x10k"),
        round(col("nll_x10k").cast("double") / col("n_words") / 10000.0, 4)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  /** T19 SERVED — score an INCREMENT against a MAINTAINED corpus word
    * distribution (a (word, n) table — partials summed here, so
    * `DedupStream.corpusWordCounts`' per-batch rows feed in directly)
    * without touching corpus text: the online form of [[unigramNll]],
    * Laplace-smoothed so an out-of-vocabulary word scores the maximal
    * −ln(1/(N+V+1)) instead of erroring — gibberish the corpus never saw
    * ranks high-NLL, which is exactly the filter's job. Same
    * integer-quantized exact-sum discipline; `n_oov` is carried so the
    * screen doubles as the t15 OOV-rate signal.
    *
    * Scale shape: N and V are driver scalars off the vocab-sized counts
    * (bytes); the increment's token stream left-joins the vocab on word
    * (AQE broadcasts a small vocab) and reduces map-side — per-increment
    * cost is O(increment tokens), corpus never re-tokenized. */
  def unigramNllServed(documents: DataFrame, wordCounts: DataFrame): DataFrame = {
    // NOT tracked-persisted: this is the streaming SERVING path, which has
    // no releaseCaches seam — a per-microbatch screen would accumulate
    // pinned frames forever (and admitBatch's release could evict a
    // concurrent screen's cache mid-query). The vocab agg is
    // vocabulary-sized; recomputing it for the join is the cheaper evil.
    val vocab = wordCounts.groupBy("word").agg(sum("n").as("n"))
    val stats = vocab.agg(sum("n"), count(lit(1))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val vsize = stats.getLong(1)
    val denom = (total + vsize + 1).toDouble
    // An EMPTY model (never-admitted wordcounts side) has no opinion:
    // every word is OOV and the Laplace term degenerates to −ln(1/1) = 0,
    // which would score gibberish as PERFECT quality to any NLL-threshold
    // consumer. Null the score instead — n_oov == n_words still carries
    // the all-OOV signal — so a banding caller can't act on a meaningless
    // 0.
    val scoreCols =
      if (vsize == 0L)
        Seq(lit(null).cast("long").as("nll_x10k"),
          lit(null).cast("double").as("avg_nll"))
      else
        Seq(col("nll_x10k"),
          round(col("nll_x10k").cast("double") / col("n_words") / 10000.0, 4)
            .as("avg_nll"))
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(vocab, Seq("word"), "left")
      .select(col("doc_id"), col("n").isNull.cast("long").as("oov"),
        round(-log((coalesce(col("n"), lit(0L)).cast("double") + 1.0) / denom)
          * 10000.0).cast("long").as("wn"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("oov").as("n_oov"),
        sum("wn").as("nll_x10k"))
      .select(col("doc_id") +: col("n_words") +: col("n_oov") +: scoreCols: _*)
      .orderBy("doc_id")
  }

  /** T19c — BIGRAM-LM NLL: one Markov order up from [[unigramNll]] toward
    * CCNet's 5-gram KenLM filter. The first word scores under the corpus
    * unigram distribution, −ln(n_w/N); every later word under the MLE
    * conditional, −ln(c(prev,w)/c(prev)). In-corpus scoring means every
    * bigram a doc contains is in the corpus counts by construction, so
    * the conditional is well-defined and positive without smoothing
    * (the served/increment form is where smoothing lives — see t19b's
    * Laplace pattern). Same ×10⁴ integer quantization and exact long
    * sums as t19; avg_nll over all n_words terms (1 unigram + n−1
    * conditional).
    *
    * Scale shape: bigram extraction is a NARROW array map — zip_with over
    * the split's two shifted slices, never lead() over a corpus window
    * (which would shuffle the whole token stream per doc); counts are two
    * map-side-combined shuffles (∝ distinct bigrams / words); scoring
    * joins the pair stream on (prev, word) and first words on word — AQE
    * broadcasts the small models — and the per-doc sum reduces map-side.
    * The tokenize pass runs on the narrow probe side twice rather than
    * persisting a corpus-token-sized frame (the t19 trade, documented
    * there). */
  /** The (doc_id, prev, word) consecutive-pair stream — ONE definition
    * shared by [[bigramNll]], [[bigramNllServed]] and the admission
    * loop's bigram-counts side write, so the pair extraction cannot
    * drift between the model builder and its consumers. A narrow
    * zip_with over two shifted slices of the split: a 1-word doc slices
    * to two empty arrays and zips to nothing (no sequence(1,0)
    * descending-range hazard). */
  def bigramPairs(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("prev"), b.as("word")))).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.word").as("word"))

  def bigramNll(documents: DataFrame): DataFrame = {
    val words = documents.select(col("doc_id"), split(col("text"), " ").as("w"))
    def pairStream = bigramPairs(documents)
    val uni = DedupOps.tracked(documents
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n")))
    val stats = uni.agg(sum("n")).head()
    val total = if (stats.isNullAt(0)) 1L else stats.getLong(0)
    val big = pairStream.groupBy("prev", "word").agg(count(lit(1)).as("nb"))
    val firstTerms = words
      .select(col("doc_id"), element_at(col("w"), 1).as("word"))
      .join(uni, "word")
      .select(col("doc_id"),
        round(-log(col("n").cast("double") / total.toDouble) * 10000.0)
          .cast("long").as("wn"))
    val condTerms = pairStream
      .join(big, Seq("prev", "word"))
      .join(uni.select(col("word").as("prev"), col("n").as("np")), "prev")
      .select(col("doc_id"),
        round(-log(col("nb").cast("double") / col("np").cast("double")) * 10000.0)
          .cast("long").as("wn"))
    firstTerms.unionByName(condTerms)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("wn").as("nll_x10k"))
      .select(col("doc_id"), col("n_words"), col("nll_x10k"),
        round(col("nll_x10k").cast("double") / col("n_words") / 10000.0, 4)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  /** T19d — SERVED bigram NLL: score an increment against MAINTAINED
    * (word, n) unigram and (prev, word, n) bigram count tables — the
    * online form of [[bigramNll]], Laplace-smoothed on BOTH models
    * because an increment can carry words and bigrams the corpus never
    * saw: the first word scores (n_w+1)/(N+V+1) exactly like t19b, and
    * every later word scores (c(prev,w)+1)/(c(prev)+V+1) — an unseen
    * bigram after a known prev takes the per-context ceiling, an OOV
    * prev degenerates to 1/(V+1). Same ×10⁴ integer quantization and
    * exact long sums; `n_oov` counts positions whose own word is outside
    * the unigram vocab (the t19b/t15 signal, judged per word regardless
    * of bigram membership). An EMPTY model nulls the score like t19b
    * (n_oov == n_words carries the all-OOV signal).
    *
    * Scale shape: N and V are driver scalars off the vocab-sized counts;
    * the increment's pair stream left-joins the bigram model on (prev,
    * word) and the vocab twice (as prev for the denominator, as word for
    * the OOV flag) — AQE broadcasts small models — and reduces map-side.
    * Per-increment cost is O(increment tokens); corpus text never
    * touched. NOT tracked-persisted: this is the streaming serving path
    * (the t19b discipline — no releaseCaches seam there). */
  def bigramNllServed(documents: DataFrame, wordCounts: DataFrame,
      bigramCounts: DataFrame): DataFrame = {
    val vocab = wordCounts.groupBy("word").agg(sum("n").as("n"))
    val stats = vocab.agg(sum("n"), count(lit(1))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val vsize = stats.getLong(1)
    val uniDenom = (total + vsize + 1).toDouble
    val big = bigramCounts.groupBy("prev", "word").agg(sum("n").as("nb"))
    val firstTerms = documents
      .select(col("doc_id"),
        element_at(split(col("text"), " "), 1).as("word"))
      .join(vocab, Seq("word"), "left")
      .select(col("doc_id"), col("n").isNull.cast("long").as("oov"),
        round(-log((coalesce(col("n"), lit(0L)).cast("double") + 1.0) / uniDenom)
          * 10000.0).cast("long").as("wn"))
    val condTerms = bigramPairs(documents)
      .join(big, Seq("prev", "word"), "left")
      .join(vocab.select(col("word").as("prev"), col("n").as("np")),
        Seq("prev"), "left")
      .join(vocab.select(col("word"), lit(1L).as("in_v")), Seq("word"), "left")
      .select(col("doc_id"), col("in_v").isNull.cast("long").as("oov"),
        round(-log((coalesce(col("nb"), lit(0L)).cast("double") + 1.0)
          / (coalesce(col("np"), lit(0L)).cast("double") + vsize + 1.0))
          * 10000.0).cast("long").as("wn"))
    // the t19b empty-model guard: V=0 degenerates every Laplace term to
    // −ln(1/1) = 0 — gibberish would read as perfect; null the score
    val scoreCols =
      if (vsize == 0L)
        Seq(lit(null).cast("long").as("nll_x10k"),
          lit(null).cast("double").as("avg_nll"))
      else
        Seq(col("nll_x10k"),
          round(col("nll_x10k").cast("double") / col("n_words") / 10000.0, 4)
            .as("avg_nll"))
    firstTerms.unionByName(condTerms)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("oov").as("n_oov"),
        sum("wn").as("nll_x10k"))
      .select(col("doc_id") +: col("n_words") +: col("n_oov") +: scoreCols: _*)
      .orderBy("doc_id")
  }

  /** T13 — VOCABULARY induction: corpus-wide word frequencies, ranked by
    * (count desc, word), top `maxVocab` entries with cumulative coverage
    * of the token stream — the corpus-side preparation for BPE/unigram
    * tokenizer training and OOV-rate estimation.
    *
    * Scale shape: one map-side-combined count shuffle keyed by word; the
    * top-N is `orderBy.limit` — Spark plans TakeOrderedAndProject (each
    * partition keeps N, the driver merges N·partitions rows), never a
    * global sort of the vocabulary — and the rank/coverage window runs on
    * the N surviving rows only. The corpus total rides in as a broadcast
    * 1-row aggregate. */
  def vocabulary(documents: DataFrame, maxVocab: Int = 1000): DataFrame = {
    val counts = documents
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("word")).limit(maxVocab)
    val w = Window.orderBy(col("n").desc, col("word"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__total"))))
      .select(col("word"), col("rank"), col("n"),
        round(col("cum_n").cast("double") / col("__total"), 6).as("coverage"))
      .orderBy("rank")
  }

  /** T15 — vocabulary-COVERAGE stats per document: OOV rate against the
    * top-N corpus vocabulary ([[vocabulary]]) and the mean rank of the
    * in-vocabulary tokens — the oracle-exact form of the CCNet-style
    * unigram-LM quality filter (docs scoring rare-word-heavy or
    * out-of-vocabulary are boilerplate, garbage, or off-distribution).
    * A production deployment swaps −Σ log p(w) surprisal in at this
    * aggregation (one expression change); rank/OOV keeps every column
    * integer-rational so the cross-engine oracle is exact — the same
    * discipline as the md5→xxhash64 hash seam, applied to
    * transcendentals.
    *
    * Scale shape: the vocabulary is top-N (broadcast, plan-parameter
    * sized); the token stream is one explode + broadcast-join + doc-keyed
    * map-side-combined aggregation — the t4 shape, no corpus shuffle
    * beyond the doc key.
    *
    * This inline form re-induces the vocabulary from the scored corpus —
    * the ad-hoc path. The SERVED form below takes a maintained (word,
    * rank) table ([[vocabulary]]'s output at the chosen cut, built once
    * beside the other serving state) so repeated OOV screens — and
    * screens of an INCREMENT against the corpus vocabulary — skip the
    * corpus pass entirely, the same served-state discipline as
    * d5/d9b/e5. */
  def oovStats(documents: DataFrame, maxVocab: Int = 200): DataFrame =
    oovStats(documents, vocabulary(documents, maxVocab).select("word", "rank"))

  /** T15 served form: score `documents` against a maintained `vocab`
    * (word, rank) table. One narrow explode + broadcast join + doc-keyed
    * aggregation — the vocabulary is never re-induced. */
  def oovStats(documents: DataFrame, vocab: DataFrame): DataFrame = {
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("rank").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("rank")).as("sum_rank"),
        count(col("rank")).as("n_invocab"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"),
        when(col("n_invocab") > 0,
          round(col("sum_rank").cast("double") / col("n_invocab"), 4)).as("mean_rank"))
      .orderBy("doc_id")
  }

  /** T18 — BPE merge-rule induction (the Sennrich et al. tokenizer-training
    * loop): `rounds` iterations of "find the most frequent adjacent token
    * pair, merge it corpus-wide", emitting the learned (round, pair, n)
    * merge table.
    *
    * The corpus rides as ONE string column in a sentinel encoding —
    * `␟tok␟␟tok␟…` (U+001F cannot occur in text, pinned by the spec
    * fixture) — so applying a merge is a LITERAL string replace: both
    * Spark's and DuckDB's `replace` scan left-to-right non-overlapping,
    * which is exactly BPE's greedy merge order (self-pairs like "x x x"
    * merge to [xx, x], verified against an independent token-list model in
    * the spec), and the sentinels make token boundaries exact (a token
    * that is a substring of another can never false-match). Merged tokens
    * join with U+001E (record separator) — like the U+001F token sentinel,
    * a control character outside printable text, so a real-corpus token
    * containing the joiner (as 'user@host' would for an '@' joiner) can
    * never masquerade as a merged pair and corrupt later rounds' counts;
    * the sentinel-absence pin in LlmSpec covers both characters.
    *
    * Scale shape: each round is one narrow pair projection (zip_with over
    * the token array — the shuffled rows are constant-width word pairs,
    * never documents), one map-side-combined (pair, n) count whose
    * shuffle is ∝ distinct pairs, a TakeOrdered(1) top pair to the driver
    * (bytes — the centroid-collect discipline), and one codegen'd
    * literal-replace map. Rounds are honestly sequential corpus passes,
    * exactly like e11's Lloyd iterations; a deployment trains on a t6
    * hash-sample and runs thousands of rounds, with the SAME per-round
    * plan. Tie order (n desc, pair asc) is pinned so the merge table is
    * engine-portable. [[bpeEncode]] is the serve side: the merge table,
    * not the corpus, is the training artifact. */
  def bpeMerges(documents: DataFrame, rounds: Int = 3,
      reliableCheckpoints: Boolean = false): DataFrame =
    bpeTrainRounds(
      documents.select(bpeEnc0.as("enc"), lit(1L).as("n")), BpeJoin, rounds,
      reliableCheckpoints)

  /** The shared BPE training loop over a WEIGHTED sentinel-encoded state
    * frame (enc, n): per round one (pair, Σn) map-side-combined count, a
    * TakeOrdered(1) driver scalar, one literal-replace map with lineage
    * truncated by a lazy local checkpoint (so round r never replays the
    * r−1 prior merges from scratch — the DedupOps accumulating-lineage
    * discipline; per-round work stays constant at any `rounds`). Stops at
    * pair exhaustion and emits the realized merges — the oracle's empty
    * top CTE drops the same rounds, and its LEFT JOIN keeps enc
    * unchanged, as here. [[bpeMerges]] feeds it document sequences at
    * weight 1; [[bpeSubwordMerges]] the word-frequency dict. */
  private def bpeTrainRounds(
      init: DataFrame, joiner: String, rounds: Int,
      reliableCheckpoints: Boolean = false): DataFrame = {
    val spark = init.sparkSession
    var state = init
    val merges = Seq.newBuilder[(Long, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val toks = bpeToks(col("enc"))
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      val top = state
        .select(explode(pairs).as("pair"), col("n"))
        .groupBy("pair").agg(sum("n").as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) {
        exhausted = true
      } else {
        val pair = top.head.getString(0)
        merges += ((r.toLong, pair, top.head.getLong(1)))
        // Lineage truncation, not mere persistence: round r's plan would
        // otherwise replay all prior merges from the raw corpus. The
        // default lazy localCheckpoint is executor-memory-resident — an
        // executor death mid-training loses the state frame — so a long
        // cluster run passes reliableCheckpoints=true (requires
        // spark.sparkContext.setCheckpointDir) and survives executor loss
        // at the cost of a per-round disk round-trip, exactly like d6's
        // CC loop. The sample-fed deployment shape (t18e) keeps the state
        // frame vocab-sized, so either mode's per-round cost is tiny.
        val next = state.select(
          bpeApply(col("enc"), pair, joiner).as("enc"), col("n"))
        state = if (reliableCheckpoints) next.checkpoint(eager = false)
          else next.localCheckpoint(false)
        r += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("round", "pair", "n").orderBy("round")
  }

  /** Char-level sentinel encoding of one WORD (t18c/t18d): every
    * character a token. */
  private def bpeCharEnc(w: Column): Column =
    concat(lit(BpeSep), array_join(split(w, ""), BpeSep + BpeSep), lit(BpeSep))

  /** T18d — serve side of [[bpeSubwordMerges]]: tokenize each document
    * with the LEARNED subword merge table (replayed in rule order, the
    * classic BPE apply) and count subword tokens beside the whitespace
    * count. Like [[bpeEncode]], a SINGLE zero-shuffle codegen'd
    * projection: the per-word merge replay runs inside a `transform`/
    * `aggregate` lambda over the word array, with the rules as plan
    * string literals — the tokenizer a training pipeline actually runs
    * over the corpus, priced at scan speed. */
  def bpeSubwordEncode(documents: DataFrame, merges: Seq[String]): DataFrame =
    documents.select(
      col("doc_id"),
      wsTokens(col("text")).as("n_tokens"),
      subwordTokensCol(merges).as("n_subword_tokens"))
      .orderBy("doc_id")

  /** One doc's subword-token count under a learned merge table — the ONE
    * expression [[bpeSubwordEncode]] (t18d/t18e) and [[tokenizerCard]]
    * (t20) share: the per-word rule replay inside a transform/aggregate
    * lambda, rules as plan string literals, zero shuffles. */
  private def subwordTokensCol(merges: Seq[String]): Column = {
    val tokensOfWord = (w: Column) =>
      size(bpeToks(merges.foldLeft(bpeCharEnc(w))(bpeApply(_, _, "")))).cast("long")
    aggregate(split(col("text"), " "), lit(0L), (acc, w) => acc + tokensOfWord(w))
  }

  /** T20 — TOKENIZER DATA CARD per language: fertility (subword tokens
    * per whitespace word) and compression (chars per subword token) of a
    * LEARNED subword merge table, rolled up by language — the standard
    * tokenizer-eval report a pipeline publishes beside t14's corpus card
    * when deciding whether a tokenizer under-serves a language (high
    * fertility = more sequence length spent per word).
    *
    * Every aggregated column is an exact long (the t14 discipline); the
    * two ratios derive from the exact sums at the end. Shape: ONE
    * zero-join narrow projection (the encode with rules as plan
    * literals) + one map-side-combined roll-up keyed by lang. */
  def tokenizerCard(documents: DataFrame, merges: Seq[String]): DataFrame = {
    val t = col("text")
    documents.select(col("lang"),
        wsTokens(t).as("nw"),
        length(t).cast("long").as("nch"),
        subwordTokensCol(merges).as("nst"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
        sum("nch").as("n_chars"), sum("nst").as("n_subword_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_subword_tokens"),
        round(col("n_subword_tokens").cast("double") / col("n_words"), 4)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subword_tokens"), 4)
          .as("chars_per_token"))
      .orderBy("lang")
  }

  /** T18c — CANONICAL character-level BPE (Sennrich et al. Algorithm 1):
    * merge rules learned over the WORD-FREQUENCY DICT, pair counts
    * weighted by word frequency, merged subwords concatenating plainly
    * ("e"+"r" → "er").
    *
    * This is the form tokenizer trainers actually ship, and the scale
    * complement of [[bpeMerges]]: the corpus is touched EXACTLY ONCE (the
    * word-count aggregation, shuffle ∝ distinct words), and every
    * training round runs over the vocab-sized dict — at 100 TB the dict
    * is millions of rows where the corpus is billions, so thousands of
    * rounds are thousands of tiny-frame jobs, not corpus passes. (A
    * deployment may equally collect the dict — MBs — and run the
    * classic in-memory loop; the distributed form is kept here for
    * engine-oracle parity and for dicts past driver memory.) */
  def bpeSubwordMerges(documents: DataFrame, rounds: Int = 3,
      reliableCheckpoints: Boolean = false): DataFrame =
    bpeTrainRounds(
      documents
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .select(bpeCharEnc(col("word")).as("enc"), col("n")),
      "", rounds, reliableCheckpoints)

  /** The BPE sentinel pieces [[bpeMerges]] (train) and [[bpeEncode]]
    * (serve) share — one definition so the two sides cannot drift. */
  private val BpeSep = "\u001f"
  /** Doc-mode merge joiner (t18/t18b): U+001E, a second control char so
    * the encoding's whole alphabet is outside printable text. chr(30) on
    * the oracle side. */
  private val BpeJoin = "\u001e"
  private def bpeEnc0: Column =
    concat(lit(BpeSep), replace(col("text"), lit(" "), lit(BpeSep + BpeSep)), lit(BpeSep))
  private def bpeToks(e: Column): Column =
    split(e.substr(lit(2), length(e) - 2), BpeSep + BpeSep)
  private def bpeApply(e: Column, pair: String, joiner: String = BpeJoin): Column = {
    val Array(a, b) = pair.split(" ", 2)
    replace(e, lit(BpeSep + a + BpeSep + BpeSep + b + BpeSep),
      lit(BpeSep + a + joiner + b + BpeSep))
  }

  /** T18 serve — tokenize with a LEARNED merge table ([[bpeMerges]]'s
    * `pair` column, a driver value like the IVF centroids): fold the
    * merges into one chain of literal replaces and count the resulting
    * BPE tokens per document next to the whitespace token count. The
    * whole operator is a SINGLE narrow codegen'd projection — zero joins,
    * zero shuffles, the merge list riding in the plan as string literals
    * — so serve-side tokenization pipelines into any downstream scan for
    * free; training cost lives in [[bpeMerges]] alone (the e4→e5
    * build/serve discipline). */
  def bpeEncode(documents: DataFrame, merges: Seq[String]): DataFrame = {
    val t = col("text")
    documents.select(
      col("doc_id"),
      wsTokens(t).as("n_tokens"),
      size(bpeToks(merges.foldLeft(bpeEnc0)(bpeApply(_, _)))).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** T14 — per-language CORPUS REPORT (the data-card step): document and
    * token counts, aggregate quality, and the above-threshold share per
    * language. Every column is an exact integer (quality enters as
    * sum-of-round(q·10⁴) longs — the q1 integer-cents discipline) so the
    * report is engine-portable with no float-summation-order hazard.
    * One map-side-combined aggregation keyed by lang. */
  def corpusReport(documents: DataFrame): DataFrame = {
    val t = col("text")
    val padded = concat(lit(" "), t, lit(" "))
    val nTokens = wsTokens(t)
    val nStop = substrCount(padded, " the ") + substrCount(padded, " a ")
    val quality = round(least(nTokens.cast("double") / lit(100.0), lit(1.0)) * 0.5 +
      (nStop.cast("double") / nTokens) * 0.5, 4)
    documents
      .select(col("lang"), nTokens.as("n_tokens"),
        round(quality * 10000).cast("long").as("q4"),
        (quality >= 0.5).cast("long").as("above"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("q4")).as("sum_quality_x10k"), sum(col("above")).as("n_above_half"))
      .orderBy("lang")
  }
}
