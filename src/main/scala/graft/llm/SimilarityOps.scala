package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * ARRAY<FLOAT>`).
  *
  * E1 is the exact brute-force baseline: broadcast the (small) query set
  * against the corpus — a broadcast-nested-loop whose cost is
  * |queries|·|corpus|, the right plan when queries are few. E2 is the scale
  * path: sign-random-projection LSH buckets the corpus once (one narrow
  * pass), and each query only scans its own bucket — at 1000 executors the
  * corpus stays partitioned by bucket and queries route to one partition.
  * An IVF variant would swap the bucket function for k-means cell ids; the
  * plumbing is identical.
  *
  * All dot products run through codegen'd higher-order functions
  * (`aggregate`/`zip_with`), no UDFs, computed in double.
  */
object SimilarityOps {

  /** Codegen'd dot product (graft.functions.DotProductExpr) — registered
    * per-session by [[graft.functions.GraftFunctions.register]]; callers in
    * this object register on their input's session first. */
  private def dotExpr(a: String, b: String): String = s"graft_dot($a, $b)"

  private def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  /** `a / (na · nb)` over PRECOMPUTED norm columns: every pair/scan site
    * used to inline `normExpr` on both sides, recomputing each vector's
    * norm once per PAIR (up to maxCell−1 times per vector in the
    * quadratic stages — three dim-length dot products per pair where one
    * suffices). Precomputing the norm per ROW before the join is the
    * identical double arithmetic in the identical order
    * (dot / (sqrt(dot_aa) · sqrt(dot_bb))), so scores — and the 6-dp
    * rounded values the oracles compare — are bit-identical. */
  private def cosOver(a: String, b: String, na: String, nb: String): String =
    s"${dotExpr(a, b)} / ($na * $nb)"

  /** E1 — exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ties broken by neighbor id. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("q_norm", expr(normExpr("q_emb")))
    val joined = embeddings.withColumn("e_norm", expr(normExpr("embedding")))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(cosOver("q_emb", "embedding", "q_norm", "e_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** E13 — FILTERED vector search, brute-force form: top-k among the
    * corpus vectors whose id passes `allowed` (the vector-store
    * "filtered search" feature — retrieval restricted to a language /
    * license / split). PRE-filter semantics, the correct top-k: the
    * semi join lands BEFORE ranking, so a selective filter still yields
    * k results — post-filtering a plain top-k under-returns exactly
    * when the filter matters most. The query need not pass the filter
    * (searching the English corpus from a non-English probe is legal).
    * At scale the semi join prunes the corpus scan (doc_id-bucketed
    * both sides at deployment) and everything downstream is e1's
    * broadcast-query cross. */
  def filteredTopK(embeddings: DataFrame, allowed: DataFrame,
      queries: DataFrame, k: Int): DataFrame =
    bruteForceTopK(
      embeddings.join(allowed.select("vec_id"), Seq("vec_id"), "left_semi"),
      queries, k)

  /** E13b — filtered search on the SERVED IVF index: the same pre-filter
    * semantics with the allowed-id semi join applied to the index's CELL
    * LIST (centroids untouched — the filter changes which members rank,
    * not the geometry), then e5's probe-and-rank. RECALL CAVEAT (the
    * documented-approximation honesty rule, d4/d2-style): this is still
    * an ANN — only nProbe cells are searched, and a SELECTIVE filter
    * whose survivors cluster in unprobed cells returns fewer than k (the
    * spec pins this). Production filtered-ANN systems compensate by
    * widening nProbe with selectivity (allowed-fraction f → probe
    * ~nProbe/f cells) — the dial is this function's parameter; e13's
    * brute form is the exact baseline when the filter is too selective
    * to probe around. At deployment the (cell)-bucketed member table
    * makes the semi join a bucket-local prune. */
  def ivfFilteredTopK(index: IvfIndex, allowed: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame =
    ivfQueryTopK(
      index.copy(cells = index.cells
        .join(allowed.select("vec_id"), Seq("vec_id"), "left_semi")),
      queries, k, nProbe)

  /** The e13b SELECTIVITY DIAL as exact integer arithmetic — ONE
    * definition for the engine, the serving wrapper and (mirrored) the
    * oracle, so no float-ceil can drift between them: allowed fraction
    * f = nAllowed/nTotal → probe ceil(nProbe/f) = ⌈nProbe·nTotal /
    * nAllowed⌉ cells, floored at nProbe, capped at min(nCells,
    * maxProbe). nAllowed = 0 guards to 1 (the result is empty at any
    * probe width, so the dial's value is immaterial — it must only not
    * divide by zero). */
  def adaptiveProbeWidth(nProbe: Int, nAllowed: Long, nTotal: Long,
      nCells: Int, maxProbe: Int = Int.MaxValue): Int = {
    val denom = math.max(nAllowed, 1L)
    val widened =
      math.max(nProbe.toLong, (nProbe.toLong * nTotal + denom - 1L) / denom)
    math.min(math.min(nCells.toLong, maxProbe.toLong), widened).toInt
  }

  /** E13c — filtered search on the served index with the ADAPTIVE probe
    * width production filtered-ANN systems use (the dial e13b's recall
    * caveat documents, as code): a filter keeping fraction f of the
    * corpus leaves each probed cell ~f·full, so holding nProbe fixed
    * under-returns exactly when the filter is selective — probing
    * ~nProbe/f cells restores the expected candidate volume. The
    * fraction is ONE count ratio: the allowed member count over the
    * corpus count — `totalCount` lets a serving caller pass the
    * maintained cell-stats sum ([[graft.streaming.VectorStream
    * .filteredTopK]] does — bytes, never a corpus pass); the allowed
    * count reads the same semi-joined frame the query scans anyway
    * (bucket-pruned at deployment). Fixed-nProbe behavior stays
    * available as [[ivfFilteredTopK]], the explicit-parameter path;
    * recall recovery on the clustered-filter fixture is spec-pinned. */
  def ivfFilteredTopKAdaptive(index: IvfIndex, allowed: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 2,
      maxProbe: Int = Int.MaxValue,
      totalCount: Option[Long] = None): DataFrame = {
    // tracked-persisted: the count below and the probe-and-rank both scan
    // the filtered members — without the pin the semi join runs twice
    val filtered = DedupOps.tracked(index.cells
      .join(allowed.select("vec_id"), Seq("vec_id"), "left_semi"))
    val nAllowed = filtered.count()
    val nTotal = totalCount.getOrElse(index.cells.count())
    // an EMPTY allow-set is known-empty at any probe width: skip the
    // widening entirely (the dial would max out and probe every cell to
    // rank zero members) — nProbe over the empty member frame costs
    // nothing and keeps the output schema; the pure dial arithmetic
    // above stays the oracle's exact mirror
    val np =
      if (nAllowed == 0L) nProbe
      else adaptiveProbeWidth(nProbe, nAllowed, nTotal,
        index.centroids.length, maxProbe)
    ivfQueryTopK(index.copy(cells = filtered), queries, k, np)
  }

  /** Deterministic hyperplanes for sign-random-projection LSH, generated
    * from a fixed integer recurrence so the DuckDB oracle can inline the
    * same constants. */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, d) =>
      (((j * 131 + d * 31 + 7) % 211) - 105) / 105.0
    }

  /** Bucket id = sign bits of the projections onto `nPlanes` hyperplanes.
    * Hyperplanes ride in as `typedlit` array literals (one constant node
    * each), NOT parsed element lists: the expression tree — and therefore
    * the whole-stage-codegen source — is identical for every query, so
    * Janino compiles the bucketing stage once per JVM instead of once per
    * query (the same structure-stable-literal rule as the IVF centroids). */
  def bucketCol(vec: Column, nPlanes: Int, dim: Int): Column = {
    val hps = hyperplanes(nPlanes, dim)
    hps.zipWithIndex.map { case (p, j) =>
      when(call_function("graft_dot", vec, typedlit(p.toSeq)) >= 0d,
        lit(1 << (nPlanes - 1 - j))).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** E2 — LSH-bucketed approximate top-k with MULTI-PROBE: corpus and
    * queries are bucketed by the same hyperplane signs; each query searches
    * its own bucket plus every bucket at Hamming distance 1 (a vector near
    * a hyperplane lands on either side with ~even odds, so the adjacent
    * sign-flips hold most of the missed neighbors — multi-probe LSH, Lv et
    * al. VLDB'07). Probing 1+nPlanes of 2^nPlanes buckets instead of 1
    * multiplies the searched fraction by (nPlanes+1) while recall jumps
    * disproportionately; the recall/cost dial is probe depth, not index
    * rebuild. Corpus side is still bucketed once — only the tiny query set
    * fans out. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("bucket", bucketCol(col("embedding"), nPlanes, dim))
    val q = queries
      .withColumn("home", bucketCol(col("embedding"), nPlanes, dim))
      .withColumn("bucket", explode(expr(
        s"array(home, ${(0 until nPlanes).map(j => s"home ^ ${1 << j}").mkString(", ")})")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
      .withColumn("q_norm", expr(normExpr("q_emb")))
    val joined = bucketed.withColumn("e_norm", expr(normExpr("embedding")))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(cosOver("q_emb", "embedding", "q_norm", "e_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** E4 — IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCells` Voronoi cells by a small k-means, then search only the
    * `nProbe` cells nearest to each query. The clustering loop collects
    * K×dim centroid floats to the driver per iteration — bytes, the same
    * "tiny plan parameter" pattern as the scan bounds — while all per-vector
    * work (assignment, per-cell averaging, search) is distributed and
    * codegen'd via graft_dot.
    *
    * Deterministic AND oracle-portable: seeded from the first K vectors by
    * id; `iterations` assignment passes with `iterations-1` mean updates in
    * between, so the final pass doubles as the search index (no extra
    * corpus pass); per-dimension means are rounded to 6 dp so the
    * engine-dependent float-summation order of `avg` (Spark partial aggs
    * vs DuckDB) cannot leak low-order-bit divergence into later
    * assignments. The matching DuckDB oracle unrolls the same passes as
    * chained CTEs ([[graft.oracle.Oracles]] `e4_ivf_topk`). */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 2, iterations: Int = 2): DataFrame =
    ivfQueryTopK(ivfBuild(embeddings, nCells, iterations), queries, k, nProbe)

  /** The materialized IVF index: centroid matrix (K×dim doubles — a plan
    * parameter) + the cell-assigned corpus, the two artifacts a serving
    * deployment persists (centroids to config/small table, cells to a
    * cell-partitioned table) so query time pays probing only. */
  final case class IvfIndex(centroids: Array[Array[Double]], cells: DataFrame)

  // Centroids ride in as single array-literals (typedlit), not inlined
  // element lists: the expression TREE is identical across iterations, so
  // whole-stage codegen compiles once and is cache-hit for every
  // subsequent Lloyd's round (inlined literals re-trigger Janino per
  // iteration — 3× compile cost for zero benefit).
  private def dotCol(vec: Column, c: Array[Double]): Column =
    call_function("graft_dot", vec, typedlit(c.toSeq))
  private def scoreStructs(vec: Column, centroids: Array[Array[Double]]): Seq[Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      // argmin of squared distance == argmax of 2·dot(v,c) − ||c||²;
      // rounded to 6 dp (like the means) so a near-tie between cells is
      // decided on values that are identical in the DuckDB mirror rather
      // than on engine-dependent low-order float bits
      struct(round(dotCol(vec, c) * 2.0d - cc, 6).as("s"), lit(i).as("cell"))
    }.toSeq
  /** Nearest-centroid id as ONE codegen'd loop (`graft_nearest`) — the
    * same (score, cell) struct-max semantics as
    * `array_max(array(scoreStructs(...))).getField("cell")` (ties to the
    * larger cell, 6-dp rounded scores), but with the codebook as a
    * reference object instead of K inlined score structs, so m·K-wide
    * encode projections stay inside whole-stage codegen (the SCALE.md
    * PQ-fallback fix). */
  private def nearestCol(vec: Column, centroids: Array[Array[Double]]): Column =
    call_function("graft_nearest", vec, typedlit(centroids.map(_.toSeq).toSeq))

  /** The composed struct-max formulation [[nearestCol]] replaced — kept as
    * the AUDIT definition (the sqlShingleArrays/hofSignatures discipline):
    * LlmSpec asserts graft_nearest is bit-identical to it, including the
    * 6-dp rounding and tie-to-larger-cell order, on real embeddings and on
    * constructed ties. Not used by any operator. */
  def structMaxNearest(vec: Column, centroids: Array[Array[Double]]): Column =
    array_max(array(scoreStructs(vec, centroids): _*)).getField("cell")

  /** E4/E5 build phase — the Lloyd loop; the final assignment pass is the
    * index itself (same centroids the probes are scored against). */
  def ivfBuild(embeddings: DataFrame, nCells: Int = 16,
      iterations: Int = 2): IvfIndex = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    def assign(centroids: Array[Array[Double]]): DataFrame = embeddings
      .withColumn("cell", nearestCol(col("embedding"), centroids))

    // seed: first nCells vectors by id
    var centroids: Array[Array[Double]] = embeddings
      .orderBy("vec_id").limit(nCells)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

    for (_ <- 1 until iterations) {
      // distributed mean per cell (explode dims → avg), tiny result
      val means = assign(centroids)
        .select(col("cell"), posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(round(avg("x"), 6).as("m"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        old.indices.map(d => means.getOrElse((i, d), old(d))).toArray
      }
    }
    IvfIndex(centroids, assign(centroids))
  }

  /** Assign vectors to an EXISTING centroid set (no reclustering) — one
    * narrow codegen'd map. */
  def ivfAssign(vectors: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    vectors.withColumn("cell", nearestCol(col("embedding"), centroids))
  }

  /** E5b — INCREMENTAL index maintenance: fold new vectors into a served
    * IVF index by assigning them to the FROZEN centroids and appending to
    * the cell table — the standard IVF `add` (FAISS-style): no recluster,
    * no touch of existing cells. Per-increment cost is one narrow map over
    * the new vectors plus an append; at deployment the cell table is
    * cell-partitioned and the append writes only the touched cells'
    * partitions. Centroid drift under sustained appends is the documented
    * operational dial (periodic offline re-build = [[ivfBuild]], the same
    * compaction discipline as the dedup index). */
  def ivfAppend(index: IvfIndex, newVectors: DataFrame): IvfIndex =
    index.copy(cells = index.cells.unionByName(
      ivfAssign(newVectors, index.centroids)))

  /** E9 — CENTROID-DRIFT dial for the maintained index: [[ivfAppend]]'s
    * documented "periodic offline rebuild" gets an observable trigger.
    * Per segment — the index's stored cells vs a candidate increment
    * assigned on the FROZEN centroids — the vector count and mean cosine
    * to the assigned centroid. A healthy append scores the increment ≈
    * the corpus; a distribution shift drags the increment's mean down,
    * and the operational dial is "rebuild when corpus − increment exceeds
    * ε". Cross-engine exact: per-vector cos is 6-dp rounded, scaled to a
    * ×1e6 long and summed exactly (the q1/t14 integer-cents discipline);
    * the mean is one final division.
    *
    * Scale shape: one narrow codegen'd map per vector (increment
    * assignment is e5b's add path, the corpus rides its stored cells; the
    * K×dim centroid matrix is a typedlit plan parameter) into a 2-row
    * map-side-combined aggregation. Nothing is ever re-clustered. */
  def ivfDriftStats(index: IvfIndex, newVectors: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(newVectors.sparkSession)
    val centMatrix = typedlit(index.centroids.map(_.toSeq).toSeq)
    val all = index.cells.select(col("vec_id"), col("cell"), col("embedding"))
      .withColumn("segment", lit("corpus"))
      .unionByName(ivfAssign(newVectors, index.centroids)
        .select(col("vec_id"), col("cell"), col("embedding"))
        .withColumn("segment", lit("increment")))
    all
      .withColumn("cv", element_at(centMatrix, col("cell") + 1))
      .withColumn("c6", round(round(
        call_function("graft_dot", col("embedding"), col("cv")) /
          (sqrt(call_function("graft_dot", col("embedding"), col("embedding"))) *
            sqrt(call_function("graft_dot", col("cv"), col("cv")))), 6) * 1000000)
        .cast("long"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_vectors"), sum("c6").as("sum_cos_x1m"))
      .withColumn("mean_cos", round(
        col("sum_cos_x1m").cast("double") / (col("n_vectors") * 1000000.0d), 6))
      .orderBy("segment")
  }

  /** E4/E5 serve phase — probe the `nProbe` nearest cells per query and
    * rank exactly within them. Touches only the probed cells' rows; the
    * corpus is never rescored or reassigned. */
  def ivfQueryTopK(index: IvfIndex, queries: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val probesCol = slice(
      reverse(array_sort(array(scoreStructs(col("q_emb"), index.centroids): _*))),
      1, nProbe).getField("cell")
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("cell", explode(probesCol))
      .withColumn("q_norm", expr(normExpr("q_emb")))
    val joined = index.cells.withColumn("e_norm", expr(normExpr("embedding")))
      .join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // 6-dp rounded so the final ranking breaks ties on values identical
      // to the oracle's, not on engine-dependent float summation order
      .withColumn("cos", round(expr(
        cosOver("q_emb", "embedding", "q_norm", "e_norm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** E6 — kNN AUTO-LABELING over the served IVF index: classify a query
    * set by majority vote of its k approximate nearest labeled neighbors
    * (ties → the smaller label id, deterministic). This is the
    * label-propagation shape production pipelines use to scale a small
    * human/LLM-annotated seed set to corpus size (the FineWeb-Edu /
    * quality-classifier pattern: annotate thousands, auto-label billions).
    *
    * Scale shape: neighbor search is [[ivfQueryTopK]] — probed cells only,
    * corpus never rescored; the vote join BROADCASTS the (queries × k)
    * top-k frame against the corpus-side label table (one narrow scan, no
    * corpus shuffle — the d8 broadcast direction); the vote aggregation
    * holds ≤ k rows per query. Label width: votes are (query, label)
    * counts — map-side combinable, bytes per query. */
  def knnClassify(index: IvfIndex, queries: DataFrame, labeled: DataFrame,
      k: Int = 5, nProbe: Int = 2): DataFrame = {
    val topk = ivfQueryTopK(index, queries, k, nProbe)
    val votes = labeled.select(col("vec_id").as("neighbor_id"), col("label"))
      .join(broadcast(topk), "neighbor_id")
      .groupBy("query_id", "label").agg(count(lit(1)).as("n_votes"))
    // argmax(n_votes), tie → min label: labels are small non-negative ints
    val pred = votes.groupBy("query_id")
      .agg(max_by(struct(col("label"), col("n_votes")),
        struct(col("n_votes"), -col("label"))).as("p"))
      .select(col("query_id"), col("p.label").as("pred_label"),
        col("p.n_votes").as("n_votes"))
    pred.join(queries.select(col("vec_id").as("query_id"), col("label")), "query_id")
      .select(col("query_id"), col("label").cast("long").as("label"),
        col("pred_label").cast("long").as("pred_label"), col("n_votes"))
      .orderBy("query_id")
  }

  /** E7 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication in embedding space, served from the SAME maintained IVF
    * index as e5/e6. The recipe clusters precisely to bound the quadratic:
    * only within-cell pairs are cosine-compared (Σ cell² work, never
    * corpus²), pairs ≥ threshold are connected into groups (d6's CC
    * machinery on vec ids), and per group the paper's diversity-preserving
    * choice KEEPS the member LEAST similar to its cell centroid (ties to
    * the lower vec_id) — near-identical points collapse to the one
    * farthest from the cluster's center of mass.
    *
    * Scale shape: the pair front shuffles on `cell` (the index's serving
    * partitioning, so co-located at deployment); cos-to-centroid is one
    * narrow codegen'd map with the K×dim centroid matrix riding as a
    * typedlit plan parameter; group resolution inherits d6's
    * pointer-doubling bounds on (vec, label) longs. Scores are 6-dp
    * rounded so threshold and keeper ties break on oracle-identical
    * values.
    *
    * Cell-size rail (d3b's maxBucket / d4's maxDf discipline): the
    * within-cell pair join is quadratic in the largest cell, and a corpus
    * of thousands of near-identical embeddings — exactly what SemDeDup
    * targets — collapses into ONE Voronoi cell. Cells above `maxCell`
    * members are excluded from pair generation (their vectors degrade to
    * singleton keeps, never disappear), capping the worst cell at
    * maxCell² pairs. The prune is mirrored in the oracle; the production
    * dial for a corpus that trips it is pre-collapsing exact-duplicate
    * vectors first ([[exactVectorDedup]] — the d1-before-d2 ordering
    * applied to embeddings) or a finer-K rebuild. */
  def semanticDedup(index: IvfIndex, threshold: Double,
      maxCell: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(index.cells.sparkSession)
    val centMatrix = typedlit(index.centroids.map(_.toSeq).toSeq)
    val cells = index.cells.select(col("vec_id"), col("cell"), col("embedding"))
    val withCos = cells
      .withColumn("cv", element_at(centMatrix, col("cell") + 1))
      .withColumn("cos_centroid", round(
        call_function("graft_dot", col("embedding"), col("cv")) /
          (sqrt(call_function("graft_dot", col("embedding"), col("embedding"))) *
            sqrt(call_function("graft_dot", col("cv"), col("cv")))), 6))
      .select("vec_id", "cell", "cos_centroid")
    // keys-sized (≤ K rows) cell-size frame → broadcast; at deployment
    // these are the cell-partitioned table's free partition statistics
    val okCells = cells.groupBy("cell").agg(count(lit(1)).as("n_cell"))
      .filter(col("n_cell") <= maxCell).select("cell")
    val paired = cells.join(broadcast(okCells), Seq("cell"))
      .withColumn("nrm", expr(normExpr("embedding")))
    val a = paired.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("norm_a"))
    val b = paired.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("norm_b"))
    val pairs = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(expr(
        cosOver("emb_a", "emb_b", "norm_a", "norm_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b")
    val groups = DedupOps.nearDupGroups(
      cells.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("group_id"))
    val members = withCos.join(groups, "vec_id")
    val winners = members.groupBy("group_id")
      .agg(min_by(col("vec_id"), struct(col("cos_centroid"), col("vec_id"))).as("keep_id"))
    members.join(winners, "group_id")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("group_id"), col("cos_centroid"),
        (col("vec_id") === col("keep_id")).as("keep"))
      .orderBy("vec_id")
  }

  /** The SEMANTIC admission screen (e7 ∘ e5b): near-dup pairs between an
    * increment's vectors and the SERVED IVF index, without rescoring the
    * corpus against itself. New vectors are assigned to the FROZEN
    * centroids (one narrow codegen'd map — e5b's `add` path); candidates
    * are within-cell only: served-cells-vs-new (joined on `cell`, the
    * index's serving partitioning, so only the increment shuffles at
    * deployment) plus new-vs-new. Returns (id_a, id_b, cos) with the
    * corpus member as id_a REGARDLESS of numeric id order (the d5
    * orientation lesson) and the lower id first within the increment.
    * Requires corpus and increment vec ids to be disjoint (the admission
    * pipeline guarantees it, as for d5/d9b).
    *
    * The `maxCell` rail uses COMBINED (corpus + increment) cell
    * populations. Pass `corpusCellStats` — a maintained (cell, n) table
    * of sum-mergeable partials (keys-sized: K rows per admitted batch;
    * [[graft.streaming.VectorStream]] keeps one beside the cells) — and
    * the corpus cells table is never aggregated here; without it the
    * sizes come from one column-pruned pass over the cells (the ad-hoc
    * batch form — at deployment they are free partition statistics on a
    * cell-partitioned table). Mirrored in the c2b oracle either way
    * (combined counts are identical). */
  def semanticScreen(index: IvfIndex, newVectors: DataFrame,
      threshold: Double, maxCell: Int = 256,
      corpusCellStats: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(newVectors.sparkSession)
    val newCells = ivfAssign(newVectors, index.centroids)
      .select(col("vec_id"), col("cell"), col("embedding"))
    val corpus = index.cells.select(col("vec_id"), col("cell"), col("embedding"))
    val corpusSizes = corpusCellStats
      .map(_.groupBy("cell").agg(sum("n").as("nc")))
      .getOrElse(corpus.groupBy("cell").agg(count(lit(1)).as("nc")))
    val newSizes = newCells.groupBy("cell").agg(count(lit(1)).as("nn"))
    val okCells = corpusSizes.join(newSizes, Seq("cell"), "full")
      .filter(coalesce(col("nc"), lit(0L)) + coalesce(col("nn"), lit(0L)) <= maxCell)
      .select("cell")
    val cp = corpus.join(broadcast(okCells), Seq("cell"))
      .withColumn("nrm", expr(normExpr("embedding")))
    val nc = newCells.join(broadcast(okCells), Seq("cell"))
      .withColumn("nrm", expr(normExpr("embedding")))
    def sideA(df: DataFrame): DataFrame = df.select(col("cell"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("norm_a"))
    def sideB(df: DataFrame): DataFrame = df.select(col("cell"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("norm_b"))
    val vsCorpus = sideA(cp).join(sideB(nc), Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
    val vsNew = sideA(nc).join(sideB(nc), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
    vsCorpus.unionByName(vsNew)
      .withColumn("cos", round(expr(
        cosOver("emb_a", "emb_b", "norm_a", "norm_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** D8b — SEMANTIC decontamination: flag corpus documents whose
    * embedding is within cosine `threshold` of any held-out benchmark
    * embedding — the embedding-tier complement of the k-gram collision
    * rule (d8): n-gram screens miss PARAPHRASED benchmark leakage, while
    * cosine over the served IVF index catches it. Benchmark vectors are
    * assigned to the index's FROZEN centroids (one narrow map over the
    * benchmark — the e5b add discipline) and compared within their cell
    * only, under the combined-population maxCell rail ([[semanticScreen]]'s).
    * Output mirrors d8: one (doc_id, bench_id, cos) row per collision —
    * a benchmark doc whose embedding already sits in the corpus flags its
    * copy, the same self-flagging contract as c2.
    *
    * Decontamination is a RECALL problem (a missed collision silently
    * inflates evals), so each benchmark vector probes its `nProbe`
    * nearest cells — [[ivfQueryTopK]]'s probe front, not just the home
    * assignment: moderate-similarity paraphrases routinely live one cell
    * over. The dial trades scan volume for recall exactly as in e4/e5.
    *
    * Scale shape: the benchmark is small by construction (eval sets are
    * thousands of docs), so only the cells benchmark vectors probe are
    * touched; per-cell pair volume is bounded by the combined-population
    * maxCell rail (corpus members + bench probes); the corpus enters only
    * through its maintained cells table (or the (cell, n) stats side) and
    * is never shuffled on a new key. */
  def semanticContamination(index: IvfIndex, benchVectors: DataFrame,
      threshold: Double, nProbe: Int = 2, maxCell: Int = 256,
      corpusCellStats: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(benchVectors.sparkSession)
    val probesCol = slice(
      reverse(array_sort(array(scoreStructs(col("emb_b"), index.centroids): _*))),
      1, nProbe).getField("cell")
    val bench = benchVectors
      .select(col("vec_id").as("bench_id"), col("embedding").as("emb_b"))
      .withColumn("cell", explode(probesCol))
    val corpus = index.cells
      .select(col("cell"), col("vec_id").as("doc_id"), col("embedding").as("emb_a"))
    val corpusSizes = corpusCellStats
      .map(_.groupBy("cell").agg(sum("n").as("nc")))
      .getOrElse(corpus.groupBy("cell").agg(count(lit(1)).as("nc")))
    val benchSizes = bench.groupBy("cell").agg(count(lit(1)).as("nb"))
    val okCells = corpusSizes.join(benchSizes, Seq("cell"), "full")
      .filter(coalesce(col("nc"), lit(0L)) + coalesce(col("nb"), lit(0L)) <= maxCell)
      .select("cell")
    corpus.join(broadcast(okCells), Seq("cell"))
      .withColumn("norm_a", expr(normExpr("emb_a")))
      .join(bench.join(broadcast(okCells), Seq("cell"))
        .withColumn("norm_b", expr(normExpr("emb_b"))), Seq("cell"))
      .filter(col("doc_id") =!= col("bench_id"))
      .withColumn("cos", round(expr(
        cosOver("emb_a", "emb_b", "norm_a", "norm_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("doc_id"), col("bench_id"), col("cos"))
      .orderBy("doc_id", "bench_id")
  }

  /** E8 — CLUSTER-BALANCED sampling: a diversity-preserving subset of `n`
    * vectors drawn round-robin across the served IVF index's cells (every
    * cell contributes its 1st pick before any contributes its 2nd, rounds
    * tie-broken by cell then id), per-cell order by the t6 salted-hash
    * draw — deterministic, repartition-stable, engine-portable. The
    * embedding-space analog of t8's quota mix: a uniform sample
    * over-represents dense regions, while round-robin over Voronoi cells
    * equalizes coverage of the space — the cluster-based selection shape
    * of data-pruning pipelines (SemDeDup/SSL-prototype class).
    *
    * Scale shape: the per-cell rank shuffles on `cell` (the index's
    * serving partitioning — co-located at deployment); rows that can
    * possibly be picked are pre-filtered to rank ≤ n BEFORE the global
    * pick window, so the single-reducer window sees ≤ n·K rows — a plan
    * parameter, never the corpus. */
  def clusterBalancedSample(index: IvfIndex, n: Int, salt: String = "e8"): DataFrame = {
    require(n > 0, s"bad sample size $n")
    val h = TextOps.h60(concat(lit(salt), lit("-"), col("vec_id")))
    val byCell = Window.partitionBy("cell").orderBy(h.asc, col("vec_id").asc)
    val ranked = index.cells.select(col("vec_id"), col("cell"))
      .withColumn("r", row_number().over(byCell).cast("long"))
      .filter(col("r") <= n)
    val pick = Window.orderBy(col("r"), col("cell"), col("vec_id"))
    ranked.withColumn("pick", row_number().over(pick).cast("long"))
      .filter(col("pick") <= n)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("r"), col("pick"))
      .orderBy("pick")
  }

  /** E10 — EXACT vector dedup: one keeper (min vec_id) per bit-identical
    * embedding, plus its multiplicity — the d1-before-d2 pipeline
    * ordering applied to the embedding tier. Run BEFORE SemDeDup: a
    * thousand exact copies (re-crawled pages embedded twice, augmented
    * repeats) then contribute ONE representative to [[semanticDedup]]'s
    * within-cell pair front instead of 10⁶/2 pairs — and never trip the
    * maxCell rail — while `n_copies` carries the weight a loss-
    * reweighting or dedup-accounting pipeline needs.
    *
    * Scale shape: ONE map-side-combinable aggregation keyed by the
    * vector value itself — Spark hashes/compares arrays natively in
    * codegen, so there is no float→string round trip and the only
    * movement is the grouping shuffle. The sf fixture carries no exact
    * duplicates, so the oracle gates the identity case (cross-engine
    * array-equality grouping included); the collapse semantics are
    * LlmSpec-gated on seeded duplicates. */
  def exactVectorDedup(embeddings: DataFrame): DataFrame =
    embeddings.groupBy(col("embedding"))
      .agg(min("vec_id").as("vec_id"), count(lit(1)).as("n_copies"))
      .select("vec_id", "n_copies")
      .orderBy("vec_id")

  /** A product-quantization index: `codebooks(s)` is subspace `s`'s
    * K×(dim/m) centroid matrix — a bytes-sized plan parameter, the same
    * collect class as the IVF centroids — and `codes` carries one small
    * int per subspace per vector: the m-code compressed corpus. */
  case class PqIndex(codebooks: Seq[Array[Array[Double]]], codes: DataFrame)

  /** E11 build — PRODUCT QUANTIZATION (the Jégou et al. PQ recipe): split
    * the vector into `m` contiguous subspaces and k-means each
    * independently (the [[ivfBuild]] Lloyd recipe per subspace —
    * identical seeding, pass count and 6-dp mean rounding, so the DuckDB
    * mirror is the same chain over sliced arrays); a vector's code is its
    * per-subspace nearest-centroid id. The coded corpus stores m small
    * ints instead of dim floats — at 100 TB that is the difference
    * between scanning dim×4 bytes and ~m bytes per vector (a ~4·dim/m×
    * compression) that keeps the searchable corpus cache-resident where
    * raw embeddings never could be. Encoding is ONE narrow codegen
    * projection (m nearest-centroid argmaxes) — no join, no shuffle.
    *
    * The m Lloyd loops SHARE their corpus passes: because every subspace
    * seeds from the same first-K vectors and its mean updates touch
    * disjoint (subspace, cell, dim) groups, the build runs ONE seed
    * collect (K full vectors, sliced driver-side) and ONE
    * exploded-by-subspace mean aggregation per iteration covering all m
    * subspaces — O(iterations) corpus passes total, not O(m·iterations).
    * Driver-held state stays m·K×(dim/m) centroid doubles, the
    * bytes-sized plan-parameter class. */
  def pqBuild(embeddings: DataFrame, m: Int = 4, k: Int = 16,
      iterations: Int = 2): PqIndex = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // seed: first k vectors by id, each sliced into its m subvectors —
    // identical to seeding each subspace chain from the same k ids. A
    // corpus smaller than k shrinks K to the corpus (ivfBuild's implicit
    // behavior — the seed collect returns what exists).
    val seedRows = embeddings.orderBy("vec_id").limit(k)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val kEff = seedRows.length
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m, kEff)((s, i) => seedRows(i).slice(s * sub, (s + 1) * sub))
    for (_ <- 1 until iterations) {
      // one shared pass: assign every subspace, stack (s, cell, subvec),
      // average per (s, cell, d) — groups are disjoint across subspaces,
      // so the arithmetic is identical to m independent Lloyd updates
      val stacked = embeddings.select(explode(array((0 until m).map { s =>
        val v = slice(col("embedding"), s * sub + 1, sub)
        struct(lit(s).as("s"), nearestCol(v, codebooks(s)).as("cell"),
          v.cast("array<double>").as("v"))
      }: _*)).as("r")).select(col("r.s"), col("r.cell"), col("r.v"))
      val means = stacked
        .select(col("s"), col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("s", "cell", "d").agg(round(avg("x"), 6).as("m"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
      codebooks = Array.tabulate(m, kEff) { (s, i) =>
        val old = codebooks(s)(i)
        old.indices.map(d => means.getOrElse((s, i, d), old(d))).toArray
      }
    }
    PqIndex(codebooks.toSeq, pqEncode(embeddings, codebooks.toSeq))
  }

  /** Encode vectors on FROZEN codebooks — one narrow codegen projection
    * (m nearest-centroid argmaxes), the e5b `add` discipline applied to
    * codes: appends never re-train. `carry` names extra columns to keep
    * beside the codes (e.g. the IVF `cell` for an IVFADC side). */
  def pqEncode(vectors: DataFrame, codebooks: Seq[Array[Array[Double]]],
      carry: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val m = codebooks.size
    val sub = codebooks.head.head.length
    vectors.select(
      (col("vec_id") +: carry.map(col)) ++ (0 until m).map { s =>
        nearestCol(slice(col("embedding"), s * sub + 1, sub), codebooks(s))
          .as(s"code_$s")
      }: _*)
  }

  /** The ADC score column — asymmetric cosine between the full-precision
    * query (`q_emb`) and a coded corpus row (`code_0..code_{m-1}`): Σ over
    * subspaces of dot(query subvector, codebook centroid of the code),
    * normalized by the query norm and the reconstruction's norm, rounded
    * 6 dp (oracle-portable). Codebooks ride in as `typedlit` plan
    * literals indexed in-plan by the code columns; the per-code
    * reconstruction norm indexes PRECOMPUTED per-subspace centroid
    * self-dot arrays (K doubles each, driver-computed — the codebook is a
    * constant, so its self-dots are too), halving the per-row lookups vs
    * re-deriving them from the codebook literal. */
  private def adcCol(codebooks: Seq[Array[Array[Double]]]): Column = {
    val m = codebooks.size
    val sub = codebooks.head.head.length
    def cbAt(s: Int): Column = element_at(
      typedlit(codebooks(s).map(_.toSeq).toSeq), col(s"code_$s") + 1)
    val selfDots = codebooks.map(_.map(c => c.map(x => x * x).sum).toSeq)
    val approxDot = (0 until m).map { s =>
      call_function("graft_dot", slice(col("q_emb"), s * sub + 1, sub), cbAt(s))
    }.reduce(_ + _)
    val reconNormSq = (0 until m).map { s =>
      element_at(typedlit(selfDots(s)), col(s"code_$s") + 1)
    }.reduce(_ + _)
    val qNorm = sqrt(call_function("graft_dot", col("q_emb"), col("q_emb")))
    round(approxDot / (qNorm * sqrt(reconNormSq)), 6)
  }

  private def adcRankTail(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** E11 — ADC (asymmetric-distance) top-k over the coded corpus: the
    * query stays full precision, the corpus contributes ONLY its codes.
    * The scan side reads codes only (never raw embeddings), per-row work
    * is m array lookups + m subvector dots (codegen'd, [[adcCol]]), the
    * small query set broadcasts, and the corpus is never shuffled — the
    * e1 broadcast shape at a fraction of the scan volume. Ties break to
    * the lower neighbor id. At extreme scale even 16-byte codes are a
    * full-corpus scan per query batch — [[ivfAdcTopK]] is the probe-
    * pruned composition that bounds it. */
  def pqTopK(index: PqIndex, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(index.codes.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    adcRankTail(
      index.codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("adc", adcCol(index.codebooks)), k)
  }

  /** E12's index — IVFADC (Jégou et al.): the coarse IVF quantizer routes
    * queries to Voronoi cells, and each cell's inverted list stores PQ
    * CODES instead of raw vectors. `codedCells` is (vec_id, cell,
    * code_0..code_{m-1}) — the cell-partitioned coded corpus a deployment
    * persists; both centroid sets are bytes-sized plan parameters. */
  case class IvfPqIndex(centroids: Array[Array[Double]],
      codebooks: Seq[Array[Array[Double]]], codedCells: DataFrame)

  /** E12 build — encode the IVF index's cell-assigned corpus on the PQ
    * codebooks: ONE narrow codegen projection over the cells frame (the
    * codes are re-derived from the embedding column in place — no join
    * between the cells table and a codes table). Build ∉ query: both
    * inputs are the SERVED artifacts (e5's index, e11's codebooks). */
  def ivfPqBuild(ivf: IvfIndex, pq: PqIndex): IvfPqIndex = {
    val m = pq.codebooks.size
    val sub = pq.codebooks.head.head.length
    val coded = ivf.cells.select(
      Seq(col("vec_id"), col("cell")) ++ (0 until m).map { s =>
        nearestCol(slice(col("embedding"), s * sub + 1, sub), pq.codebooks(s))
          .as(s"code_$s")
      }: _*)
    IvfPqIndex(ivf.centroids, pq.codebooks, coded)
  }

  /** E12 — IVFADC top-k: queries probe their `nProbe` nearest coarse
    * cells ([[ivfQueryTopK]]'s probe front) and ADC-rank the PQ codes
    * WITHIN the probed cells only ([[pqTopK]]'s tail). This is the
    * production shape at extreme scale: per query batch the scan touches
    * nProbe/K of the corpus at ~m bytes per vector — probe pruning ×
    * code compression compound, vs pqTopK's full coded scan and
    * ivfQueryTopK's raw-vector cells. The tiny query set explodes to
    * nProbe rows and broadcasts; the coded corpus is never shuffled
    * (joined on `cell`, its serving partitioning). */
  def ivfAdcTopK(index: IvfPqIndex, queries: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val probesCol = slice(
      reverse(array_sort(array(scoreStructs(col("q_emb"), index.centroids): _*))),
      1, nProbe).getField("cell")
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("cell", explode(probesCol))
    adcRankTail(
      index.codedCells.join(broadcast(q), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("adc", adcCol(index.codebooks)), k)
  }

  /** E3 — embedding-cosine near-duplicate pairs above a threshold, bucketed
    * by LSH (the embedding analog of MinHash dedup): only within-bucket
    * pairs are compared. */
  def cosineNearDups(embeddings: DataFrame, threshold: Double,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val bucketed = embeddings
      .withColumn("bucket", bucketCol(col("embedding"), nPlanes, dim))
      .select(col("bucket"), col("vec_id"), col("embedding"))
      .withColumn("nrm", expr(normExpr("embedding")))
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("norm_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("norm_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      // filter on the ROUNDED score (the output value) so the threshold
      // boundary is identical to the oracle's
      .withColumn("cos", round(expr(
        cosOver("emb_a", "emb_b", "norm_a", "norm_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy("id_a", "id_b")
  }
}
