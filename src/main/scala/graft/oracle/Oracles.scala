package graft.oracle

import graft.llm.SimilarityOps

/** Per-query DuckDB oracle SQL (driver contract: `SparkEntry.oracleSql`).
  * Every entry mirrors the Spark implementation bound in
  * [[graft.SparkEntry.queries]] — same column names, same value semantics,
  * same deterministic ORDER BY. See [[OracleSql]] for the shared model CTEs
  * and the portability rules.
  */
object Oracles {
  import OracleSql.withModel

  /** documents/embeddings may not be registered as DuckDB views by the
    * driver (TESTDATA.md lists only the TPC-H tables + events), so oracle
    * SQL references them by path at the verification scale factor. */
  private val Docs = "read_parquet('/root/testdata/sf0.01/documents.parquet')"
  private val Emb = "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"

  private val ObjCols =
    "_id, version, version_hex, deleted, owner_kind, owner, type_full, storage_rebate"

  private def prefix(colName: String, p: String): String =
    s"substr($colName, 1, ${p.length}) = '$p'"

  private val DynChild =
    s"owner_kind = 'Object' AND ${prefix("type_full", "0x2::dynamic_field::Field<")}"

  // Shared by the logical query and its bucketed serving variant (j1b/j2b/
  // k1b) — same semantics, different Spark physical plan, one oracle text.
  private val J1Sql =
    s"""SELECT $ObjCols FROM objects
        WHERE _id IN (
          SELECT DISTINCT owner FROM objects
          WHERE $DynChild
            AND json_extract_string(fields_json, '$$.value.fields.v') IN ('7','21'))
        ORDER BY _id LIMIT 100"""

  private val J2Sql =
    s"""SELECT parent_id, child_id, child_version, CAST(rn AS BIGINT) AS rn FROM (
          SELECT p.parent_id, c.child_id, c.child_version,
                 row_number() OVER (PARTITION BY p.parent_id ORDER BY c.child_version DESC, c.child_id) AS rn
          FROM (SELECT _id AS parent_id FROM objects WHERE ${prefix("type_full", "0x0::signup")}) p
          JOIN (SELECT owner AS parent_id, _id AS child_id, version AS child_version
                FROM objects WHERE $DynChild) c
            ON c.parent_id = p.parent_id)
        WHERE rn <= 3 ORDER BY parent_id, rn"""

  private val K1Sql =
    "SELECT _id, version, deletion AS deleted FROM latest ORDER BY _id"

  /** One BPE oracle round — the ONE generator both t18 (document
    * sequences: CTE prefix "", carry doc_id, weight count(*), chr(30) joiner)
    * and t18c (word dict: prefix "w", carry n, weight sum(n), plain
    * concat) compose, so the sentinel encoding, the (n desc, pair) tie
    * order, and the exhaustion-safe LEFT JOIN cannot fork between the two
    * formulations (the engine side is unified the same way in
    * bpeTrainRounds). chr(31) = the engine's U+001F separator. */
  private def bpeRoundCte(i: Int, p: String, carry: String,
      weight: String, joinSql: String): String = {
    val carryPairs = if (carry == "n") ", n" else ""
    s"""
${p}toks$i AS (SELECT enc, $carry, string_split(substr(enc, 2, length(enc)-2), chr(31)||chr(31)) AS t
           FROM ${p}enc$i),
${p}pairs$i AS (SELECT unnest(list_transform(range(1, len(t)), j -> t[j] || ' ' || t[j+1])) AS pair$carryPairs
            FROM ${p}toks$i),
${p}top${i + 1} AS (SELECT pair, CAST($weight AS BIGINT) AS n FROM ${p}pairs$i
                GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
${p}enc${i + 1} AS (SELECT w.$carry AS $carry, coalesce(replace(w.enc,
    chr(31)||split_part(p2.pair,' ',1)||chr(31)||chr(31)||split_part(p2.pair,' ',2)||chr(31),
    chr(31)||split_part(p2.pair,' ',1)${joinSql}split_part(p2.pair,' ',2)||chr(31)), w.enc) AS enc
  FROM ${p}enc$i w LEFT JOIN ${p}top${i + 1} p2 ON TRUE)"""
  }

  /** The d10/d10b membership oracle: probe flagged iff EVERY one of its k
    * salted positions exists in the corpus's (shard, position) set for
    * the probe's OWN shard — bit-level Bloom truth as relational algebra.
    * shards=1 degenerates the route to a constant (the unsharded d10). */
  private def bloomScreenOracle(bits: Int, hashes: Int, shards: Int): String = {
    def pos(i: Int) =
      s"CAST('0x' || substr(md5('bloom$i-' || md5(text)), 1, 15) AS BIGINT) % $bits"
    val shard =
      if (shards == 1) "CAST(0 AS BIGINT)"
      else s"CAST('0x' || substr(md5('bloomshard-' || md5(text)), 1, 15) AS BIGINT) % $shards"
    def posUnion(pred: String, cols: String) =
      (0 until hashes)
        .map(i => s"SELECT $cols$shard AS s, ${pos(i)} AS p FROM $Docs WHERE $pred")
        .mkString("\n    UNION ALL ")
    s"""WITH cpos AS (SELECT DISTINCT s, p FROM (
    ${posUnion("doc_id < 400", "")})),
ipos AS (
    ${posUnion("doc_id >= 400", "doc_id, ")})
SELECT i.doc_id, bool_and(c.p IS NOT NULL) AS maybe_dup
FROM ipos i LEFT JOIN cpos c ON c.s = i.s AND c.p = i.p
GROUP BY i.doc_id ORDER BY doc_id"""
  }

  private def bpeRound(i: Int): String =
    bpeRoundCte(i, "", "doc_id", "count(*)", "||chr(30)||")

  private def bpeSubwordRound(i: Int): String =
    bpeRoundCte(i, "w", "n", "sum(n)", "||")

  /** The t18c training chain — word-frequency dict + 3 weighted rounds —
    * as ONE fragment composed by both the t18c merges oracle and the t18d
    * apply oracle (never forked: a dict-derivation change edits exactly
    * one place). */
  private def bpeSubwordTraining: String = bpeSubwordTrainingFrom(Docs)

  /** The same chain over an arbitrary source relation — t18e trains on
    * the t6 hash sample (the WHERE clause is t6's, verbatim) while t18c
    * trains on the full corpus; both compose THIS generator so the dict
    * derivation and round arithmetic cannot fork between them. */
  private def bpeSubwordTrainingFrom(src: String): String =
    s"""WITH dict0 AS (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM $src) GROUP BY 1),
wenc0 AS (SELECT chr(31) || array_to_string(string_split(word, ''), chr(31)||chr(31)) || chr(31) AS enc, n
          FROM dict0)""" + (0 until 3).map(i => "," + bpeSubwordRound(i)).mkString

  /** One t18d APPLY round: rule i+1 replayed over every word encoding in
    * the doc's list — LEFT JOIN so an exhausted round is the identity.
    * Linear growth in rounds (the lambda var `e` keeps each step
    * constant-size), unlike a nested-replace unroll. */
  private def bpeApplyRound(i: Int): String = s"""
apply${i + 1} AS (SELECT a.doc_id, list_transform(a.encs, e -> ${bpeApplySql("e", "p2.pair")}) AS encs
  FROM apply$i a LEFT JOIN wtop${i + 1} p2 ON TRUE)"""

  /** The full t18d/t18e APPLY tail: every doc's word-encoding list, the
    * learned rules replayed in order (one CTE per rule — exhausted rounds
    * degrade to identity exactly like the engine), and the final token
    * counts. ONE fragment so the full-corpus-trained (t18d) and
    * sample-trained (t18e) apply oracles cannot fork. */
  private def bpeApplyChainSql: String =
    bpeApplyCtes + """
SELECT doc_id,
  CAST(len(encs) AS BIGINT) AS n_tokens,
  CAST($SubTokOf AS BIGINT) AS n_subword_tokens
FROM apply3 ORDER BY doc_id""".replace("$SubTokOf", SubTokOf)

  /** The apply CTEs alone (… , apply3) — composed by the per-doc tail
    * above and by t20's per-language roll-up. */
  private def bpeApplyCtes: String =
    s""",
apply0 AS (SELECT doc_id, list_transform(string_split(text, ' '), w ->
    chr(31) || array_to_string(string_split(w, ''), chr(31)||chr(31)) || chr(31)) AS encs
  FROM $Docs)""" + (0 until 3).map(bpeApplyRound).mkString(",", ",", "")

  /** Subword-token count of one doc's final encoding list — the ONE
    * expression the t18d/t18e tails and t20's sums share. */
  private val SubTokOf: String =
    """list_sum(list_transform(encs, e ->
    len(string_split(substr(e, 2, length(e) - 2), chr(31)||chr(31)))))"""

  /** One t18d APPLY step: merge pair `p` (a scalar column) into word
    * encoding `e`, exhaustion-safe (NULL pair keeps `e`) — the same
    * sentinel/plain-concat semantics as [[bpeSubwordRound]]'s enc fold. */
  private def bpeApplySql(e: String, p: String): String =
    s"""coalesce(replace($e,
  chr(31)||split_part($p,' ',1)||chr(31)||chr(31)||split_part($p,' ',2)||chr(31),
  chr(31)||split_part($p,' ',1)||split_part($p,' ',2)||chr(31)), $e)"""

  // ---- LLM-shared CTE fragments (shingles, signatures) ------------------
  // Every banded-candidate, span-seed and k-gram-contamination fragment is
  // defined ONCE and composed (never forked) by the oracles gating the
  // same engine chain — d2/d5/d6/d7/d6b/c1/c2 share the LSH constants,
  // d9/d9b/c2 the k=5 seed polynomial, d8/c1/c2 the k=4 collision chain —
  // so a future constant change cannot silently diverge between them.

  /** The 3-gram shingle chain reading a `docs` (doc_id, w) CTE the caller
    * provides: word hashes → distinct shingle arrays → exploded set +
    * per-doc sizes. */
  private val ShingleChain = s"""
wharr AS (SELECT doc_id, list_transform(w, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS wh, len(w) AS nw
          FROM docs WHERE len(w) >= 3),
sh AS (SELECT doc_id, list_distinct(list_transform(range(1, nw - 1), i -> (wh[i]*961 + wh[i+1]*31 + wh[i+2]) % 1000000007)) AS shingle_arr
       FROM wharr),
sset AS (SELECT doc_id, unnest(shingle_arr) AS sh FROM sh),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sset GROUP BY doc_id)"""

  private val ShingleCtes = s"""
docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),$ShingleChain"""

  /** The minhash→bands→candidates fragment (32 perms, 8 bands of 4)
    * reading `sh`; `candExtra` restricts the pair set (e.g. to
    * increment-side id_b for the d5/c2 incremental split). */
  private def bandCandCtes(candExtra: String = ""): String = s"""
sig AS (SELECT doc_id, list_transform(range(0, 32), i -> list_min(list_transform(shingle_arr, h -> ((2*i+3)*h + 7*i+1) % 1000000007))) AS minhash FROM sh),
banded AS (SELECT doc_id, b, array_to_string(list_slice(minhash, b*4+1, b*4+4), '-') AS bkey
           FROM sig, (SELECT unnest(range(0, 8)) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
         FROM banded a JOIN banded bb ON a.b = bb.b AND a.bkey = bb.bkey AND a.doc_id < bb.doc_id$candExtra)"""

  /** Exact-Jaccard verification of `cand` over `sset`/`sizes`, keeping
    * pairs at or above `threshold` — the id-only form group resolution and
    * the admission screens consume. */
  private def verifiedPairCtes(threshold: Double): String = s"""
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sset x ON x.doc_id = c.id_a
  JOIN sset y ON y.doc_id = c.id_b AND y.sh = x.sh
  GROUP BY c.id_a, c.id_b),
pairs AS (
  SELECT i.id_a, i.id_b FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) >= $threshold)"""

  /** Undirected reachability over `pairs`, seeded from `seedFrom`'s doc_id
    * column (recursive — the WITH must be RECURSIVE). */
  private def reachCtes(seedFrom: String): String = s"""
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM $seedFrom
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)"""

  /** T1/T5's quality score + whitespace token count per doc (the exact
    * expression t5_quality_filter uses, shared by the sampling oracles). */
  private val QualityCte = s"""
q AS (SELECT doc_id, lang,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
              + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                   + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality_score
      FROM $Docs)"""

  /** The minhash→bands→candidates→verify→edges→reachability chain shared
    * by every group-resolution oracle (d6, d7, d6b) — pure composition of
    * the fragments above (threshold 0.5). Appended after
    * `WITH RECURSIVE $$ShingleCtes,`. */
  private val GroupChainCtes =
    s"${bandCandCtes()},${verifiedPairCtes(0.5)},${reachCtes(Docs)}"

  private val GroupSelect = """
SELECT id AS doc_id, min(r) AS group_id, min(r) = id AS keep
FROM reach GROUP BY id ORDER BY doc_id"""

  /** The full c1 curation CTE chain up to the packed frame `c` (and the
    * group assignment `grp` the keeper election used) — shared by c1 and
    * c4 so the curation stages cannot drift between the two oracles. */
  private lazy val CurationCtes = s"""WITH RECURSIVE
train AS (SELECT doc_id, text, lang FROM $Docs WHERE doc_id % 50 <> 0),
keep1 AS (SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM train) WHERE rn = 1),
docs AS (SELECT t.doc_id, string_split(t.text, ' ') AS w FROM train t JOIN keep1 USING (doc_id)),$ShingleChain,${bandCandCtes()},${verifiedPairCtes(0.5)},${reachCtes("keep1")},
grp AS (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id),
q AS (SELECT t.doc_id, t.lang,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
              + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                   + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality_score
      FROM train t JOIN keep1 USING (doc_id)),
keep2 AS (SELECT doc_id FROM (
  SELECT g.doc_id, row_number() OVER (PARTITION BY g.group_id ORDER BY q.quality_score DESC, g.doc_id) AS rn
  FROM grp g JOIN q USING (doc_id)) WHERE rn = 1),${contamCtes("", "docs",
    s"(SELECT doc_id AS bench_id, string_split(text, ' ') AS w FROM $Docs WHERE doc_id % 50 = 0)")},
contam AS (SELECT DISTINCT t.doc_id FROM tset t JOIN bset bb ON t.sh = bb.sh),
admitted AS (SELECT doc_id FROM keep2 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
c AS (SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score,
        CAST(sum(q.n_tokens) OVER (ORDER BY q.quality_score DESC, q.doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM q JOIN admitted USING (doc_id))"""

  /** d9's positional 5-gram seed chain reading a `docs` (doc_id, w) CTE,
    * name-spaced by `p` and with the seed-match predicate parameterized —
    * d9b/c2 are the identical chain restricted to pairs whose later
    * member is in the increment. One definition so the k=5 polynomial
    * coefficients (31^4…31^0), range bounds and df prune cannot drift
    * between the batch, incremental and admission oracles. Exposes
    * `<p>m` (id_a, id_b, pos_a, pos_b) and the islands CTE `<p>isl`. */
  /** The d9/t21 word-hash + k=5 polynomial arithmetic, defined ONCE (the
    * engine side shares `graft_pos_shingles` the same way): both
    * [[spanSeedCtes]] and [[WinnowCtes]] compose these fragments, so a
    * coefficient/modulus/prefix change reaches every dependent oracle. */
  private val WordHashExpr =
    "list_transform(w, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007)"
  private def khPoly(arr: String, i: String): String =
    s"($arr[$i]*923521 + $arr[$i+1]*29791 + $arr[$i+2]*961 + $arr[$i+3]*31 + $arr[$i+4]) % 1000000007"

  private def spanSeedCtes(p: String, matchExtra: String): String = s"""
${p}wh AS (SELECT doc_id, $WordHashExpr AS wh, len(w) AS nw
       FROM docs WHERE len(w) >= 5),
${p}seeds AS (SELECT doc_id, unnest(list_transform(range(1, nw - 3), i ->
            {'pos': i - 1, 'kh': ${khPoly("wh", "i")}})) AS s
          FROM ${p}wh),
${p}ps AS (SELECT doc_id, s.pos AS pos, s.kh AS kh FROM ${p}seeds),
${p}rare AS (SELECT kh FROM ${p}ps GROUP BY kh HAVING count(*) <= 100),
${p}pr AS (SELECT q.doc_id, q.pos, q.kh FROM ${p}ps q JOIN ${p}rare USING (kh)),
${p}m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
      FROM ${p}pr a JOIN ${p}pr b ON a.kh = b.kh AND a.doc_id < b.doc_id$matchExtra),
${p}isl AS (SELECT id_a, id_b, pos_a - pos_b AS diag, pos_a,
               pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS island
        FROM ${p}m)"""

  /** m4's fingerprint chain: the fixture's generative pixel formula
    * ((x*31 + y*17 + len) & 0xffffff over ImageGen dims) pushed through
    * the SAME aHash arithmetic the engine applies to DECODED pixels —
    * 8×8 nearest-neighbor sample grid at integer positions (i·w)/8,
    * (j·h)/8, integer luma (r·299+g·587+b·114)/1000, strict > against
    * the integer mean, packed row-major as two 32-bit halves (a 64-bit
    * pack would put bit 63 in the sign). Exposes `bits` (doc_id, w, h,
    * h_hi, h_lo) over the image-modality docs. */
  /** The aHash recomputation as a CTE-list FRAGMENT (no WITH), exposing
    * `bits` (doc_id, w, h, h_hi, h_lo) over every non-video doc — spliced
    * into the admission oracle's existing WITH chain by
    * [[admissionOracle]]; [[ImagePhashCtes]] wraps it for the standalone
    * m4-family oracles. */
  private val ImagePhashCteList = s"""img AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l
             FROM $Docs WHERE doc_id % 4 <> 0),
dm AS (SELECT doc_id, l, 16 + l % 48 AS w, 16 + (l * 7) % 48 AS h FROM img),
gr AS (SELECT doc_id, w, h,
         list_transform(
           list_transform(range(0, 64), k ->
             ((((k % 8) * w) // 8) * 31 + (((k // 8) * h) // 8) * 17 + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM dm),
mn AS (SELECT doc_id, w, h, gray, list_sum(gray) // 64 AS mean FROM gr),
bits AS (SELECT doc_id, w, h,
           CAST(list_sum(list_transform(range(32, 64), k ->
             CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
                  ELSE 0 END)) AS BIGINT) AS h_hi,
           CAST(list_sum(list_transform(range(0, 32), k ->
             CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
                  ELSE 0 END)) AS BIGINT) AS h_lo
         FROM mn)"""

  private val ImagePhashCtes = s"""
WITH $ImagePhashCteList"""

  /** m4e/m4f/m4g's dHash chain — the GRADIENT lens recomputed from the
    * generative pixels: a 9×8 nearest-sample luma grid over `dm`'s dims
    * (flat 1-based list index y·9 + x + 1), bit (x, y) = luma(x+1, y) >
    * luma(x, y), packed like the aHash. Exposes `dbits` (doc_id, w, h,
    * h_hi, h_lo) — spliced after [[ImagePhashCteList]] (needs `dm`). */
  private val ImageDHashBitsCteList = s"""dgr AS (SELECT doc_id, w, h,
         list_transform(
           list_transform(range(0, 72), k ->
             ((((k % 9) * w) // 9) * 31 + (((k // 9) * h) // 8) * 17 + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM dm),
dbits AS (SELECT doc_id, w, h,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[(k // 8) * 9 + (k % 8) + 2] > gray[(k // 8) * 9 + (k % 8) + 1]
              THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[(k // 8) * 9 + (k % 8) + 2] > gray[(k // 8) * 9 + (k % 8) + 1]
              THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS h_lo
     FROM dgr)"""

  /** m4o/m4p/m4q's SPATIAL-CROP chain: the cropped fixture's rendition
    * (a crop-rule doc's pixel (x, y) reads the generative formula at
    * (x + 16·cx, y + 16·cy), dims shrunk accordingly), EVERY whole
    * 16-px tile printed through the tile-grid aHash arithmetic (8×8
    * nearest samples WITHIN the tile at x0 + (i·16)//8, integer luma,
    * strict > against the integer mean; constant-luma tiles drop — the
    * engine's silence-window rule on pixels), keyed by 2-D ordinal.
    * Exposes `<p>bits` (doc_id, tx, ty, h_hi, h_lo). `plainBelow400`
    * renders corpus docs UNCROPPED and every increment doc cropped
    * wherever its dims allow (the m4p/m4q served split); false = the
    * id%2 / id%3 mixed rule everywhere (the m4o batch fixture). */
  private def tileBitsCtes(p: String, plainBelow400: Boolean): String = {
    val cxExpr =
      if (plainBelow400)
        "CASE WHEN doc_id >= 400 AND w0 // 16 >= 2 THEN 1 ELSE 0 END"
      else "CASE WHEN doc_id % 2 = 1 AND w0 // 16 >= 2 THEN 1 ELSE 0 END"
    val cyExpr =
      if (plainBelow400)
        "CASE WHEN doc_id >= 400 AND h0 // 16 >= 2 THEN 1 ELSE 0 END"
      else "CASE WHEN doc_id % 3 = 1 AND h0 // 16 >= 2 THEN 1 ELSE 0 END"
    s"""${p}img AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs
        WHERE doc_id % 4 <> 0),
${p}dm AS (SELECT doc_id, l, 16 + l % 48 AS w0, 16 + (l * 7) % 48 AS h0
           FROM ${p}img),
${p}cr AS (SELECT doc_id, l, $cxExpr AS cx, $cyExpr AS cy, w0, h0 FROM ${p}dm),
${p}rd AS (SELECT doc_id, l, cx, cy, w0 - 16 * cx AS w, h0 - 16 * cy AS h
           FROM ${p}cr),
${p}ti AS (SELECT doc_id, l, cx, cy, w, h,
           unnest(range(0, (w // 16) * (h // 16))) AS ti FROM ${p}rd),
${p}tl AS (SELECT doc_id, l, cx, cy,
           ti % (w // 16) AS tx, ti // (w // 16) AS ty FROM ${p}ti),
${p}gr AS (SELECT doc_id, tx, ty,
         list_transform(
           list_transform(range(0, 64), k ->
             ((tx * 16 + ((k % 8) * 16) // 8 + 16 * cx) * 31
              + (ty * 16 + ((k // 8) * 16) // 8 + 16 * cy) * 17 + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM ${p}tl),
${p}nc AS (SELECT doc_id, tx, ty, gray FROM ${p}gr
           WHERE list_min(gray) <> list_max(gray)),
${p}mn AS (SELECT doc_id, tx, ty, gray, list_sum(gray) // 64 AS mean
           FROM ${p}nc),
${p}bits AS (SELECT doc_id, tx, ty,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS BIGINT) AS h_lo
     FROM ${p}mn)"""
  }

  /** m4o — the batch self-search over the mixed cropped/plain fixture:
    * the m3f candidate/verify/count chain with a 2-D ordinal (the ±1
    * offset square on both axes). */
  private val imageTileNearDupSql: String = s"""
WITH ${tileBitsCtes("mo", plainBelow400 = false)},
mobands AS (SELECT doc_id, tx, ty, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM mobits, (SELECT unnest(range(0, 4)) AS band)),
mook AS (SELECT tx, ty, band, key FROM mobands GROUP BY tx, ty, band, key
         HAVING count(*) <= 100),
mopr AS (SELECT b.doc_id, b.tx, b.ty, b.band, b.key
         FROM mobands b JOIN mook USING (tx, ty, band, key)),
mocand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.tx AS txa, a.ty AS tya, b.tx AS txb, b.ty AS tyb
           FROM mopr a JOIN mopr b
             ON a.band = b.band AND a.key = b.key
            AND b.tx BETWEEN a.tx - 1 AND a.tx + 1
            AND b.ty BETWEEN a.ty - 1 AND a.ty + 1
            AND a.doc_id < b.doc_id),
mover AS (SELECT c.id_a, c.id_b, c.txb - c.txa AS dx, c.tyb - c.tya AS dy
          FROM mocand c
          JOIN mobits x ON x.doc_id = c.id_a AND x.tx = c.txa AND x.ty = c.tya
          JOIN mobits y ON y.doc_id = c.id_b AND y.tx = c.txb AND y.ty = c.tyb
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
       CAST(count(*) AS BIGINT) AS n_matched
FROM mover GROUP BY id_a, id_b, dx, dy HAVING count(*) >= 2
ORDER BY id_a, id_b, dx, dy"""

  /** m4p/m4q — the served form, ONE definition (the m5e/m5f rule):
    * uncropped corpus (< 400) vs the cropped increment (≥ 400),
    * combined-population rail with only the increment side
    * prune-joined. */
  private val imageTileServedSql: String = s"""
WITH ${tileBitsCtes("mp", plainBelow400 = true)},
mpbands AS (SELECT doc_id, tx, ty, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM mpbits, (SELECT unnest(range(0, 4)) AS band)),
mpok AS (SELECT tx, ty, band, key FROM mpbands
         GROUP BY tx, ty, band, key HAVING count(*) <= 100),
mpip AS (SELECT b.doc_id, b.tx, b.ty, b.band, b.key FROM mpbands b
         JOIN mpok USING (tx, ty, band, key) WHERE b.doc_id >= 400),
mpcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.tx AS txa, a.ty AS tya, b.tx AS txb, b.ty AS tyb
  FROM mpbands a JOIN mpip b
    ON a.band = b.band AND a.key = b.key
   AND b.tx BETWEEN a.tx - 1 AND a.tx + 1
   AND b.ty BETWEEN a.ty - 1 AND a.ty + 1
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, a.tx, a.ty, b.tx, b.ty
  FROM mpip a JOIN mpip b
    ON a.band = b.band AND a.key = b.key
   AND b.tx BETWEEN a.tx - 1 AND a.tx + 1
   AND b.ty BETWEEN a.ty - 1 AND a.ty + 1
   AND a.doc_id < b.doc_id),
mpver AS (SELECT c.id_a, c.id_b, c.txb - c.txa AS dx, c.tyb - c.tya AS dy
          FROM mpcand c
          JOIN mpbits x ON x.doc_id = c.id_a AND x.tx = c.txa AND x.ty = c.tya
          JOIN mpbits y ON y.doc_id = c.id_b AND y.tx = c.txb AND y.ty = c.tyb
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
       CAST(count(*) AS BIGINT) AS n_matched
FROM mpver GROUP BY id_a, id_b, dx, dy HAVING count(*) >= 2
ORDER BY id_a, id_b, dx, dy"""

  /** m4r/m4s/m4t's CROP∘DIHEDRAL chain: the composed rendition (crop
    * by whole tiles THEN an axis-preserving dihedral element g — pixel
    * (x, y) reads the generative formula at the crop-shifted,
    * g-reflected coordinates), every whole 16-px tile of all FOUR
    * anchor families ('lt'/'rt'/'lb'/'rb' — x grid anchored left or
    * right, y grid top or bottom, ordinals counted FROM the anchor)
    * printed through the DIHEDRAL-CANONICAL tile arithmetic: the
    * SYMMETRIC 8×8 sample grid within the tile (offsets 2i for i < 4,
    * 2i+1 for i ≥ 4 — mirror-images of each other at t = 16), integer
    * luma, strict > against the integer mean, then the HUGEINT `least`
    * over the 8 orientations of the packed print (the m4k chain per
    * tile). Constant-luma tiles drop. Exposes `<p>kbits` (doc_id, fam,
    * tx, ty, h_hi, h_lo). `plainBelow400` renders corpus docs PLAIN
    * and every increment doc cropped-wherever-dims-allow AND
    * transformed by the id % 3 rule (the m4s/m4t served split); false
    * = the m4o crop rules composed with the id % 5 transform rule (the
    * m4r batch fixture). */
  private def tileKBitsCtes(p: String, plainBelow400: Boolean): String = {
    val cxExpr =
      if (plainBelow400)
        "CASE WHEN doc_id >= 400 AND w0 // 16 >= 2 THEN 1 ELSE 0 END"
      else "CASE WHEN doc_id % 2 = 1 AND w0 // 16 >= 2 THEN 1 ELSE 0 END"
    val cyExpr =
      if (plainBelow400)
        "CASE WHEN doc_id >= 400 AND h0 // 16 >= 2 THEN 1 ELSE 0 END"
      else "CASE WHEN doc_id % 3 = 1 AND h0 // 16 >= 2 THEN 1 ELSE 0 END"
    val gExpr =
      if (plainBelow400)
        "CASE WHEN doc_id >= 400 THEN (doc_id % 3) + 1 ELSE 0 END"
      else "CASE WHEN doc_id % 5 IN (1, 2, 3) THEN doc_id % 5 ELSE 0 END"
    val idx = Seq(
      "k",
      "(k // 8) * 8 + (7 - (k % 8))",
      "(7 - (k // 8)) * 8 + (k % 8)",
      "(7 - (k // 8)) * 8 + (7 - (k % 8))",
      "(k % 8) * 8 + (k // 8)",
      "(k % 8) * 8 + (7 - (k // 8))",
      "(7 - (k % 8)) * 8 + (k // 8)",
      "(7 - (k % 8)) * 8 + (7 - (k // 8))")
    val packs = idx.map { m =>
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS HUGEINT) * 4294967296
       + CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS HUGEINT)"""
    }
    s"""${p}kim AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs
        WHERE doc_id % 4 <> 0),
${p}kdm AS (SELECT doc_id, l, 16 + l % 48 AS w0, 16 + (l * 7) % 48 AS h0
           FROM ${p}kim),
${p}kcr AS (SELECT doc_id, l, $cxExpr AS cx, $cyExpr AS cy, $gExpr AS g,
           w0, h0 FROM ${p}kdm),
${p}krd AS (SELECT doc_id, l, cx, cy, g, w0 - 16 * cx AS w, h0 - 16 * cy AS h
           FROM ${p}kcr),
${p}kfm AS (SELECT doc_id, l, cx, cy, g, w, h, fam FROM ${p}krd,
           (SELECT unnest(['lt', 'rt', 'lb', 'rb']) AS fam)),
${p}kti AS (SELECT doc_id, l, cx, cy, g, w, h, fam,
           unnest(range(0, (w // 16) * (h // 16))) AS ti FROM ${p}kfm),
${p}ktl AS (SELECT doc_id, l, cx, cy, g, w, h, fam,
           ti % (w // 16) AS tx, ti // (w // 16) AS ty,
           CASE WHEN substr(fam, 1, 1) = 'l' THEN 16 * (ti % (w // 16))
                ELSE w - 16 * ((ti % (w // 16)) + 1) END AS x0,
           CASE WHEN substr(fam, 2, 1) = 't' THEN 16 * (ti // (w // 16))
                ELSE h - 16 * ((ti // (w // 16)) + 1) END AS y0
           FROM ${p}kti),
${p}kgr AS (SELECT doc_id, fam, tx, ty,
         list_transform(
           list_transform(
             list_transform(range(0, 64), k -> [
               x0 + CASE WHEN (k % 8) < 4 THEN 2 * (k % 8)
                         ELSE 2 * (k % 8) + 1 END,
               y0 + CASE WHEN (k // 8) < 4 THEN 2 * (k // 8)
                         ELSE 2 * (k // 8) + 1 END]),
             xy -> (((CASE WHEN g IN (1, 3) THEN w - 1 - xy[1] ELSE xy[1] END
                      + 16 * cx) * 31
                   + (CASE WHEN g IN (2, 3) THEN h - 1 - xy[2] ELSE xy[2] END
                      + 16 * cy) * 17 + l) & 16777215)),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM ${p}ktl),
${p}knc AS (SELECT doc_id, fam, tx, ty, gray FROM ${p}kgr
           WHERE list_min(gray) <> list_max(gray)),
${p}kmn AS (SELECT doc_id, fam, tx, ty, gray, list_sum(gray) // 64 AS mean
           FROM ${p}knc),
${p}kcc AS (SELECT doc_id, fam, tx, ty,
           least(${packs.mkString(",\n  ")}) AS comb FROM ${p}kmn),
${p}kbits AS (SELECT doc_id, fam, tx, ty,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo
     FROM ${p}kcc)"""
  }

  /** m4r — the batch self-search over the mixed crop∘transform fixture:
    * the m4o candidate/verify/count chain with the FAMILY dimension —
    * the a side restricted to the 'lt' family (the stored-side shape),
    * the b side all four families inside the ±1 2-D fan; the matched b
    * family is the transform WITNESS. */
  private val imageTileKNearDupSql: String = s"""
WITH ${tileKBitsCtes("mr", plainBelow400 = false)},
mrbands AS (SELECT doc_id, fam, tx, ty, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM mrkbits, (SELECT unnest(range(0, 4)) AS band)),
mrok AS (SELECT fam, tx, ty, band, key FROM mrbands
         GROUP BY fam, tx, ty, band, key HAVING count(*) <= 100),
mrpr AS (SELECT b.doc_id, b.fam, b.tx, b.ty, b.band, b.key
         FROM mrbands b JOIN mrok USING (fam, tx, ty, band, key)),
mrcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  b.fam AS famb,
                  a.tx AS txa, a.ty AS tya, b.tx AS txb, b.ty AS tyb
           FROM mrpr a JOIN mrpr b
             ON a.band = b.band AND a.key = b.key
            AND a.fam = 'lt'
            AND a.tx BETWEEN b.tx - 1 AND b.tx + 1
            AND a.ty BETWEEN b.ty - 1 AND b.ty + 1
            AND a.doc_id < b.doc_id),
mrver AS (SELECT c.id_a, c.id_b, c.famb,
                 c.txb - c.txa AS dx, c.tyb - c.tya AS dy
          FROM mrcand c
          JOIN mrkbits x ON x.doc_id = c.id_a AND x.fam = 'lt'
                        AND x.tx = c.txa AND x.ty = c.tya
          JOIN mrkbits y ON y.doc_id = c.id_b AND y.fam = c.famb
                        AND y.tx = c.txb AND y.ty = c.tyb
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, famb AS fam,
       CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
       CAST(count(*) AS BIGINT) AS n_matched
FROM mrver GROUP BY id_a, id_b, famb, dx, dy HAVING count(*) >= 2
ORDER BY id_a, id_b, fam, dx, dy"""

  /** m4s/m4t — the served form, ONE definition (the m5e/m5f rule):
    * plain corpus (< 400, 'lt' family only — the imagetilesk side's
    * shape) vs the composed increment (≥ 400, all four families),
    * combined-population rail with only the increment side
    * prune-joined. */
  private val imageTileKServedSql: String = s"""
WITH ${tileKBitsCtes("ms", plainBelow400 = true)},
mspop AS (SELECT doc_id, fam, tx, ty, h_hi, h_lo FROM mskbits
          WHERE doc_id >= 400 OR fam = 'lt'),
msbands AS (SELECT doc_id, fam, tx, ty, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM mspop, (SELECT unnest(range(0, 4)) AS band)),
msok AS (SELECT fam, tx, ty, band, key FROM msbands
         GROUP BY fam, tx, ty, band, key HAVING count(*) <= 100),
msip AS (SELECT b.doc_id, b.fam, b.tx, b.ty, b.band, b.key FROM msbands b
         JOIN msok USING (fam, tx, ty, band, key) WHERE b.doc_id >= 400),
mscand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, b.fam AS famb,
         a.tx AS txa, a.ty AS tya, b.tx AS txb, b.ty AS tyb
  FROM msbands a JOIN msip b
    ON a.band = b.band AND a.key = b.key
   AND a.fam = 'lt'
   AND a.tx BETWEEN b.tx - 1 AND b.tx + 1
   AND a.ty BETWEEN b.ty - 1 AND b.ty + 1
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, b.fam, a.tx, a.ty, b.tx, b.ty
  FROM msip a JOIN msip b
    ON a.band = b.band AND a.key = b.key
   AND a.fam = 'lt'
   AND a.tx BETWEEN b.tx - 1 AND b.tx + 1
   AND a.ty BETWEEN b.ty - 1 AND b.ty + 1
   AND a.doc_id < b.doc_id),
msver AS (SELECT c.id_a, c.id_b, c.famb,
                 c.txb - c.txa AS dx, c.tyb - c.tya AS dy
          FROM mscand c
          JOIN mskbits x ON x.doc_id = c.id_a AND x.fam = 'lt'
                        AND x.tx = c.txa AND x.ty = c.tya
          JOIN mskbits y ON y.doc_id = c.id_b AND y.fam = c.famb
                        AND y.tx = c.txb AND y.ty = c.tyb
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, famb AS fam,
       CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
       CAST(count(*) AS BIGINT) AS n_matched
FROM msver GROUP BY id_a, id_b, famb, dx, dy HAVING count(*) >= 2
ORDER BY id_a, id_b, fam, dx, dy"""

  /** m4k/m4l's dihedral-canonical chain: the SYMMETRIC sample grid
    * (x_i = (i·w)//8 for i < 4, w−1−((7−i)·w)//8 for i ≥ 4 — exactly the
    * engine's symGray rule, so dihedral image transforms permute the
    * grid), the mean-threshold bits, then the MINIMUM over the 8
    * dihedral orientations of the packed print — each orientation's
    * (hi, lo) combined into one HUGEINT (hi·2³² + lo; both halves carry
    * 32 bits, so the combined value is the unsigned 64-bit print and
    * `least` is the engine's lexicographic pair min), split back after.
    * Exposes `kbits` (doc_id, w, h, h_hi, h_lo). */
  private val DihedralBitsCteList: String = {
    // gray index each transformed grid position reads, per orientation
    // (x = k % 8, y = k // 8; index = sy·8 + sx) — the engine's
    // DihedralMaps in SQL
    val idx = Seq(
      "k",
      "(k // 8) * 8 + (7 - (k % 8))",
      "(7 - (k // 8)) * 8 + (k % 8)",
      "(7 - (k // 8)) * 8 + (7 - (k % 8))",
      "(k % 8) * 8 + (k // 8)",
      "(k % 8) * 8 + (7 - (k // 8))",
      "(7 - (k % 8)) * 8 + (k // 8)",
      "(7 - (k % 8)) * 8 + (7 - (k // 8))")
    val packs = idx.map { m =>
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS HUGEINT) * 4294967296
       + CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS HUGEINT)"""
    }
    s"""kg AS (SELECT doc_id, w, h,
         list_transform(
           list_transform(range(0, 64), k ->
             ((CASE WHEN (k % 8) < 4 THEN ((k % 8) * w) // 8
                    ELSE w - 1 - (((7 - (k % 8)) * w) // 8) END) * 31
              + (CASE WHEN (k // 8) < 4 THEN ((k // 8) * h) // 8
                      ELSE h - 1 - (((7 - (k // 8)) * h) // 8) END) * 17
              + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM dm),
km2 AS (SELECT doc_id, w, h, gray, list_sum(gray) // 64 AS mean FROM kg),
kc AS (SELECT doc_id, w, h, least(${packs.mkString(",\n  ")}) AS comb FROM km2),
kbits AS (SELECT doc_id, w, h,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo
     FROM kc)"""
  }

  /** [[DihedralBitsCteList]]'s arithmetic parameterized over source and
    * luma term — the m4k chain carried to the VIDEO tier: `src` must
    * expose (doc_id, w, h, plus whatever `carry` names), `lumaAdd` is
    * the generative pixel's additive term (`l` for keyframes — frame 0's
    * fno·7 is 0 — and `l + fno * 7` for sampled frames). Exposes
    * `<p>bits` (doc_id, <carry>, h_hi, h_lo). Same symmetric grid, same
    * 8-orientation HUGEINT `least`, re-declared here because the chains
    * must stay independently readable per family (the oracle-file
    * discipline: each query's SQL is the full recomputation). */
  private def dihedralBitsOver(src: String, carry: Seq[String],
      lumaAdd: String, p: String): String = {
    val idx = Seq(
      "k",
      "(k // 8) * 8 + (7 - (k % 8))",
      "(7 - (k // 8)) * 8 + (k % 8)",
      "(7 - (k // 8)) * 8 + (7 - (k % 8))",
      "(k % 8) * 8 + (k // 8)",
      "(k % 8) * 8 + (7 - (k // 8))",
      "(7 - (k % 8)) * 8 + (k // 8)",
      "(7 - (k % 8)) * 8 + (7 - (k // 8))")
    val packs = idx.map { m =>
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS HUGEINT) * 4294967296
       + CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS HUGEINT)"""
    }
    val cols = ("doc_id" +: carry).mkString(", ")
    s"""${p}dg AS (SELECT $cols,
         list_transform(
           list_transform(range(0, 64), k ->
             ((CASE WHEN (k % 8) < 4 THEN ((k % 8) * w) // 8
                    ELSE w - 1 - (((7 - (k % 8)) * w) // 8) END) * 31
              + (CASE WHEN (k // 8) < 4 THEN ((k // 8) * h) // 8
                      ELSE h - 1 - (((7 - (k // 8)) * h) // 8) END) * 17
              + $lumaAdd) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM $src),
${p}dm AS (SELECT $cols, gray, list_sum(gray) // 64 AS mean FROM ${p}dg),
${p}dc AS (SELECT $cols, least(${packs.mkString(",\n  ")}) AS comb FROM ${p}dm),
${p}bits AS (SELECT $cols,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo
     FROM ${p}dc)"""
  }

  /** The engine's band-bucket rail over an arbitrary print CTE (the
    * [[BandRailCteList]] arithmetic parametrized by source and name
    * prefix, so one oracle can rail TWO lenses side by side — m4g's
    * union): exposes `<p>pruned` (doc_id, band, key). */
  private def bandRailOver(bits: String, p: String): String = s"""${p}bands AS (
  SELECT doc_id, band,
         CASE band WHEN 0 THEN h_lo & 65535
                   WHEN 1 THEN (h_lo >> 16) & 65535
                   WHEN 2 THEN h_hi & 65535
                   ELSE (h_hi >> 16) & 65535 END AS key
  FROM $bits, (SELECT unnest(range(0, 4)) AS band)),
${p}ok AS (SELECT band, key FROM ${p}bands GROUP BY band, key HAVING count(*) <= 100),
${p}pruned AS (SELECT b.doc_id, b.band, b.key FROM ${p}bands b JOIN ${p}ok USING (band, key))"""

  /** m5's fingerprint chain: the fixture's generative audio formula
    * (8 kHz; channels = 1 + len % 2; frames = 200 + (len·13) % 600;
    * sample_i = (i·37 + len·101) % 65536 − 32768, interleaved flat index
    * i = frame·channels + ch) pushed through the SAME content fold the
    * engine applies to DECODED PCM — unsigned 16-bit samples folded
    * (h·31 + u) % 1e9+7 in stream order (list_reduce; the engine's
    * AudioDecoder.pcmHash is the Scala twin). Exposes `am` (doc_id,
    * sample_rate, channels, n_frames, duration_ms, pcm_hash). */
  private val AudioCteList = s"""al AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs),
ap AS (SELECT doc_id, l, CAST(8000 AS BIGINT) AS sample_rate,
              CAST(1 + l % 2 AS BIGINT) AS channels,
              CAST(200 + (l * 13) % 600 AS BIGINT) AS n_frames FROM al),
am AS (SELECT doc_id, sample_rate, channels, n_frames,
              n_frames * 1000 // sample_rate AS duration_ms,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, n_frames * channels),
                  i -> (i * 37 + l * 101) % 65536)),
                (acc, x) -> (acc * 31 + x) % 1000000007) AS pcm_hash
       FROM ap)"""

  private val AudioCtes = s"""
WITH $AudioCteList"""

  /** m5d/m5e's acoustic-fingerprint chain over the generative samples —
    * 65 integer-bound windows, exact energy sums, sign-of-delta bits
    * packed as two 32-bit halves (the engine's acousticFingerprint,
    * mirrored once). Exposes `abits` (doc_id, h_hi, h_lo). */
  private val AudioFpCteList = s"""an AS (SELECT doc_id, l, n_frames * channels AS n FROM ap),
afp AS (SELECT doc_id,
          list_transform(range(0, 65), w -> list_sum(list_transform(
            range(n * w // 65, n * (w + 1) // 65),
            i -> (i * 37 + l * 101) % 65536))) AS e
        FROM an),
abits AS (SELECT doc_id,
            CAST(list_sum(list_transform(range(32, 64), k ->
              CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << (k - 32))
                   ELSE 0 END)) AS BIGINT) AS h_hi,
            CAST(list_sum(list_transform(range(0, 32), k ->
              CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << k)
                   ELSE 0 END)) AS BIGINT) AS h_lo
          FROM afp)"""

  /** The engine's BAND-BUCKET RAIL mirrored into the print near-dup
    * oracles (r15 advice: acoustic prints are far more correlated than
    * image hashes, so at a larger SF a (band, key) bucket CAN exceed
    * maxBucket=100 — the oracle must drop exactly the pairs the engine
    * drops, the t21c df-rail discipline, or scale-up flips verification
    * red). Mirrors [[graft.llm.MultimodalOps.imageNearDupsFromHashes]]:
    * 4 disjoint 16-bit bands, buckets over the COMBINED population,
    * a pair survives iff it shares ≥ 1 band in a bucket holding ≤ 100
    * prints. Operates on whatever print frame the spliced chain names
    * `abits` (audio acoustic prints; m7b's video keyframe prints);
    * exposes `apruned` (doc_id, band, key). */
  private val BandRailCteList = s"""abands AS (
  SELECT doc_id, band,
         CASE band WHEN 0 THEN h_lo & 65535
                   WHEN 1 THEN (h_lo >> 16) & 65535
                   WHEN 2 THEN h_hi & 65535
                   ELSE (h_hi >> 16) & 65535 END AS key
  FROM abits, (SELECT unnest(range(0, 4)) AS band)),
aok AS (SELECT band, key FROM abands GROUP BY band, key HAVING count(*) <= 100),
apruned AS (SELECT b.doc_id, b.band, b.key FROM abands b JOIN aok USING (band, key))"""

  /** The served audio near-dup screen's oracle (m5e and its maintained-
    * side twin m5f — ONE definition, the t21c/t21d shared-oracle
    * discipline): banded candidates under the mirrored rail, pairs whose
    * LATER member is in the increment, corpus member as id_a. */
  private val audioServedNearDupSql = s"""$AudioCtes,
$AudioFpCteList,
$BandRailCteList,
acand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM apruned a JOIN apruned b
            ON a.band = b.band AND a.key = b.key
           AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id))
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM acand c JOIN abits x ON x.doc_id = c.id_a
             JOIN abits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b"""

  /** m3/m7/m7b's generative VIDEO params over the video-modality docs —
    * frames = 2 + len % 3 at the generator's 25 fps; dims share the
    * image formula (one generative dim rule across pixel modalities).
    * Exposes `vp` (doc_id, l, w, h, nf). */
  private val VideoCteList = s"""vl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l
        FROM $Docs WHERE doc_id % 4 = 0),
vp AS (SELECT doc_id, l, 16 + l % 48 AS w, 16 + (l * 7) % 48 AS h,
              2 + l % 3 AS nf FROM vl)"""

  /** m1 and its decode-only twin m1b share ONE oracle: the twin reads
    * pre-generated payload parquet, so the result is identical by
    * construction — only the measured cost differs. */
  private val mediaMetaSql = s"""
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'video/' || source
            WHEN doc_id % 7 = 2 THEN 'image/bmp'
            ELSE 'image/png' END AS media_type,
       CASE WHEN doc_id % 4 = 0 THEN 'avi'
            WHEN doc_id % 7 = 2 THEN 'bmp'
            ELSE 'png' END AS format,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 4 = 0 THEN w * h * (2 + l % 3) ELSE w * h END AS BIGINT) AS n_pixels
FROM (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS l,
             16 + length(text) % 48 AS w, 16 + (length(text) * 7) % 48 AS h
      FROM $Docs)
ORDER BY doc_id"""

  /** m4h and its maintained-side twin m4i, ONE definition (the m5e/m5f
    * shared-oracle discipline): the multi-lens candidate union under the
    * SERVED pair restriction — each lens's railed band candidates with
    * the increment-later rule, verified within its own lens space
    * (a pair can be an aHash band candidate yet only dHash-verified —
    * the legs stay separate until the final union), deduped on
    * (id_a, id_b). The rail population is corpus + increment = all
    * non-video docs, exactly the served screen's combined-population
    * prune. */
  private val imageLensUnionServedSql = s"""$ImagePhashCtes,
$ImageDHashBitsCteList,
${bandRailOver("bits", "ua")},
${bandRailOver("dbits", "ud")},
sac AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM uapruned a JOIN uapruned b
          ON a.band = b.band AND a.key = b.key
         AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
         AND (a.doc_id < 400 OR a.doc_id < b.doc_id)),
sdc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM udpruned a JOIN udpruned b
          ON a.band = b.band AND a.key = b.key
         AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
         AND (a.doc_id < 400 OR a.doc_id < b.doc_id)),
sav AS (SELECT c.id_a, c.id_b FROM sac c
        JOIN bits x ON x.doc_id = c.id_a JOIN bits y ON y.doc_id = c.id_b
        WHERE bit_count(xor(x.h_hi, y.h_hi))
              + bit_count(xor(x.h_lo, y.h_lo)) <= 3),
sdv AS (SELECT c.id_a, c.id_b FROM sdc c
        JOIN dbits x ON x.doc_id = c.id_a JOIN dbits y ON y.doc_id = c.id_b
        WHERE bit_count(xor(x.h_hi, y.h_hi))
              + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b FROM (SELECT id_a, id_b FROM sav
                        UNION SELECT id_a, id_b FROM sdv)
ORDER BY id_a, id_b"""

  /** m5 and its decode-only twin m5g, one oracle (the m1/m1b rule). The
    * format CASE mirrors the fixture's audioContainerOf modulus — the
    * MIXED-container feed (WAV / AIFF / AU, all JDK-native) whose header
    * fields, pcm_hash and prints are container-INVARIANT because one
    * generative sample formula feeds all three writers. */
  private val audioMetaSql = s"""$AudioCtes
SELECT doc_id,
       CASE WHEN doc_id % 5 = 1 THEN 'aiff'
            WHEN doc_id % 5 = 3 THEN 'au'
            ELSE 'wav' END AS format,
       sample_rate, channels, n_frames, duration_ms, pcm_hash
FROM am ORDER BY doc_id"""

  /** m3/m3b's per-ordinal frame-print chain over the video docs: frame
    * numbers i·nf/4, pixels from the generative formula, aHash bits —
    * exposes `fbits` (doc_id, i, fno, h_hi, h_lo). */
  private val VideoFrameBitsCteList = s"""fs AS (SELECT doc_id, l, w, h, i, i * nf // 4 AS fno
       FROM vp, (SELECT unnest(range(0, 4)) AS i)),
fg AS (SELECT doc_id, i, fno,
         list_transform(
           list_transform(range(0, 64), k ->
             ((((k % 8) * w) // 8) * 31 + (((k // 8) * h) // 8) * 17 + l + fno * 7) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM fs),
fm AS (SELECT doc_id, i, fno, gray, list_sum(gray) // 64 AS mean FROM fg),
fbits AS (SELECT doc_id, i, fno,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS BIGINT) AS h_lo
     FROM fm)"""

  /** m7b/m7c's keyframe near-dup chain: frame 0's aHash recomputed from
    * the generative formula, the band rail mirrored, candidates from
    * pruned band joins under the given pair condition (batch form:
    * id_a < id_b; served form: the m4d increment-later restriction). */
  /** m3b/m3c's shot-level chain: per-ordinal frame prints, the band
    * rail keyed (ordinal, band, key), candidates under the given pair
    * condition (batch form: id_a < id_b; served: increment-later). */
  private def frameNearDupSql(pairCond: String): String = s"""
WITH $VideoCteList,
$VideoFrameBitsCteList,
fbands AS (SELECT doc_id, i, band,
         CASE band WHEN 0 THEN h_lo & 65535
                   WHEN 1 THEN (h_lo >> 16) & 65535
                   WHEN 2 THEN h_hi & 65535
                   ELSE (h_hi >> 16) & 65535 END AS key
  FROM fbits, (SELECT unnest(range(0, 4)) AS band)),
fok AS (SELECT i, band, key FROM fbands GROUP BY i, band, key
        HAVING count(*) <= 100),
fpruned AS (SELECT b.doc_id, b.i, b.band, b.key
            FROM fbands b JOIN fok USING (i, band, key)),
fcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.i AS i
          FROM fpruned a JOIN fpruned b
            ON a.i = b.i AND a.band = b.band AND a.key = b.key
           AND $pairCond)
SELECT c.id_a, c.id_b, CAST(c.i AS BIGINT) AS frame_idx,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM fcand c JOIN fbits x ON x.doc_id = c.id_a AND x.i = c.i
             JOIN fbits y ON y.doc_id = c.id_b AND y.i = c.i
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b, frame_idx"""

  /** m3f/m3g/m3h's video time-SHIFT chain: the prepended fixture's frame
    * sequence (doc_id % 3 intro frames — the +7000-displaced generative
    * pixel family — ahead of the real footage), EVERY frame printed at
    * stride 1 through the aHash grid, keyed by frame ordinal. Exposes
    * `<p>bits` (doc_id, ordinal, h_hi, h_lo). `plainBelow400` renders
    * corpus docs UNPREPENDED (the served split); false = every video doc
    * prepended (the m3f batch fixture). */
  private def strideBitsCtes(p: String, plainBelow400: Boolean): String = {
    val padExpr =
      if (plainBelow400) "CASE WHEN doc_id >= 400 THEN doc_id % 3 ELSE 0 END"
      else "doc_id % 3"
    s"""${p}vl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l
        FROM $Docs WHERE doc_id % 4 = 0),
${p}vp AS (SELECT doc_id, l, 16 + l % 48 AS w, 16 + (l * 7) % 48 AS h,
              2 + l % 3 AS nf, $padExpr AS pad FROM ${p}vl),
${p}fs AS (SELECT doc_id, l, w, h, pad,
           unnest(range(0, nf + pad)) AS f FROM ${p}vp),
${p}fg AS (SELECT doc_id, f AS ordinal,
         list_transform(
           list_transform(range(0, 64), k ->
             CASE WHEN f < pad
               THEN ((((k % 8) * w) // 8) * 31 + (((k // 8) * h) // 8) * 17
                     + l + 7000 + f * 7) & 16777215
               ELSE ((((k % 8) * w) // 8) * 31 + (((k // 8) * h) // 8) * 17
                     + l + (f - pad) * 7) & 16777215 END),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM ${p}fs),
${p}fm AS (SELECT doc_id, ordinal, gray, list_sum(gray) // 64 AS mean
           FROM ${p}fg),
${p}bits AS (SELECT doc_id, ordinal,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS BIGINT) AS h_lo
     FROM ${p}fm)"""
  }

  /** m3f — the batch self-search over the prepended fixture: the m5h
    * candidate/verify/count chain verbatim on the frame axis. */
  private val frameShiftNearDupSql: String = s"""
WITH ${strideBitsCtes("fx", plainBelow400 = false)},
fxbands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM fxbits, (SELECT unnest(range(0, 4)) AS band)),
fxok AS (SELECT ordinal, band, key FROM fxbands GROUP BY ordinal, band, key
         HAVING count(*) <= 100),
fxpr AS (SELECT b.doc_id, b.ordinal, b.band, b.key
         FROM fxbands b JOIN fxok USING (ordinal, band, key)),
fxcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ordinal AS oa, b.ordinal AS ob
           FROM fxpr a JOIN fxpr b
             ON a.band = b.band AND a.key = b.key
            AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
            AND a.doc_id < b.doc_id),
fxver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM fxcand c
          JOIN fxbits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN fxbits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM fxver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** m3g/m3h — the served form, ONE definition (the m5e/m5f rule):
    * unprepended corpus (< 400) vs the prepended increment (≥ 400),
    * combined-population rail with only the increment side
    * prune-joined. */
  private val frameShiftServedSql: String = s"""
WITH ${strideBitsCtes("fy", plainBelow400 = true)},
fybands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM fybits, (SELECT unnest(range(0, 4)) AS band)),
fyok AS (SELECT ordinal, band, key FROM fybands
         GROUP BY ordinal, band, key HAVING count(*) <= 100),
fyip AS (SELECT b.doc_id, b.ordinal, b.band, b.key FROM fybands b
         JOIN fyok USING (ordinal, band, key) WHERE b.doc_id >= 400),
fycand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.ordinal AS oa, b.ordinal AS ob
  FROM fybands a JOIN fyip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, a.ordinal, b.ordinal
  FROM fyip a JOIN fyip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < b.doc_id),
fyver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM fycand c
          JOIN fybits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN fybits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM fyver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** m3i/m3j/m3k's DIHEDRAL∘SHIFT chain: the mixed mirrored/plain video
    * fixture (a mirror-rule doc's WHOLE re-edit is horizontally FLIPPED
    * — pixel (x, y) reads the generative formula at (w−1−x, y), intro
    * frames included — behind doc_id % 3 intro frames), EVERY frame
    * printed at stride 1
    * through the full dihedral-CANONICAL recomputation: symmetric
    * sample grid, mean-threshold bits, HUGEINT least over the 8
    * orientations (the m4k arithmetic per stride frame — genuinely
    * independent: the oracle canonicalizes the MIRRORED pixels, the
    * engine canonicalizes pixels it decoded from mirrored PNG frames
    * inside a real AVI, and the two must land on the same print).
    * Exposes `<p>bits` (doc_id, ordinal, h_hi, h_lo). `plainBelow400`
    * renders corpus docs plain-unprepended and EVERY increment doc
    * mirrored+prepended (the m3j/m3k served split); false = the
    * (doc_id/4) % 2 mixed rule everywhere (the m3i batch fixture). */
  private def kStrideBitsCtes(p: String, plainBelow400: Boolean): String = {
    val mirExpr =
      if (plainBelow400) "CASE WHEN doc_id >= 400 THEN 1 ELSE 0 END"
      else "CASE WHEN (doc_id // 4) % 2 = 1 THEN 1 ELSE 0 END"
    val padExpr =
      if (plainBelow400) "CASE WHEN doc_id >= 400 THEN doc_id % 3 ELSE 0 END"
      else "CASE WHEN (doc_id // 4) % 2 = 1 THEN doc_id % 3 ELSE 0 END"
    // the symmetric-grid sample positions (the engine's symGray rule)
    val gx = """(CASE WHEN (k % 8) < 4 THEN ((k % 8) * w) // 8
                     ELSE w - 1 - (((7 - (k % 8)) * w) // 8) END)"""
    val gy = """(CASE WHEN (k // 8) < 4 THEN ((k // 8) * h) // 8
                     ELSE h - 1 - (((7 - (k // 8)) * h) // 8) END)"""
    // a mirrored re-edit flips the WHOLE cut — intro frames included
    // (one flip of the finished re-edit, the engine's aviMirrorWithIntro)
    val px = s"(CASE WHEN mir = 1 THEN w - 1 - $gx ELSE $gx END)"
    val term = "(CASE WHEN f < pad THEN l + 7000 + f * 7 ELSE l + (f - pad) * 7 END)"
    val idx = Seq(
      "k",
      "(k // 8) * 8 + (7 - (k % 8))",
      "(7 - (k // 8)) * 8 + (k % 8)",
      "(7 - (k // 8)) * 8 + (7 - (k % 8))",
      "(k % 8) * 8 + (k // 8)",
      "(k % 8) * 8 + (7 - (k // 8))",
      "(7 - (k % 8)) * 8 + (k // 8)",
      "(7 - (k % 8)) * 8 + (7 - (k // 8))")
    val packs = idx.map { m =>
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS HUGEINT) * 4294967296
       + CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[($m) + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS HUGEINT)"""
    }
    s"""${p}vl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l
        FROM $Docs WHERE doc_id % 4 = 0),
${p}vp AS (SELECT doc_id, l, 16 + l % 48 AS w, 16 + (l * 7) % 48 AS h,
              2 + l % 3 AS nf, $padExpr AS pad, $mirExpr AS mir FROM ${p}vl),
${p}fs AS (SELECT doc_id, l, w, h, pad, mir,
           unnest(range(0, nf + pad)) AS f FROM ${p}vp),
${p}fg AS (SELECT doc_id, f AS ordinal,
         list_transform(
           list_transform(range(0, 64), k ->
             ($px * 31 + $gy * 17 + $term) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM ${p}fs),
${p}fm AS (SELECT doc_id, ordinal, gray, list_sum(gray) // 64 AS mean
           FROM ${p}fg),
${p}fc AS (SELECT doc_id, ordinal,
           least(${packs.mkString(",\n  ")}) AS comb FROM ${p}fm),
${p}bits AS (SELECT doc_id, ordinal,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo FROM ${p}fc)"""
  }

  /** m3i — the batch self-search over the mixed mirrored/plain fixture:
    * the m3f candidate/verify/count chain verbatim over CANONICAL
    * stride prints. */
  private val frameKStrideNearDupSql: String = s"""
WITH ${kStrideBitsCtes("kx", plainBelow400 = false)},
kxbands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM kxbits, (SELECT unnest(range(0, 4)) AS band)),
kxok AS (SELECT ordinal, band, key FROM kxbands GROUP BY ordinal, band, key
         HAVING count(*) <= 100),
kxpr AS (SELECT b.doc_id, b.ordinal, b.band, b.key
         FROM kxbands b JOIN kxok USING (ordinal, band, key)),
kxcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ordinal AS oa, b.ordinal AS ob
           FROM kxpr a JOIN kxpr b
             ON a.band = b.band AND a.key = b.key
            AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
            AND a.doc_id < b.doc_id),
kxver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM kxcand c
          JOIN kxbits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN kxbits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM kxver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** m3j/m3k — the served form, ONE definition (the m5e/m5f rule):
    * plain-unprepended corpus (< 400) vs the mirrored+prepended
    * increment (≥ 400), combined-population rail with only the
    * increment side prune-joined. */
  private val frameKStrideServedSql: String = s"""
WITH ${kStrideBitsCtes("ky", plainBelow400 = true)},
kybands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM kybits, (SELECT unnest(range(0, 4)) AS band)),
kyok AS (SELECT ordinal, band, key FROM kybands
         GROUP BY ordinal, band, key HAVING count(*) <= 100),
kyip AS (SELECT b.doc_id, b.ordinal, b.band, b.key FROM kybands b
         JOIN kyok USING (ordinal, band, key) WHERE b.doc_id >= 400),
kycand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.ordinal AS oa, b.ordinal AS ob
  FROM kybands a JOIN kyip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, a.ordinal, b.ordinal
  FROM kyip a JOIN kyip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < b.doc_id),
kyver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM kycand c
          JOIN kybits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN kybits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM kyver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** The keyframe (frame 0) aHash chain — exposes `abits` (doc_id,
    * h_hi, h_lo); shared by the m7b/m7c near-dup builder and m7d's
    * group oracle. */
  private val VideoKeyframeBitsCteList = s"""kg AS (SELECT doc_id,
         list_transform(
           list_transform(range(0, 64), k ->
             ((((k % 8) * w) // 8) * 31 + (((k // 8) * h) // 8) * 17 + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM vp),
km AS (SELECT doc_id, gray, list_sum(gray) // 64 AS mean FROM kg),
abits AS (SELECT doc_id,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS BIGINT) AS h_lo
     FROM km)"""

  private def videoKeyframeNearDupSql(pairCond: String): String = s"""
WITH $VideoCteList,
$VideoKeyframeBitsCteList,
$BandRailCteList,
acand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM apruned a JOIN apruned b
            ON a.band = b.band AND a.key = b.key AND $pairCond)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM acand c JOIN abits x ON x.doc_id = c.id_a
             JOIN abits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b"""

  /** m7e/m7f's DIHEDRAL-canonical keyframe chain: the m4k HUGEINT-least
    * recomputation applied to frame 0's generative pixels (fno = 0, so
    * the luma term is plain `l`), then the mirrored band rail and the
    * banded candidates under the given pair condition (batch: id_a <
    * id_b; served: the m4d increment-later restriction — the t21d index
    * is all-admitted, so the maintained videokhashes side equals the
    * session split by construction). */
  private def videoDihedralNearDupSql(pairCond: String): String = s"""
WITH $VideoCteList,
${dihedralBitsOver("vp", Seq(), "l", "vk")},
${bandRailOver("vkbits", "ve")},
vkcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM vepruned a JOIN vepruned b
             ON a.band = b.band AND a.key = b.key AND $pairCond)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM vkcand c JOIN vkbits x ON x.doc_id = c.id_a
              JOIN vkbits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b"""

  /** m3d/m3e's per-ordinal canonical chain: the dihedral recomputation
    * per sampled frame (luma term `l + fno·7`), the band rail keyed
    * (ordinal, band, key), same-ordinal candidates under the given pair
    * condition — the m3b/m3c structure over orientation-invariant
    * prints (served form: the m4d increment-later restriction; the t21d
    * corpus is all-admitted, so the maintained framekhashes side equals
    * the session split by construction). */
  private def frameDihedralNearDupSql(pairCond: String): String = s"""
WITH $VideoCteList,
fs AS (SELECT doc_id, l, w, h, i, i * nf // 4 AS fno
       FROM vp, (SELECT unnest(range(0, 4)) AS i)),
${dihedralBitsOver("fs", Seq("i"), "l + fno * 7", "fk")},
fkbands AS (SELECT doc_id, i, band,
         CASE band WHEN 0 THEN h_lo & 65535
                   WHEN 1 THEN (h_lo >> 16) & 65535
                   WHEN 2 THEN h_hi & 65535
                   ELSE (h_hi >> 16) & 65535 END AS key
  FROM fkbits, (SELECT unnest(range(0, 4)) AS band)),
fkok AS (SELECT i, band, key FROM fkbands GROUP BY i, band, key
         HAVING count(*) <= 100),
fkpruned AS (SELECT b.doc_id, b.i, b.band, b.key
             FROM fkbands b JOIN fkok USING (i, band, key)),
fkcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.i AS i
           FROM fkpruned a JOIN fkpruned b
             ON a.i = b.i AND a.band = b.band AND a.key = b.key
            AND $pairCond)
SELECT c.id_a, c.id_b, CAST(c.i AS BIGINT) AS frame_idx,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM fkcand c JOIN fkbits x ON x.doc_id = c.id_a AND x.i = c.i
              JOIN fkbits y ON y.doc_id = c.id_b AND y.i = c.i
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b, frame_idx"""

  /** m5h's TIME-SHIFT-robust audio chain: the shifted fixture's stream
    * (doc_id % 3 · 128 zeros of leading silence ahead of the generative
    * samples), cut into fixed 128-sample windows — constant (silence)
    * windows and the tail partial drop — each window pushed through the
    * 65-bound energy-delta print (the engine's acousticFingerprint over
    * the SLICE; list values are sample+32768, which for the generative
    * stream is the raw mod value and for silence is the constant 32768),
    * then the per-(ordinal, band, key) rail, candidates within ±3
    * ordinals, the exact verify, and the per-offset matched-window
    * count with the ≥ 2 floor. */
  private val audioShiftNearDupSql: String = s"""
WITH shl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs),
shp AS (SELECT doc_id, l, 1 + l % 2 AS ch, 200 + (l * 13) % 600 AS nf,
               (doc_id % 3) * 128 AS pad FROM shl),
shn AS (SELECT doc_id, l, pad, pad + nf * ch AS n FROM shp),
shw AS (SELECT doc_id, l, pad, unnest(range(0, n // 128)) AS w FROM shn),
shg AS (SELECT doc_id, w AS ordinal,
         list_transform(range(0, 128), j ->
           CASE WHEN w * 128 + j < pad THEN 32768
                ELSE ((w * 128 + j - pad) * 37 + l * 101) % 65536 END) AS vals
        FROM shw),
shc AS (SELECT doc_id, ordinal, vals FROM shg
        WHERE list_min(vals) <> list_max(vals)),
she AS (SELECT doc_id, ordinal,
         list_transform(range(0, 65), u ->
           list_sum(list_slice(vals, (u * 128) // 65 + 1,
                               ((u + 1) * 128) // 65))) AS e
        FROM shc),
shbits AS (SELECT doc_id, ordinal,
   CAST(list_sum(list_transform(range(32, 64), k ->
     CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << (k - 32))
          ELSE 0 END)) AS BIGINT) AS h_hi,
   CAST(list_sum(list_transform(range(0, 32), k ->
     CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << k)
          ELSE 0 END)) AS BIGINT) AS h_lo
   FROM she),
shbands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM shbits, (SELECT unnest(range(0, 4)) AS band)),
shok AS (SELECT ordinal, band, key FROM shbands GROUP BY ordinal, band, key
         HAVING count(*) <= 100),
shpr AS (SELECT b.doc_id, b.ordinal, b.band, b.key
         FROM shbands b JOIN shok USING (ordinal, band, key)),
shcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ordinal AS oa, b.ordinal AS ob
           FROM shpr a JOIN shpr b
             ON a.band = b.band AND a.key = b.key
            AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
            AND a.doc_id < b.doc_id),
shver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM shcand c
          JOIN shbits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN shbits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM shver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** m5i/m5j's SERVED shift chain, ONE definition (the m5e/m5f
    * shared-oracle discipline — the t21d corpus is all-admitted, so the
    * maintained audiowins side equals the session cache's corpus split):
    * corpus docs (< 400) window-printed UNPADDED, increment docs
    * (≥ 400) behind their doc_id%3-window silence pads, the combined-
    * population rail per (ordinal, band, key) with only the INCREMENT
    * side prune-joined (the engine's m3c form: corpus rows participate
    * through the pruned increment keys; within-increment pairs prune
    * both sides), candidates within ±3 ordinals, exact verify, and the
    * per-offset matched-window count with the ≥ 2 floor. A padded
    * recycler is caught at exactly its pad offset. */
  private val audioShiftServedSql: String = s"""
WITH svl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs),
svp AS (SELECT doc_id, l, 1 + l % 2 AS ch, 200 + (l * 13) % 600 AS nf,
               CASE WHEN doc_id < 400 THEN 0
                    ELSE (doc_id % 3) * 128 END AS pad FROM svl),
svn AS (SELECT doc_id, l, pad, pad + nf * ch AS n FROM svp),
svw AS (SELECT doc_id, l, pad, unnest(range(0, n // 128)) AS w FROM svn),
svg AS (SELECT doc_id, w AS ordinal,
         list_transform(range(0, 128), j ->
           CASE WHEN w * 128 + j < pad THEN 32768
                ELSE ((w * 128 + j - pad) * 37 + l * 101) % 65536 END) AS vals
        FROM svw),
svc AS (SELECT doc_id, ordinal, vals FROM svg
        WHERE list_min(vals) <> list_max(vals)),
sve AS (SELECT doc_id, ordinal,
         list_transform(range(0, 65), u ->
           list_sum(list_slice(vals, (u * 128) // 65 + 1,
                               ((u + 1) * 128) // 65))) AS e
        FROM svc),
svbits AS (SELECT doc_id, ordinal,
   CAST(list_sum(list_transform(range(32, 64), k ->
     CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << (k - 32))
          ELSE 0 END)) AS BIGINT) AS h_hi,
   CAST(list_sum(list_transform(range(0, 32), k ->
     CASE WHEN e[k + 2] > e[k + 1] THEN (CAST(1 AS BIGINT) << k)
          ELSE 0 END)) AS BIGINT) AS h_lo
   FROM sve),
svbands AS (SELECT doc_id, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM svbits, (SELECT unnest(range(0, 4)) AS band)),
svok AS (SELECT ordinal, band, key FROM svbands
         GROUP BY ordinal, band, key HAVING count(*) <= 100),
svip AS (SELECT b.doc_id, b.ordinal, b.band, b.key FROM svbands b
         JOIN svok USING (ordinal, band, key) WHERE b.doc_id >= 400),
svcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.ordinal AS oa, b.ordinal AS ob
  FROM svbands a JOIN svip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, a.ordinal, b.ordinal
  FROM svip a JOIN svip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND a.doc_id < b.doc_id),
svver AS (SELECT c.id_a, c.id_b, c.ob - c.oa AS win_offset
          FROM svcand c
          JOIN svbits x ON x.doc_id = c.id_a AND x.ordinal = c.oa
          JOIN svbits y ON y.doc_id = c.id_b AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM svver GROUP BY id_a, id_b, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, win_offset"""

  /** m5k/m5l's REVERSAL-canonical chain: the SYMMETRIC window bounds
    * (b_k = k·n//65 for k ≤ 32, n − (65−k)·n//65 above — exactly the
    * engine's rule, so time reversal reverses the energy array), the
    * forward sign-of-delta pack AND the reversed-clip pack (bit k =
    * e[64−k] > e[65−k], 1-based) computed from ONE energy list, their
    * HUGEINT minimum split back after (the m4k least discipline).
    * Exposes `rvbits` (doc_id, nf, h_hi, h_lo). */
  private val ReversalBitsCteList: String = {
    def pk(cond: String): String =
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
       CASE WHEN $cond THEN (CAST(1 AS BIGINT) << (k - 32))
            ELSE 0 END)) AS HUGEINT) * 4294967296
     + CAST(list_sum(list_transform(range(0, 32), k ->
       CASE WHEN $cond THEN (CAST(1 AS BIGINT) << k)
            ELSE 0 END)) AS HUGEINT)"""
    s"""rvl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs),
rvp AS (SELECT doc_id, l, 200 + (l * 13) % 600 AS nf,
               (1 + l % 2) * (200 + (l * 13) % 600) AS n FROM rvl),
rve AS (SELECT doc_id, nf,
         list_transform(range(0, 65), w -> list_sum(list_transform(
           range(CASE WHEN w <= 32 THEN w * n // 65
                      ELSE n - (65 - w) * n // 65 END,
                 CASE WHEN w + 1 <= 32 THEN (w + 1) * n // 65
                      ELSE n - (65 - (w + 1)) * n // 65 END),
           i -> (i * 37 + l * 101) % 65536))) AS e
        FROM rvp),
rvc AS (SELECT doc_id, nf,
         least(${pk("e[k + 2] > e[k + 1]")},
               ${pk("e[64 - k] > e[65 - k]")}) AS comb
        FROM rve),
rvbits AS (SELECT doc_id, nf,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo
     FROM rvc)"""
  }

  /** m5m/m5n/m5o's REVERSAL∘SHIFT chain: the mixed reversed/plain
    * fixture stream (a reversed doc's sample at stream position p ≥ pad
    * is the generative formula at n0−1−(p−pad); silence is the 32768
    * offset value), cut into BOTH cut families' 128-sample windows —
    * f from the head (start j·128), b from the tail (start n−(j+1)·128)
    * — each window through the SYMMETRIC-bound energy list and the
    * fwd/rev pack HUGEINT least (the m5k arithmetic PER WINDOW; constant
    * windows drop). Exposes `<p>bits` (doc_id, family, ordinal, h_hi,
    * h_lo). `plainBelow400` renders docs under 400 PLAIN whatever their
    * parity (the served corpus split); false = the mixed rule everywhere
    * (the m5m batch fixture). */
  private def revWinBitsCtes(p: String, plainBelow400: Boolean): String = {
    val revCond =
      if (plainBelow400) "doc_id >= 400 AND doc_id % 2 = 1"
      else "doc_id % 2 = 1"
    def pk(cond: String): String =
      s"""CAST(list_sum(list_transform(range(32, 64), k ->
       CASE WHEN $cond THEN (CAST(1 AS BIGINT) << (k - 32))
            ELSE 0 END)) AS HUGEINT) * 4294967296
     + CAST(list_sum(list_transform(range(0, 32), k ->
       CASE WHEN $cond THEN (CAST(1 AS BIGINT) << k)
            ELSE 0 END)) AS HUGEINT)"""
    s"""${p}l AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l FROM $Docs),
${p}p AS (SELECT doc_id, l, (1 + l % 2) * (200 + (l * 13) % 600) AS n0,
         CASE WHEN $revCond THEN (doc_id % 3) * 128 ELSE 0 END AS pad,
         CASE WHEN $revCond THEN 1 ELSE 0 END AS rev FROM ${p}l),
${p}n AS (SELECT doc_id, l, n0, pad, rev, pad + n0 AS n, family
          FROM ${p}p, (SELECT unnest(['f', 'b']) AS family)),
-- the family cross join rides a LEVEL ABOVE the unnest: DuckDB 1.x hits
-- an internal binder error ("Failed to bind column reference") when a
-- list lambda later references the unnest alias of a SELECT that also
-- carried a cross join
${p}w AS (SELECT doc_id, l, n0, pad, rev, n, family,
          unnest(range(0, n // 128)) AS j FROM ${p}n),
${p}s AS (SELECT doc_id, l, n0, pad, rev, family, j,
          CASE WHEN family = 'f' THEN j * 128
               ELSE n - (j + 1) * 128 END AS st FROM ${p}w),
${p}g AS (SELECT doc_id, family, j AS ordinal,
           list_transform(range(0, 128), t ->
             CASE WHEN st + t < pad THEN 32768
                  WHEN rev = 1
                    THEN ((n0 - 1 - (st + t - pad)) * 37 + l * 101) % 65536
                  ELSE ((st + t - pad) * 37 + l * 101) % 65536 END) AS vals
          FROM ${p}s),
${p}c AS (SELECT doc_id, family, ordinal, vals FROM ${p}g
          WHERE list_min(vals) <> list_max(vals)),
${p}e AS (SELECT doc_id, family, ordinal,
           list_transform(range(0, 65), w -> list_sum(list_slice(vals,
             CASE WHEN w <= 32 THEN w * 128 // 65
                  ELSE 128 - (65 - w) * 128 // 65 END + 1,
             CASE WHEN w + 1 <= 32 THEN (w + 1) * 128 // 65
                  ELSE 128 - (65 - (w + 1)) * 128 // 65 END))) AS e
          FROM ${p}c),
${p}m AS (SELECT doc_id, family, ordinal,
           least(${pk("e[k + 2] > e[k + 1]")},
                 ${pk("e[64 - k] > e[65 - k]")}) AS comb
          FROM ${p}e),
${p}bits AS (SELECT doc_id, family, ordinal,
       CAST(comb // 4294967296 AS BIGINT) AS h_hi,
       CAST(comb % 4294967296 AS BIGINT) AS h_lo FROM ${p}m)"""
  }

  /** The (family, ordinal, band, key)-railed band rows over a
    * `<p>bits` table — shared by the m5m self form and the m5n/m5o
    * served form. */
  private def revWinBandCtes(p: String): String = s"""
${p}bands AS (SELECT doc_id, family, ordinal, band,
   CASE band WHEN 0 THEN h_lo & 65535
             WHEN 1 THEN (h_lo >> 16) & 65535
             WHEN 2 THEN h_hi & 65535
             ELSE (h_hi >> 16) & 65535 END AS key
  FROM ${p}bits, (SELECT unnest(range(0, 4)) AS band)),
${p}ok AS (SELECT family, ordinal, band, key FROM ${p}bands
           GROUP BY family, ordinal, band, key HAVING count(*) <= 100)"""

  /** m5m — the batch self-search: three family legs ((b,b) skipped, the
    * engine's rule), candidates within ±3 ordinals, exact verify, the
    * per-(orient, offset) matched-window count with the ≥ 2 floor. */
  private val audioRevNearDupSql: String = s"""
WITH ${revWinBitsCtes("rw", plainBelow400 = false)},${revWinBandCtes("rw")},
rwpr AS (SELECT b.doc_id, b.family, b.ordinal, b.band, b.key
         FROM rwbands b JOIN rwok USING (family, ordinal, band, key)),
rwcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.family AS fa, b.family AS fb,
                  a.ordinal AS oa, b.ordinal AS ob
           FROM rwpr a JOIN rwpr b
             ON a.band = b.band AND a.key = b.key
            AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
            AND a.doc_id < b.doc_id
            AND NOT (a.family = 'b' AND b.family = 'b')),
rwver AS (SELECT c.id_a, c.id_b, c.fa || c.fb AS orient,
                 c.ob - c.oa AS win_offset
          FROM rwcand c
          JOIN rwbits x ON x.doc_id = c.id_a AND x.family = c.fa
                       AND x.ordinal = c.oa
          JOIN rwbits y ON y.doc_id = c.id_b AND y.family = c.fb
                       AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, orient, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM rwver GROUP BY id_a, id_b, orient, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, orient, win_offset"""

  /** m5n/m5o — the served form, ONE definition (the m5e/m5f rule):
    * plain corpus (< 400) vs the mixed-rule increment (≥ 400), combined-
    * population rail with only the increment side prune-joined, the
    * same three family legs. */
  private val audioRevServedSql: String = s"""
WITH ${revWinBitsCtes("sv", plainBelow400 = true)},${revWinBandCtes("sv")},
svip AS (SELECT b.doc_id, b.family, b.ordinal, b.band, b.key
         FROM svbands b JOIN svok USING (family, ordinal, band, key)
         WHERE b.doc_id >= 400),
svcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.family AS fa, b.family AS fb, a.ordinal AS oa, b.ordinal AS ob
  FROM svbands a JOIN svip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND NOT (a.family = 'b' AND b.family = 'b')
   AND a.doc_id < 400
  UNION
  SELECT DISTINCT a.doc_id, b.doc_id, a.family, b.family,
         a.ordinal, b.ordinal
  FROM svip a JOIN svip b
    ON a.band = b.band AND a.key = b.key
   AND b.ordinal BETWEEN a.ordinal - 3 AND a.ordinal + 3
   AND NOT (a.family = 'b' AND b.family = 'b')
   AND a.doc_id < b.doc_id),
svver AS (SELECT c.id_a, c.id_b, c.fa || c.fb AS orient,
                 c.ob - c.oa AS win_offset
          FROM svcand c
          JOIN svbits x ON x.doc_id = c.id_a AND x.family = c.fa
                       AND x.ordinal = c.oa
          JOIN svbits y ON y.doc_id = c.id_b AND y.family = c.fb
                       AND y.ordinal = c.ob
          WHERE bit_count(xor(x.h_hi, y.h_hi))
                + bit_count(xor(x.h_lo, y.h_lo)) <= 3)
SELECT id_a, id_b, orient, CAST(win_offset AS BIGINT) AS win_offset,
       CAST(count(*) AS BIGINT) AS n_matched
FROM svver GROUP BY id_a, id_b, orient, win_offset HAVING count(*) >= 2
ORDER BY id_a, id_b, orient, win_offset"""

  /** t21's sketch chain: d9's word/k-gram hash arithmetic kept in array
    * form (never unnested) so the window-min runs as a per-doc lambda —
    * exposes `fps` (doc_id, fp). */
  private val WinnowCtes = s"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
wh AS (SELECT doc_id, $WordHashExpr AS wh, len(w) AS nw
       FROM docs WHERE len(w) >= 5),
khs AS (SELECT doc_id, list_transform(range(1, nw - 3), i ->
          ${khPoly("wh", "i")}) AS kh
        FROM wh),
fps AS (SELECT doc_id, unnest(list_distinct(list_transform(
          range(0, greatest(len(kh) - 4, 0) + 1), i ->
          list_min(list_slice(kh, i + 1, i + 4))))) AS fp
        FROM khs WHERE len(kh) > 0)"""

  /** The served winnow screen (t21c and its maintained-side twin t21d —
    * one definition, the e4/e5 shared-oracle discipline). */
  private val WinnowScreenSql = s"""$WinnowCtes,
rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),
pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM pr a JOIN pr b ON a.fp = b.fp AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
  AND (a.doc_id < 400 OR a.doc_id < b.doc_id)
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY id_a, id_b"""

  private def spanOracle(matchExtra: String): String = s"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),${spanSeedCtes("", matchExtra)}
SELECT id_a, id_b, CAST(min(pos_a) AS BIGINT) AS start_a,
       CAST(min(pos_a) - diag AS BIGINT) AS start_b,
       CAST(count(*) + 4 AS BIGINT) AS span_len
FROM isl GROUP BY id_a, id_b, diag, island
HAVING count(*) + 4 >= 8
ORDER BY id_a, id_b, start_a, start_b"""

  /** d8's k=4-gram collision chain, name-spaced by `p`: train side from
    * `trainDocs` (doc_id, w) and bench side from `benchDocs` (bench_id,
    * w), both caller-supplied relations; exposes the exploded distinct
    * 4-gram sets `<p>tset` (doc_id, sh) and `<p>bset` (bench_id, sh). */
  private def contamCtes(p: String, trainDocs: String, benchDocs: String): String = s"""
${p}twh AS (SELECT doc_id, list_transform(w, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS wh, len(w) AS nw
        FROM $trainDocs WHERE len(w) >= 4),
${p}tsh AS (SELECT doc_id, list_distinct(list_transform(range(1, nw - 2), i ->
          (wh[i]*29791 + wh[i+1]*961 + wh[i+2]*31 + wh[i+3]) % 1000000007)) AS arr
        FROM ${p}twh),
${p}tset AS (SELECT doc_id, unnest(arr) AS sh FROM ${p}tsh),
${p}bwh AS (SELECT bench_id, list_transform(w, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS wh, len(w) AS nw
        FROM $benchDocs WHERE len(w) >= 4),
${p}bsh AS (SELECT bench_id, list_distinct(list_transform(range(1, nw - 2), i ->
          (wh[i]*29791 + wh[i+1]*961 + wh[i+2]*31 + wh[i+3]) % 1000000007)) AS arr
        FROM ${p}bwh),
${p}bset AS (SELECT bench_id, unnest(arr) AS sh FROM ${p}bsh)"""

  /** The incremental admission verdict (c2/c2b): every screen is the
    * corresponding standalone oracle's fragment with the increment
    * (doc_id >= 400) as its probe side, composed with pipeline-order
    * precedence. `withSemantic` splices the e-tier screen: the e5b
    * frozen-centroid IVF chain (build corpus = vec_id < 400) + e7's
    * within-cell pairs (6-dp cos ≥ 0.4, 256-member cell rail) restricted
    * to increment-side id_b, corpus member as id_a. */
  private def admissionOracle(withSemantic: Boolean = false,
      withImage: Boolean = false, withAudio: Boolean = false,
      withShift: Boolean = false): String = {
    // the SHIFT rungs (c6c): the m5i/m5n/m3g row oracles spliced in
    // VERBATIM as subqueries (one definition per screen across the
    // whole registry — the m5e/m5f discipline lifted to the admission
    // composition), folded to min-witness per rejected doc
    val shiftCtes = if (!withShift) "" else s"""
audshp AS (SELECT id_a, id_b FROM ($audioShiftServedSql) ashift
           UNION SELECT id_a, id_b FROM ($audioRevServedSql) arev),
audshd AS (SELECT id_b AS doc_id, min(id_a) AS audsh_id FROM audshp
           GROUP BY id_b),
vidshp AS (SELECT id_a, id_b FROM ($frameShiftServedSql) vshift),
vidshd AS (SELECT id_b AS doc_id, min(id_a) AS vidsh_id FROM vidshp
           GROUP BY id_b),"""
    val shiftJoin = if (withShift)
      " LEFT JOIN audshd USING (doc_id) LEFT JOIN vidshd USING (doc_id)"
    else ""
    val shiftWhen = if (withShift)
      "\n            WHEN audshd.audsh_id IS NOT NULL THEN 'audio_shift_dup'" +
        "\n            WHEN vidshd.vidsh_id IS NOT NULL THEN 'video_shift_dup'"
    else ""
    val shiftCoalesce = if (withShift) " audshd.audsh_id, vidshd.vidsh_id,"
    else ""
    val semCtes = if (!withSemantic) "" else s"""${ivfChainCtes(16, 2, 64, Some("vec_id < 400"))},
cellsz AS (SELECT cell FROM a2 GROUP BY cell HAVING count(*) <= 256),
semp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM a2 a JOIN a2 b ON a.cell = b.cell
         JOIN cellsz cz ON cz.cell = a.cell
         WHERE b.vec_id >= 400 AND a.vec_id <> b.vec_id
           AND (a.vec_id < 400 OR a.vec_id < b.vec_id)
           AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
sem AS (SELECT id_b AS doc_id, min(id_a) AS sem_id FROM semp GROUP BY id_b),"""
    val semJoin = if (withSemantic) " LEFT JOIN sem USING (doc_id)" else ""
    val semWhen = if (withSemantic)
      "\n            WHEN sem.sem_id IS NOT NULL THEN 'semantic_dup'" else ""
    val semCoalesce = if (withSemantic) " sem.sem_id," else ""
    // the image rung (c6): brute-force Hamming ≤ 3 over the recomputed
    // fingerprints — m4d's oracle pattern with the increment as probe
    // side and the same orientation rule as semp (corpus as id_a, else
    // (min, max)); non-video docs only (the bits CTE's domain)
    val imgCtes = if (!withImage) "" else s"""$ImagePhashCteList,
imgp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bits a JOIN bits b ON b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)
         WHERE bit_count(xor(a.h_hi, b.h_hi))
               + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
imgd AS (SELECT id_b AS doc_id, min(id_a) AS img_id FROM imgp GROUP BY id_b),"""
    val imgJoin = if (withImage) " LEFT JOIN imgd USING (doc_id)" else ""
    val imgWhen = if (withImage)
      "\n            WHEN imgd.img_id IS NOT NULL THEN 'image_dup'" else ""
    val imgCoalesce = if (withImage) " imgd.img_id," else ""
    // the audio rung (c6b): exact PCM-content matches over the recomputed
    // generative fingerprints — m5c's oracle pattern, same orientation
    // rule; covers EVERY doc (the audio rendition has no video carve-out)
    val audCtes = if (!withAudio) "" else s"""$AudioCteList,
audp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM am a JOIN am b ON a.pcm_hash = b.pcm_hash
           AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)),
audd AS (SELECT id_b AS doc_id, min(id_a) AS aud_id FROM audp GROUP BY id_b),"""
    val audJoin = if (withAudio) " LEFT JOIN audd USING (doc_id)" else ""
    val audWhen = if (withAudio)
      "\n            WHEN audd.aud_id IS NOT NULL THEN 'audio_dup'" else ""
    val audCoalesce = if (withAudio) " audd.aud_id," else ""
    s"""WITH $ShingleCtes,${bandCandCtes(" AND bb.doc_id >= 400")},${verifiedPairCtes(0.5)},
dup AS (SELECT id_b AS doc_id, min(id_a) AS dup_id FROM pairs GROUP BY id_b),${spanSeedCtes("sp", " AND b.doc_id >= 400")},
spspans AS (SELECT id_a, id_b FROM spisl
            GROUP BY id_a, id_b, diag, island HAVING count(*) + 4 >= 8),
span AS (SELECT id_b AS doc_id, min(id_a) AS span_id FROM spspans GROUP BY id_b),${contamCtes("c2",
      "(SELECT doc_id, w FROM docs WHERE doc_id >= 400)",
      "(SELECT doc_id AS bench_id, w FROM docs WHERE doc_id % 50 = 0)")},
chits AS (SELECT t.doc_id, b.bench_id FROM c2tset t JOIN c2bset b ON t.sh = b.sh
          GROUP BY t.doc_id, b.bench_id HAVING count(*) >= 1),
contam AS (SELECT doc_id, min(bench_id) AS contam_id FROM chits GROUP BY doc_id),$semCtes$imgCtes$audCtes$shiftCtes$QualityCte
SELECT q.doc_id,
       CASE WHEN dup.dup_id IS NOT NULL THEN 'near_dup'
            WHEN span.span_id IS NOT NULL THEN 'span_dup'$semWhen$imgWhen$audWhen$shiftWhen
            WHEN contam.contam_id IS NOT NULL THEN 'contaminated'
            WHEN q.quality_score < 0.5 THEN 'low_quality'
            ELSE 'admitted' END AS verdict,
       coalesce(dup.dup_id, span.span_id,$semCoalesce$imgCoalesce$audCoalesce$shiftCoalesce contam.contam_id) AS detail_id,
       q.quality_score
FROM q LEFT JOIN dup USING (doc_id) LEFT JOIN span USING (doc_id)
LEFT JOIN contam USING (doc_id)$semJoin$imgJoin$audJoin$shiftJoin
WHERE q.doc_id >= 400 ORDER BY q.doc_id"""
  }

  private def jaccardTail(threshold: Double): String = s"""
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sset x ON x.doc_id = c.id_a
  JOIN sset y ON y.doc_id = c.id_b AND y.sh = x.sh
  GROUP BY c.id_a, c.id_b)
SELECT i.id_a, i.id_b,
       round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) >= $threshold
ORDER BY id_a, id_b"""

  private def duckPlane(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  /** e4 oracle: SimilarityOps.ivfTopK's deterministic Lloyd passes unrolled
    * as chained CTEs. Structure mirrors the Spark side exactly — seed =
    * first `nCells` vectors by id; `iterations` assignment passes with
    * `iterations-1` 6-dp-rounded mean updates between them; the last pass
    * is the search index; probes = top `nProbe` cells by score (tie: higher
    * cell, matching Spark's array_max/array_sort struct ordering). */
  // argmax of 2·dot(v,c) − ||c||² == argmin squared distance; 6-dp
  // rounded to mirror SimilarityOps.scoreStructs, so cell ties break on
  // identical values in both engines
  private def ivfScore(v: String, c: String) =
    s"round(2*list_dot_product($v, $c) - list_dot_product($c, $c), 6)"

  /** The Lloyd-chain CTE list shared by every IVF-backed oracle (e4/e5/
    * e5b/e6/e7) — defined once so the seeding, pass count and 6-dp mean
    * rounding cannot drift between oracles gating the same engine index.
    * Exposes `e` (all vectors), the final assignment `a<iterations>`
    * (vec_id, v, cell) and its centroids `c<iterations-1>` (cell, c). */
  private def ivfChainCtes(nCells: Int, iterations: Int, dim: Int,
      corpusWhere: Option[String] = None, p: String = "",
      vExpr: String = "embedding::DOUBLE[]"): String = {
    def score(v: String, c: String) = ivfScore(v, c)
    // `src`: which vector set this pass assigns. The Lloyd passes draw
    // from `ec` (the BUILD corpus — all vectors unless corpusWhere
    // restricts it, mirroring e5b's corpus-built index); the final pass
    // assigns `e` (everything, i.e. corpus + appended increment).
    // `p` name-spaces every CTE so several chains can coexist in one
    // statement (the PQ oracle runs one chain per subspace); `vExpr`
    // selects the vector — a slice expression for subspace chains.
    def assignCte(name: String, cent: String, src: String = s"${p}ec") = s"""
$name AS (SELECT vec_id, v, cell FROM (
  SELECT e.vec_id, e.v, s.cell,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY ${score("e.v", "s.c")} DESC, s.cell DESC) AS rn
  FROM $src e, $cent s) WHERE rn = 1)"""
    def updateCte(mName: String, cName: String, assigned: String, prev: String) = s"""
$mName AS (SELECT cell, list(m ORDER BY d) AS c FROM (
  SELECT cell, d, round(avg(v[d]), 6) AS m
  FROM $assigned, (SELECT unnest(range(1, ${dim + 1})) AS d) GROUP BY cell, d)
  GROUP BY cell),
$cName AS (SELECT s.cell, coalesce(m.c, s.c) AS c
           FROM $prev s LEFT JOIN $mName m ON m.cell = s.cell)"""
    val lloyd = (1 until iterations).map { i =>
      val prev = if (i == 1) s"${p}seed" else s"${p}c${i - 1}"
      assignCte(s"${p}a$i", prev) + "," +
        updateCte(s"${p}m$i", s"${p}c$i", s"${p}a$i", prev)
    }.mkString(",")
    val last = s"${p}a$iterations"
    val lastCent = s"${p}c${iterations - 1}"
    s"""${p}e AS (SELECT vec_id, $vExpr AS v FROM $Emb),
${p}ec AS (SELECT * FROM ${p}e${corpusWhere.map(w => s" WHERE $w").getOrElse("")}),
${p}seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS c
         FROM (SELECT vec_id, v FROM ${p}ec ORDER BY vec_id LIMIT $nCells)),$lloyd,
${assignCte(last, lastCent, s"${p}e")}"""
  }

  /** The m per-subspace Lloyd chains (prefix `s<i>` over the sliced
    * vector) + the assembled `codes` CTE (vec_id, code_0..code_{m-1}) —
    * shared by the e11 and e12 oracles so the codebook constants cannot
    * drift between them. */
  private def pqCodesCtes(m: Int, k: Int, iterations: Int, dim: Int): String = {
    val sub = dim / m
    val chains = (0 until m).map { s =>
      ivfChainCtes(k, iterations, sub, None, p = s"s$s",
        vExpr = s"(embedding::DOUBLE[])[${s * sub + 1}:${(s + 1) * sub}]")
    }.mkString(",\n")
    val codeJoin = (1 until m)
      .map(s => s"JOIN s${s}a$iterations x$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"x$s.cell AS code_$s").mkString(", ")
    s"""$chains,
codes AS (SELECT x0.vec_id, $codeCols FROM s0a$iterations x0 $codeJoin)"""
  }

  /** ADC assembly fragments over the `codes` alias `c` and a query-vector
    * expression `qv`: (codebook joins, Σ per-subspace dots, Σ codebook
    * self-dots) — the asymmetric cosine's three pieces. */
  private def adcFragments(m: Int, iterations: Int, dim: Int,
      qv: String): (String, String, String) = {
    val sub = dim / m
    val cbJoins = (0 until m)
      .map(s => s"JOIN s${s}c${iterations - 1} cb$s ON cb$s.cell = c.code_$s")
      .mkString("\n           ")
    val dotSum = (0 until m)
      .map(s => s"list_dot_product($qv[${s * sub + 1}:${(s + 1) * sub}], cb$s.c)")
      .mkString(" + ")
    val normSum = (0 until m)
      .map(s => s"list_dot_product(cb$s.c, cb$s.c)").mkString(" + ")
    (cbJoins, dotSum, normSum)
  }

  private def adcRankSql(kTop: Int): String = s"""
SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id AS neighbor_id
FROM (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY adc DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= $kTop ORDER BY query_id, rank"""

  /** e11's PQ/ADC oracle: the shared subspace chains + codes, the
    * asymmetric cosine over the FULL coded corpus — the mirror of
    * SimilarityOps.pqBuild + pqTopK. */
  private def pqOracle(m: Int, k: Int, iterations: Int, dim: Int,
      kTop: Int): String = {
    val (cbJoins, dotSum, normSum) = adcFragments(m, iterations, dim, "q.qv")
    s"""
WITH ${pqCodesCtes(m, k, iterations, dim)},
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM $Emb WHERE vec_id < 8),
scored AS (SELECT q.query_id, c.vec_id,
                  round(($dotSum)
                        / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt($normSum)), 6) AS adc
           FROM q CROSS JOIN codes c
           $cbJoins
           WHERE c.vec_id <> q.query_id)${adcRankSql(kTop)}"""
  }

  /** e12's IVFADC oracle: the SHARED coarse IVF chain (e4/e5's CTEs)
    * routes each query to its `nProbe` cells, and e11's ADC assembly is
    * restricted to the probed cells' members — probe pruning × code
    * compression, mirrored piece by piece. */
  private def ivfAdcOracle(nCells: Int, nProbe: Int, m: Int, k: Int,
      iterations: Int, dim: Int, kTop: Int): String = {
    val (cbJoins, dotSum, normSum) = adcFragments(m, iterations, dim, "p.qv")
    val last = s"a$iterations"
    val lastCent = s"c${iterations - 1}"
    s"""
WITH ${ivfChainCtes(nCells, iterations, dim)},
${pqCodesCtes(m, k, iterations, dim)},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
probes AS (SELECT query_id, qv, cell FROM (
  SELECT q.query_id, q.qv, s.cell,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY ${ivfScore("q.qv", "s.c")} DESC, s.cell DESC) AS rn
  FROM q, $lastCent s) WHERE rn <= $nProbe),
scored AS (SELECT p.query_id, c.vec_id,
                  round(($dotSum)
                        / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt($normSum)), 6) AS adc
           FROM probes p JOIN $last a ON a.cell = p.cell AND a.vec_id <> p.query_id
           JOIN codes c ON c.vec_id = a.vec_id
           $cbJoins)${adcRankSql(kTop)}"""
  }

  private def ivfOracle(nCells: Int, nProbe: Int, k: Int, iterations: Int,
      dim: Int, tail: Option[String] = None,
      corpusWhere: Option[String] = None,
      memberFilter: Option[String] = None,
      probeExpr: Option[String] = None): String = {
    val last = s"a$iterations"
    val lastCent = s"c${iterations - 1}"
    // memberFilter splices a join suffix onto the default tail's scored
    // scan (e13b's allow-set), keeping the rank window and `rank <= $k`
    // single-sourced — a custom tail with its own literal k would drift.
    // probeExpr replaces the literal probe bound (e13c's adaptive dial —
    // a scalar subquery recomputing the engine's integer arithmetic).
    s"""
WITH ${ivfChainCtes(nCells, iterations, dim, corpusWhere)},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
probes AS (SELECT query_id, qv, cell FROM (
  SELECT q.query_id, q.qv, s.cell,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY ${ivfScore("q.qv", "s.c")} DESC, s.cell DESC) AS rn
  FROM q, $lastCent s) WHERE rn <= ${probeExpr.getOrElse(nProbe.toString)}),
scored AS (SELECT p.query_id, a.vec_id, round(list_cosine_similarity(p.qv, a.v), 6) AS cos
           FROM probes p JOIN $last a ON a.cell = p.cell AND a.vec_id <> p.query_id)
${tail.getOrElse(s"""SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored${memberFilter.getOrElse("")})
WHERE rank <= $k ORDER BY query_id, rank""")}"""
  }

  /** e6 oracle tail: majority vote over the same `scored` CTE's top-k
    * (ties → the smaller label), joined back to the query's own label. */
  private def knnClassifyTail(k: Int): String = s""",
topk AS (SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored) WHERE rank <= $k),
votes AS (SELECT t.query_id, l.label, CAST(count(*) AS BIGINT) AS n_votes
          FROM topk t JOIN $Emb l ON l.vec_id = t.vec_id
          GROUP BY t.query_id, l.label),
pred AS (SELECT query_id, label AS pred_label, n_votes,
                row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, label) AS rn
         FROM votes)
SELECT p.query_id, CAST(e0.label AS BIGINT) AS label,
       CAST(p.pred_label AS BIGINT) AS pred_label, p.n_votes
FROM pred p JOIN $Emb e0 ON e0.vec_id = p.query_id
WHERE p.rn = 1 ORDER BY p.query_id"""

  private def duckBucket(vecCol: String, nPlanes: Int, dim: Int): String = {
    val hps = SimilarityOps.hyperplanes(nPlanes, dim)
    hps.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vecCol, ${duckPlane(p)}) >= 0 THEN ${1 << (nPlanes - 1 - j)} ELSE 0 END)"
    }.mkString(" + ")
  }

  val sql: Map[String, String] = Map(
    // ---- serving query surface (P1-P8, O1-O4) --------------------------
    "p1_point_lookup" -> withModel(
      s"SELECT $ObjCols FROM objects WHERE _id = '0x000007' ORDER BY _id LIMIT 50"),

    "p2_multi_id" -> withModel(
      s"SELECT $ObjCols FROM objects WHERE _id IN ('0x000007','0x000011','0x000042','0x000123') ORDER BY _id LIMIT 50"),

    "p3_owner" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE (owner_kind = 'Address' AND owner IN ('0xa00000'))
             OR (owner_kind = 'Object' AND owner IN ('0xa00000'))
          ORDER BY _id LIMIT 50"""),

    "p4_owners" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE (owner_kind = 'Address' AND owner IN ('0xa00000','0xa00004','0xa00008'))
             OR (owner_kind = 'Object' AND owner IN ('0xa00000','0xa00004','0xa00008'))
          ORDER BY _id LIMIT 50"""),

    "p5_type_prefix" -> withModel(
      s"SELECT $ObjCols FROM objects WHERE ${prefix("type_full", "0x1::click")} ORDER BY _id LIMIT 100"),

    "p6_multi_type" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE ${prefix("type_full", "0x0::view")}
             OR ${prefix("type_full", "0x2::dynamic_field::Field<0x1::string::String,0x0")}
          ORDER BY _id LIMIT 100"""),

    "p7_dynfield_parents" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE _id IN (
            SELECT DISTINCT owner FROM objects
            WHERE $DynChild
              AND json_extract_string(fields_json, '$$.name.fields.k') IN ('87','12'))
          ORDER BY _id LIMIT 100"""),

    "p7b_value_owner_filter" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE json_extract_string(fields_json, '$$.value.fields.owner') = '0xa00001'
          ORDER BY _id LIMIT 100"""),

    "p8_children" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE $DynChild AND owner IN ('0x000010')
          ORDER BY _id LIMIT 100"""),

    "o1_latest_checkpoint" -> withModel(
      "SELECT _id FROM completed ORDER BY _id DESC LIMIT 1"),

    "o2_pagination" -> withModel(
      s"SELECT $ObjCols FROM objects ORDER BY _id LIMIT 20 OFFSET 40"),

    "o2b_keyset" -> withModel(
      s"SELECT $ObjCols FROM objects WHERE _id > '0x000059' ORDER BY _id LIMIT 20"),

    "o3_count_by_owner_kind" -> withModel(
      """SELECT owner_kind, CAST(count(*) AS BIGINT) AS n FROM objects
         GROUP BY owner_kind ORDER BY n DESC, owner_kind"""),

    "s1_tail_poll_page" -> withModel(
      """SELECT event_id, event_type, epoch_ms(ts) AS ts_ms FROM (
           SELECT * FROM events ORDER BY event_id DESC LIMIT 100)
         ORDER BY event_id"""),

    // ---- joins ---------------------------------------------------------
    "j1_dynfield_parent_join" -> withModel(J1Sql),
    // bucketed serving variant: identical semantics, different physical plan
    "j1b_bucketed_parent_join" -> withModel(J1Sql),

    "j2_children_resolver" -> withModel(J2Sql),
    "j2b_bucketed_children" -> withModel(J2Sql),

    "j3_enrichment" -> withModel(
      """SELECT k._id, k.version, n.n_name FROM kept k
         JOIN nation n ON k.user_id % 25 = n.n_nationkey
         WHERE k.cp < 20 ORDER BY k.version"""),

    // retry_waves / backoff_ms mirror the reference's min(2^f·250ms, 10s)
    // rate-limit schedule: dead_letter paid waves 0+1 (250+500=750ms),
    // item_retry_ok wave 0 (250ms), batch_ok/skipped none
    "j3b_enrich_fallback" -> withModel(
      """SELECT k._id, k.version,
                CASE WHEN k.deletion OR k.version % 97 = 13 THEN NULL ELSE n.n_name END AS n_name,
                CASE WHEN k.deletion THEN 'skipped_deletion'
                     WHEN k.version % 97 = 13 THEN 'dead_letter'
                     WHEN CAST(floor(k.version / 50) AS BIGINT) IN (
                       SELECT CAST(floor(version / 50) AS BIGINT) FROM kept
                       WHERE version % 97 = 13 AND cp < 20) THEN 'item_retry_ok'
                     ELSE 'batch_ok' END AS fetch_status,
                CAST(CASE WHEN k.deletion THEN 0
                     WHEN k.version % 97 = 13 THEN 2
                     WHEN CAST(floor(k.version / 50) AS BIGINT) IN (
                       SELECT CAST(floor(version / 50) AS BIGINT) FROM kept
                       WHERE version % 97 = 13 AND cp < 20) THEN 1
                     ELSE 0 END AS BIGINT) AS retry_waves,
                CAST(CASE WHEN k.deletion THEN 0
                     WHEN k.version % 97 = 13 THEN 750
                     WHEN CAST(floor(k.version / 50) AS BIGINT) IN (
                       SELECT CAST(floor(version / 50) AS BIGINT) FROM kept
                       WHERE version % 97 = 13 AND cp < 20) THEN 250
                     ELSE 0 END AS BIGINT) AS backoff_ms
         FROM kept k LEFT JOIN nation n ON k.user_id % 25 = n.n_nationkey
         WHERE k.cp < 20 ORDER BY k.version"""),

    "j4_first_seen_dedup" -> withModel(
      """SELECT _id, version FROM (
           SELECT _id, version, row_number() OVER (PARTITION BY _id ORDER BY version) AS rn
           FROM kept)
         WHERE rn = 1 ORDER BY _id"""),

    "j5_cross_source_dedup" -> withModel(
      """SELECT route, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT previous_transaction, route, version,
                  row_number() OVER (PARTITION BY previous_transaction ORDER BY route, version) AS rn
           FROM (
             SELECT previous_transaction, version, 'poll' AS route FROM kept WHERE cp % 3 = 0
             UNION ALL
             SELECT previous_transaction, version, 'livescan' AS route FROM kept WHERE cp % 2 = 0))
         WHERE rn = 1 GROUP BY route ORDER BY route"""),

    // ---- ingest pipeline (K*, U*, A1-A3, S2/S3/S6, P9-P11) -------------
    "k1_latest_wins" -> withModel(K1Sql),
    "k1b_bucketed_latest_wins" -> withModel(K1Sql),

    "k2_checkpoint_commits" -> withModel(
      "SELECT _id FROM completed ORDER BY _id"),

    "k3_dlq" -> withModel(
      "SELECT _id, version, cp FROM failures ORDER BY version"),

    "k4_metrics" -> withModel(
      """SELECT metric, value FROM (
           WITH percp AS (
             SELECT cp, count(*) AS n,
                    sum(CASE WHEN change_kind = 'created' THEN 1 ELSE 0 END) AS n_created,
                    sum(CASE WHEN change_kind = 'mutated' THEN 1 ELSE 0 END) AS n_mutated,
                    sum(CASE WHEN deletion THEN 1 ELSE 0 END) AS n_deleted,
                    sum(CASE WHEN deletion THEN 0 ELSE 1 END) AS n_fetched,
                    sum(CASE WHEN version % 97 = 13 AND NOT deletion THEN 1 ELSE 0 END) AS cp_rpc_err,
                    sum(CASE WHEN version % 97 = 13 AND deletion THEN 1 ELSE 0 END) AS cp_mongo_err,
                    sum(ts_first_seen - ts_ms) AS lat_sum,
                    sum(CASE WHEN version % 97 = 13 THEN 1 ELSE 0 END) AS cp_failed
             FROM kept GROUP BY cp),
           agg AS (
             SELECT sum(n) AS items_total, sum(n_created) AS inserted,
                    sum(n_mutated) AS modified, sum(n_deleted) AS items_deleted,
                    sum(n_fetched) AS rpc_request, sum(cp_rpc_err) AS rpc_error,
                    sum(cp_mongo_err) AS mongo_write_error,
                    sum(cp_failed) AS ingest_error, count(*) AS checkpoints_seen,
                    count(CASE WHEN cp_failed = 0 THEN 1 END) AS create_checkpoint,
                    count(CASE WHEN cp_failed > 0 THEN 1 END) AS checkpoint_error,
                    max(cp) AS current_checkpoint,
                    max(CASE WHEN cp_failed = 0 THEN cp END) AS final_checkpoint,
                    sum(lat_sum) AS lat_total
             FROM percp)
           SELECT 'items_total' AS metric, CAST(items_total AS BIGINT) AS value FROM agg
           UNION ALL SELECT 'inserted', CAST(inserted AS BIGINT) FROM agg
           UNION ALL SELECT 'modified', CAST(modified AS BIGINT) FROM agg
           UNION ALL SELECT 'unchanged', CAST(items_total - inserted - modified AS BIGINT) FROM agg
           UNION ALL SELECT 'items_deleted', CAST(items_deleted AS BIGINT) FROM agg
           UNION ALL SELECT 'rpc_request', CAST(rpc_request AS BIGINT) FROM agg
           UNION ALL SELECT 'rpc_error', CAST(rpc_error AS BIGINT) FROM agg
           UNION ALL SELECT 'mongo_write_error', CAST(mongo_write_error AS BIGINT) FROM agg
           UNION ALL SELECT 'ingest_error', CAST(ingest_error AS BIGINT) FROM agg
           UNION ALL SELECT 'checkpoints_seen', CAST(checkpoints_seen AS BIGINT) FROM agg
           UNION ALL SELECT 'create_checkpoint', CAST(create_checkpoint AS BIGINT) FROM agg
           UNION ALL SELECT 'checkpoint_error', CAST(checkpoint_error AS BIGINT) FROM agg
           UNION ALL SELECT 'current_checkpoint', CAST(current_checkpoint AS BIGINT) FROM agg
           UNION ALL SELECT 'final_checkpoint', CAST(final_checkpoint AS BIGINT) FROM agg
           UNION ALL SELECT 'checkpoints_behind', CAST(current_checkpoint - final_checkpoint AS BIGINT) FROM agg
           UNION ALL SELECT 'extraction_latency', CAST(floor(lat_total / items_total) AS BIGINT) FROM agg
           UNION ALL SELECT 'backfill_init', CAST(CASE WHEN current_checkpoint - final_checkpoint > 3 THEN 1 ELSE 0 END AS BIGINT) FROM agg
           UNION ALL SELECT 'pause_livescan', CAST(CASE WHEN current_checkpoint - final_checkpoint > 3 THEN 1 ELSE 0 END AS BIGINT) FROM agg
           UNION ALL SELECT 'start_livescan', CAST(1 AS BIGINT) FROM agg)
         ORDER BY metric"""),

    "a1_completion_countdown" -> withModel(
      "SELECT _id FROM completed ORDER BY _id"),

    "a2_max_checkpoint" -> withModel(
      "SELECT max(_id) AS max_cp FROM completed"),

    "a3_batch_outcomes" -> withModel(
      """SELECT cp, CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(CASE WHEN change_kind = 'created' THEN 1 ELSE 0 END) AS BIGINT) AS n_created,
                CAST(sum(CASE WHEN change_kind = 'mutated' THEN 1 ELSE 0 END) AS BIGINT) AS n_mutated,
                CAST(sum(CASE WHEN deletion THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
                CAST(sum(CASE WHEN version % 97 = 13 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
         FROM kept WHERE cp < 50 GROUP BY cp ORDER BY cp"""),

    "s2_range_scan_skip" -> withModel(
      """SELECT cp FROM (SELECT DISTINCT cp FROM changes)
         WHERE cp NOT IN (SELECT _id FROM completed) ORDER BY cp DESC"""),

    "s3_first_page_per_cp" -> withModel(
      """SELECT cp, version, CAST(page_rn AS BIGINT) AS page_rn FROM (
           SELECT cp, version, row_number() OVER (PARTITION BY cp ORDER BY version) AS page_rn
           FROM kept WHERE cp < 30)
         WHERE page_rn <= 3 ORDER BY cp, page_rn"""),

    "s4_cursor_walk" -> withModel(
      """SELECT CAST(walk_id AS BIGINT) AS walk_id, min(_id) AS cp_start, max(_id) AS cp_end,
                CAST(count(*) AS BIGINT) AS n_cps FROM (
           SELECT _id, sum(new_seg) OVER (ORDER BY _id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS walk_id
           FROM (
             SELECT _id,
                    CASE WHEN prev IS NULL OR _id - prev > 2 THEN 1 ELSE 0 END AS new_seg
             FROM (SELECT _id, lag(_id) OVER (ORDER BY _id) AS prev FROM completed)))
         GROUP BY walk_id ORDER BY walk_id"""),

    "s6_watermark" -> withModel(
      "SELECT max(_id) AS max_cp FROM completed"),

    "s7_objects_scan" -> withModel(
      """SELECT _id, version, version_hex, deleted, digest, type_full, type_package,
                type_module, type_struct, owner_kind, owner, initial_shared_version,
                previous_transaction, storage_rebate, has_public_transfer, fields_json,
                cp, ts_ms, ingested_via
         FROM objects ORDER BY _id LIMIT 200"""),

    "u1_union_routes" -> withModel(
      """SELECT route, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT 'poll' AS route FROM kept WHERE cp % 3 = 0
           UNION ALL
           SELECT 'livescan' AS route FROM kept WHERE cp % 2 = 0)
         GROUP BY route ORDER BY route"""),

    "u2_descending_ranges" -> withModel(
      """SELECT max(_id) AS range_end, min(_id) AS range_start FROM (
           SELECT _id, _id - row_number() OVER (ORDER BY _id) AS island FROM completed)
         GROUP BY island ORDER BY range_end DESC"""),

    "u2b_ranges_with_stop" -> withModel(
      """, marked AS (SELECT _id, (_id % 89 = 21) AS stop FROM completed),
         sa AS (SELECT coalesce(max(CASE WHEN stop THEN _id END), 0) AS stop_at FROM marked),
         r AS (SELECT max(_id) AS range_end, min(_id) AS range_start FROM (
                 SELECT m._id, m._id - row_number() OVER (ORDER BY m._id) AS island
                 FROM marked m, sa WHERE m._id >= sa.stop_at)
               GROUP BY island)
         SELECT range_end, range_start FROM (
           SELECT range_end, range_start FROM r
           UNION ALL
           SELECT stop_at AS range_end, CAST(0 AS BIGINT) AS range_start FROM sa WHERE stop_at > 0)
         ORDER BY range_end DESC, range_start DESC"""),

    "u3_range_anti_join" -> withModel(
      """SELECT cp FROM (SELECT DISTINCT cp FROM changes)
         WHERE cp NOT IN (SELECT _id FROM completed) ORDER BY cp DESC"""),

    "p9_deletion_split" -> withModel(
      """SELECT deletion, (n_name IS NULL) AS skipped_fetch, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT k.deletion, CASE WHEN k.deletion THEN NULL ELSE n.n_name END AS n_name
           FROM kept k LEFT JOIN nation n ON (NOT k.deletion) AND k.user_id % 25 = n.n_nationkey)
         GROUP BY deletion, (n_name IS NULL) ORDER BY deletion, skipped_fetch"""),

    "p10_change_kinds" -> withModel(
      """SELECT change_kind, CAST(count(*) AS BIGINT) AS n FROM changes
         GROUP BY change_kind ORDER BY change_kind"""),

    "p11_type_allowlist" -> withModel(
      s"""SELECT $ObjCols FROM objects
          WHERE type_full IN ('0x0::view::T1','0x1::click::T2')
          ORDER BY _id"""),

    "p12_projection" -> withModel(
      "SELECT _id, type_package FROM objects ORDER BY _id LIMIT 50"),

    "p13_typed_parse" -> withModel(
      """SELECT _id, type_package, type_module, type_struct, type_generics_raw,
                version_hex, storage_rebate,
                CAST(octet_length(from_base64(bcs_b64)) AS BIGINT) AS bcs_len
         FROM objects ORDER BY _id LIMIT 100"""),

    "p14b_variant_decode" -> withModel(
      """SELECT _id,
                json_extract_string(fields_json, '$.name.fields.k') AS name_k,
                json_extract_string(fields_json, '$.value.fields.owner') AS value_owner,
                json_extract_string(fields_json, '$.value.fields.v') AS value_v
         FROM objects
         WHERE owner_kind = 'Object' AND substr(type_full, 1, 26) = '0x2::dynamic_field::Field<'
         ORDER BY _id LIMIT 200"""),

    "p14_json_decode" -> withModel(
      """SELECT _id,
                json_extract_string(fields_json, '$.name.fields.k') AS name_k,
                json_extract_string(fields_json, '$.value.fields.owner') AS value_owner,
                json_extract_string(fields_json, '$.value.fields.v') AS value_v
         FROM objects
         WHERE owner_kind = 'Object' AND substr(type_full, 1, 26) = '0x2::dynamic_field::Field<'
         ORDER BY _id LIMIT 200"""),

    // ---- aggregations / example-query corpus ---------------------------
    "a4_count_per_type" -> withModel(
      """SELECT type_full, CAST(count(*) AS BIGINT) AS count FROM objects
         GROUP BY type_full ORDER BY count DESC, type_full"""),

    "a5_distinct_types" -> withModel(
      "SELECT DISTINCT type_full FROM objects ORDER BY type_full"),

    "a5b_distinct_types_by_owner" -> withModel(
      """SELECT DISTINCT type_full FROM objects
         WHERE (owner_kind = 'Address' AND owner IN ('0xa00000'))
            OR (owner_kind = 'Object' AND owner IN ('0xa00000'))
         ORDER BY type_full"""),

    "a5c_count_unique_types" -> withModel(
      "SELECT CAST(count(DISTINCT type_full) AS BIGINT) AS n_types FROM objects"),

    // KMV sketch (AggOps.kmvDistinctTypes): k smallest distinct 60-bit
    // hashes; estimate = (k-1)/u_k with u_k the k-th hash normalized by 2^60
    "a5d_approx_distinct" -> withModel(
      """SELECT approx_types FROM (
           WITH h AS (SELECT DISTINCT CAST('0x' || substr(md5(type_full), 1, 15) AS BIGINT) AS h
                      FROM objects),
           topk AS (SELECT h FROM h ORDER BY h LIMIT 64),
           agg AS (SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS n_seen FROM topk)
           SELECT CASE WHEN n_seen < 64 THEN n_seen
                       ELSE CAST(round((63 * 1152921504606846976.0) / hk) AS BIGINT)
                  END AS approx_types
           FROM agg)"""),

    "a6_largest_doc" -> withModel(
      """SELECT CAST(max(octet_length(encode(fields_json)) + octet_length(encode(type_full))) AS BIGINT)
           AS max_doc_bytes FROM objects"""),

    "a7_table_count" -> withModel(
      "SELECT CAST(count(*) AS BIGINT) AS n FROM objects"),

    // ---- stream-window extensions (batch-equivalent forms) -------------
    "w1_hourly_counts" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""",

    "w2_sliding_counts" ->
      """SELECT window_start_ms, event_type, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT unnest([slot, slot - 1800000]) AS window_start_ms, event_type FROM (
             SELECT CAST(floor(epoch_ms(ts) / 1800000) AS BIGINT) * 1800000 AS slot, event_type
             FROM events))
         GROUP BY window_start_ms, event_type ORDER BY window_start_ms, event_type""",

    "w3_session_counts" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(max(n_events) AS BIGINT) AS max_session_events FROM (
           SELECT user_id, session_id, count(*) AS n_events FROM (
             SELECT user_id, ts,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             FROM (
               SELECT user_id, ts,
                      CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_session
               FROM (
                 SELECT user_id, ts, lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
                 FROM events)))
           GROUP BY user_id, session_id)
         GROUP BY user_id ORDER BY user_id""",

    // ---- LLM data-pipeline operators -----------------------------------
    "d1_exact_dedup" ->
      s"""SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM $Docs)
          WHERE rn = 1 ORDER BY doc_id""",

    // d10/d10b: the Bloom bitset is exactly the indicator of the corpus's
    // (shard, position) set, so membership (all k bits set, in the doc's
    // OWN shard's filter) is the set ALL-IN test — the oracle states it
    // that way; position and shard-route arithmetic reuse the engine's
    // salted-h60-of-md5(text) verbatim. ONE generator for the unsharded
    // (shards=1 — the route degenerates to a constant) and sharded forms,
    // so the two cannot fork.
    "d10_bloom_screen" -> bloomScreenOracle(
      graft.llm.DedupOps.BloomBits, graft.llm.DedupOps.BloomHashes, 1),

    // d10b: the key-range shard seam oracle-gated — each doc screens
    // against its md5-routed shard's filter only, at a per-shard geometry
    // (2^15 bits) deliberately different from d10's default to prove the
    // geometry is a flowing config value, not a constant.
    "d10b_bloom_screen_sharded" -> bloomScreenOracle(1 << 15, 3, 4),

    "d2_minhash_neardups" -> s"""WITH $ShingleCtes,${bandCandCtes()},
${jaccardTail(0.5)}""",

    // d6 = connected components over d2's pair set (recursive reachability
    // CTE), min doc_id elected as each component's canonical keeper;
    // unpaired docs are their own singleton.
    // d7 (incremental group maintenance) must land on the SAME final
    // assignment — its oracle is this identical CTE over the full corpus,
    // while the engine folds only the increment's pairs into a maintained
    // corpus assignment: two different algorithms required to agree.
    "d7_incremental_groups" ->
      s"""WITH RECURSIVE $ShingleCtes,$GroupChainCtes$GroupSelect""",

    "d6_dedup_groups" ->
      s"""WITH RECURSIVE $ShingleCtes,$GroupChainCtes$GroupSelect""",

    // c3 = the d6 component assignment bucketed by t6's salted-md5
    // arithmetic over the GROUP id (80/10/10): members of a component
    // always land in one split — the eval-leakage guard. Docs outside
    // the assignment would be their own singleton (COALESCE), mirroring
    // the engine's left-join form.
    "c3_leakage_safe_split" -> s"""WITH RECURSIVE $ShingleCtes,$GroupChainCtes,
g AS (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id),
sp AS (SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id
       FROM $Docs d LEFT JOIN g USING (doc_id)),
bk AS (SELECT doc_id, group_id,
         CAST('0x' || substr(md5('c3-' || group_id), 1, 15) AS BIGINT) % 100 AS b
       FROM sp)
SELECT doc_id, group_id,
  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM bk ORDER BY doc_id""",

    // d5 = d2's pair set restricted to pairs whose LATER member is in the
    // increment (doc_id >= 400): the Spark side generates candidates from
    // the corpus band INDEX + the increment's self-join, which covers
    // exactly the shared-band pairs with id_b new
    "d5_incremental_dedup" -> s"""WITH $ShingleCtes,${bandCandCtes(" AND bb.doc_id >= 400")},
${jaccardTail(0.5)}""",

    // d8 = 4-gram collision decontamination: same word-hash + polynomial
    // shingle formula as ShingleCtes at k=4 (31^3..31^0 coefficients; the
    // BIGINT sum stays under 2^63 — the same bound the Spark kernel holds)
    "d8_decontamination" -> s"""
WITH ${contamCtes("",
      s"(SELECT doc_id, string_split(text, ' ') AS w FROM $Docs WHERE doc_id % 50 <> 0)",
      s"(SELECT doc_id AS bench_id, string_split(text, ' ') AS w FROM $Docs WHERE doc_id % 50 = 0)")}
SELECT t.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
FROM tset t JOIN bset b ON t.sh = b.sh
GROUP BY t.doc_id, b.bench_id
HAVING count(*) >= 1
ORDER BY doc_id, bench_id""",

    // d8b = the embedding-tier decontamination: the e5b frozen-centroid
    // IVF chain (build corpus = vec_id < 400) + each benchmark vector
    // (vec_id % 50 = 0, mirroring d8's doc split) probing its 3 nearest
    // cells (e4's probe front — decontamination is a recall problem) +
    // corpus-vs-benchmark cosine (6-dp, >= 0.4) within probed cells under
    // the combined-population 256-member rail (corpus members + bench
    // probes). A benchmark vector already in the corpus flags its copy
    // (id inequality only excludes the self-pair).
    "d8b_semantic_decontamination" -> s"""WITH ${ivfChainCtes(16, 2, 64, Some("vec_id < 400"))},
bq AS (SELECT vec_id AS bench_id, v FROM e WHERE vec_id % 50 = 0),
probes AS (SELECT bench_id, v, cell FROM (
  SELECT b.bench_id, b.v, s.cell,
         row_number() OVER (PARTITION BY b.bench_id
           ORDER BY ${ivfScore("b.v", "s.c")} DESC, s.cell DESC) AS rn
  FROM bq b, c1 s) WHERE rn <= 3),
csz AS (SELECT cell, count(*) AS n FROM a2 WHERE vec_id < 400 GROUP BY cell),
bsz AS (SELECT cell, count(*) AS n FROM probes GROUP BY cell),
okc AS (SELECT COALESCE(c.cell, b.cell) AS cell
        FROM csz c FULL JOIN bsz b ON c.cell = b.cell
        WHERE COALESCE(c.n, 0) + COALESCE(b.n, 0) <= 256)
SELECT a.vec_id AS doc_id, p.bench_id,
       round(list_cosine_similarity(a.v, p.v), 6) AS cos
FROM a2 a JOIN probes p ON a.cell = p.cell JOIN okc ON okc.cell = a.cell
WHERE a.vec_id < 400 AND a.vec_id <> p.bench_id
  AND round(list_cosine_similarity(a.v, p.v), 6) >= 0.4
ORDER BY doc_id, bench_id""",

    // d9 = positional 5-gram seed match + diagonal gaps-and-islands: spans
    // of ≥ 8 words shared verbatim between doc pairs. Same word-hash +
    // polynomial combine as ShingleCtes but at k=5 and WITHOUT
    // list_distinct (the position of every occurrence matters); the
    // df-prune (≤ 100 seed positions per hash corpus-wide) mirrors
    // DedupOps.duplicatedSpans.
    "d9_span_dedup" -> spanOracle(""),

    // d9b = d9's span set restricted to pairs whose LATER member is in the
    // increment (doc_id >= 400, the d5 split): the engine generates
    // corpus-vs-new candidates from the maintained seed index plus the
    // increment self-join — exactly the matches with id_b new
    "d9b_incremental_spans" -> spanOracle(" AND b.doc_id >= 400"),

    // d9c = d9's span set applied as REMEDIATION: each span's covered
    // word positions drop from the LATER doc (id_b); the first occurrence
    // survives. Same seed chain, then per-doc position surgery.
    "d9c_span_scrub" -> s"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),${spanSeedCtes("", "")},
spans AS (SELECT id_a, id_b, CAST(min(pos_a) - diag AS BIGINT) AS start_b,
                 CAST(count(*) + 4 AS BIGINT) AS span_len
          FROM isl GROUP BY id_a, id_b, diag, island
          HAVING count(*) + 4 >= 8),
wpos AS (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1), i ->
           {'pos': i - 1, 'word': w[i]})) AS u FROM docs),
wp AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.word AS word FROM wpos),
removed AS (SELECT DISTINCT s.id_b AS doc_id, p.pos
            FROM spans s JOIN wp p ON p.doc_id = s.id_b
             AND p.pos >= s.start_b AND p.pos < s.start_b + s.span_len),
kept AS (SELECT p.doc_id, p.pos, p.word FROM wp p
         WHERE NOT EXISTS (SELECT 1 FROM removed r
                           WHERE r.doc_id = p.doc_id AND r.pos = p.pos)),
agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean,
       CAST(len(d.w) AS BIGINT) AS n_words,
       CAST(len(d.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""",

    // c1 = the end-to-end curation composition: exact dedup (d1) →
    // near-dup groups over the survivors (d2/d6 chain, restricted) →
    // quality-keeper election (d6b window) → k=4 decontamination vs the
    // held-out benchmark (d8 formula) → greedy budget pack (t7 window).
    // Train/bench split mirrors d8 (doc_id % 50); every fragment is the
    // corresponding standalone oracle with its source restricted to the
    // previous stage's survivors.
    "c1_curated_corpus" -> s"""$CurationCtes
SELECT doc_id, lang, n_tokens, quality_score, cum_tokens FROM c
WHERE cum_tokens <= 8000 ORDER BY quality_score DESC, doc_id""",

    // c4 = c1's identical CTE chain + c3's split tail: each packed doc
    // bucketed by the salted-md5 hash of the group id the keeper election
    // itself used (LEFT JOIN + COALESCE mirrors the engine's
    // singleton-fallback form), so a near-duplicate admitted later can
    // only ever land in the same split as its keeper.
    "c4_curate_and_split" -> s"""$CurationCtes,
sp AS (SELECT c.*, COALESCE(g2.group_id, c.doc_id) AS group_id
       FROM c LEFT JOIN grp g2 USING (doc_id)),
bk AS (SELECT sp.*,
         CAST('0x' || substr(md5('c3-' || group_id), 1, 15) AS BIGINT) % 100 AS b
       FROM sp)
SELECT doc_id, lang, n_tokens, quality_score, cum_tokens, group_id,
  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM bk WHERE cum_tokens <= 8000 ORDER BY quality_score DESC, doc_id""",

    // c5 = the quality ensemble: t5's quality_score, t10's repetition
    // fractions and t19's unigram NLL, each quantized to a ×10⁴ BIGINT
    // AFTER its own 4-decimal rounding (mirroring the Spark composition
    // exactly), blended with integer weights 4/2/1/3 and // 10 — exact
    // integer arithmetic end to end; the double score derives at the end.
    "c5_quality_ensemble" -> s"""WITH $QualityCte,
hx AS (SELECT doc_id, CAST(round(quality_score * 10000) AS BIGINT) AS heur_x10k FROM q),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS dup_word_frac
         FROM w),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      FROM w WHERE len(w) >= 2),
top AS (SELECT doc_id, max(c) AS top_c FROM (
          SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        GROUP BY doc_id),
rep AS (SELECT b.doc_id,
               CAST(10000 - round(b.dup_word_frac * 10000) AS BIGINT) AS rep_x10k,
               CAST(10000 - round(round(least(1.0,
                 CAST(coalesce(t.top_c, 0) * 2 AS DOUBLE) / b.n_words), 4) * 10000) AS BIGINT) AS top_x10k
        FROM base b LEFT JOIN top t USING (doc_id)),
tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM $Docs),
f AS (SELECT word, count(*) AS n FROM tw GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM f),
nsc AS (SELECT doc_id,
               CAST(round(-ln(CAST(n AS DOUBLE) / (SELECT nn FROM tot)) * 10000) AS BIGINT) AS wn
        FROM tw JOIN f USING (word)),
nll AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw, CAST(sum(wn) AS BIGINT) AS nll_x10k
        FROM nsc GROUP BY doc_id),
lm AS (SELECT doc_id,
              CAST(greatest(0, 10000 - (nll_x10k // nw) // 15) AS BIGINT) AS lm_x10k
       FROM nll)
SELECT h.doc_id, h.heur_x10k, r.rep_x10k, r.top_x10k, l.lm_x10k,
       CAST((4 * h.heur_x10k + 2 * r.rep_x10k + r.top_x10k + 3 * l.lm_x10k) // 10 AS BIGINT) AS score_x10k,
       round(CAST((4 * h.heur_x10k + 2 * r.rep_x10k + r.top_x10k + 3 * l.lm_x10k) // 10 AS DOUBLE) / 10000.0, 4) AS ensemble_score
FROM hx h JOIN rep r USING (doc_id) JOIN lm l USING (doc_id)
ORDER BY h.doc_id""",

    // c5b = c5 with t19c's BIGRAM chain under the fluency leg (first
    // word under the unigram model, later words under the MLE
    // conditional) — heuristic/repetition fragments and the 4/2/1/3
    // integer blend identical to c5, so the pair isolates the model.
    "c5b_quality_ensemble_bigram" -> s"""WITH $QualityCte,
hx AS (SELECT doc_id, CAST(round(quality_score * 10000) AS BIGINT) AS heur_x10k FROM q),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS dup_word_frac
         FROM w),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      FROM w WHERE len(w) >= 2),
top AS (SELECT doc_id, max(c) AS top_c FROM (
          SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        GROUP BY doc_id),
rep AS (SELECT b.doc_id,
               CAST(10000 - round(b.dup_word_frac * 10000) AS BIGINT) AS rep_x10k,
               CAST(10000 - round(round(least(1.0,
                 CAST(coalesce(t.top_c, 0) * 2 AS DOUBLE) / b.n_words), 4) * 10000) AS BIGINT) AS top_x10k
        FROM base b LEFT JOIN top t USING (doc_id)),
uw AS (SELECT doc_id, unnest(w) AS word FROM w),
uni AS (SELECT word, count(*) AS n FROM uw GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM uni),
bpr AS (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1), i ->
          {'prev': w[i-1], 'word': w[i]})) AS b FROM w),
bpairs AS (SELECT doc_id, b.prev AS prev, b.word AS word FROM bpr),
big AS (SELECT prev, word, count(*) AS nb FROM bpairs GROUP BY 1, 2),
terms AS (
  SELECT d.doc_id,
         CAST(round(-ln(CAST(u.n AS DOUBLE) / (SELECT nn FROM tot)) * 10000) AS BIGINT) AS wn
  FROM (SELECT doc_id, w[1] AS word FROM w) d JOIN uni u USING (word)
  UNION ALL
  SELECT p.doc_id,
         CAST(round(-ln(CAST(b.nb AS DOUBLE) / up.n) * 10000) AS BIGINT) AS wn
  FROM bpairs p JOIN big b USING (prev, word)
  JOIN uni up ON up.word = p.prev),
nll AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw, CAST(sum(wn) AS BIGINT) AS nll_x10k
        FROM terms GROUP BY doc_id),
lm AS (SELECT doc_id,
              CAST(greatest(0, 10000 - (nll_x10k // nw) // 15) AS BIGINT) AS lm_x10k
       FROM nll)
SELECT h.doc_id, h.heur_x10k, r.rep_x10k, r.top_x10k, l.lm_x10k,
       CAST((4 * h.heur_x10k + 2 * r.rep_x10k + r.top_x10k + 3 * l.lm_x10k) // 10 AS BIGINT) AS score_x10k,
       round(CAST((4 * h.heur_x10k + 2 * r.rep_x10k + r.top_x10k + 3 * l.lm_x10k) // 10 AS DOUBLE) / 10000.0, 4) AS ensemble_score
FROM hx h JOIN rep r USING (doc_id) JOIN lm l USING (doc_id)
ORDER BY h.doc_id""",

    // c2 = the incremental admission composition: one verdict per
    // increment doc (doc_id >= 400, the d5 split) with screen precedence
    // near_dup (d5 fragment: corpus band index ∪ increment self-join) >
    // span_dup (d9b fragment: maintained seed index, ≥ 8-word spans) >
    // [semantic_dup (c2b only: e5b frozen-centroid assignment + e7
    // within-cell pairs against the served cells)] > contaminated (d8
    // fragment at k=4 vs the doc_id % 50 = 0 held-out set — a benchmark
    // doc arriving in the feed flags itself) > low_quality (t5's score
    // < 0.5) > admitted. detail_id = the firing screen's min witness id.
    // Every fragment IS the corresponding standalone oracle's, restricted
    // to the increment as probe side (admissionOracle composes them).
    "c2_incremental_admission" -> admissionOracle(),
    "c2b_semantic_admission" -> admissionOracle(withSemantic = true),
    "c6_multimodal_admission" ->
      admissionOracle(withSemantic = true, withImage = true),
    // c6b = the TRIMODAL ladder: c6 + the audio rung (exact PCM-content
    // matches, image_dup > audio_dup — a non-video doc recycling a
    // corpus doc's length duplicates its image AND audio; precedence
    // reports the image; video-id docs have no image fingerprint, so
    // audio is the rung that catches their recycled clips)
    "c6b_trimodal_admission" ->
      admissionOracle(withSemantic = true, withImage = true, withAudio = true),

    // c6c = the SHIFT-rung ladder: the c2 text base + the composed audio
    // window rung (m5i ∪ m5n spliced verbatim) + the video stride rung
    // (m3g) — the increments' renditions are the recycler feeds
    // (silence-padded, reversed, intro-prepended) every whole-clip rung
    // structurally misses.
    "c6c_shift_admission" -> admissionOracle(withShift = true),

    // m5c: the SERVED exact-audio screen — pairs with equal PCM content
    // hash whose LATER member is in the increment, corpus as id_a (the
    // m4d orientation rule), hashes recomputed from the generative
    // formula.
    "m5c_audio_dups_served" -> s"""$AudioCtes
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM am a JOIN am b ON a.pcm_hash = b.pcm_hash AND b.doc_id >= 400
  AND a.doc_id <> b.doc_id AND (a.doc_id < 400 OR a.doc_id < b.doc_id)
ORDER BY id_a, id_b""",

    // d6b = d6's recursive group CTE + t5's quality expression: per group
    // keep the max-quality member, ties to the lower doc_id
    "d6b_quality_keepers" -> s"""WITH RECURSIVE $ShingleCtes,$GroupChainCtes,
grp AS (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id),$QualityCte
SELECT g.doc_id, g.group_id, q.quality_score,
       row_number() OVER (PARTITION BY g.group_id ORDER BY q.quality_score DESC, g.doc_id) = 1 AS keep
FROM grp g JOIN q USING (doc_id)
ORDER BY g.doc_id""",

    "d3_simhash" -> s"""
WITH words AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM $Docs),
wh AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM words),
bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
         FROM wh, (SELECT unnest(range(0, 16)) AS b) GROUP BY doc_id, b)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id ORDER BY doc_id""",

    // oracle-side the Hamming predicate is a direct pair join (fine at
    // sf0.01); the Spark side uses the bucketed multi-probe plan. 48-bit
    // signatures + the maxBucket=100 home-bucket prune mirror
    // DedupOps.simhashNearDups defaults.
    "d3b_simhash_neardups" -> s"""
WITH words AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM $Docs),
wh AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM words),
bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
         FROM wh, (SELECT unnest(range(0, 48)) AS b) GROUP BY doc_id, b),
sig AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
ok AS (SELECT simhash FROM sig GROUP BY simhash HAVING count(*) <= 100),
sigf AS (SELECT s.doc_id, s.simhash FROM sig s JOIN ok USING (simhash))
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sigf a JOIN sigf b ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 1
ORDER BY id_a, id_b""",

    "d4_ngram_jaccard" -> s"""WITH $ShingleCtes,
df AS (SELECT sh, count(*) AS n_docs FROM sset GROUP BY sh HAVING count(*) <= 100),
pruned AS (SELECT s.doc_id, s.sh FROM sset s JOIN df ON df.sh = s.sh),
cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM pruned a JOIN pruned b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5),
${jaccardTail(0.3)}""",

    "e1_cosine_topk" -> s"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM $Emb WHERE vec_id < 8),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $Emb),
scored AS (SELECT query_id, vec_id, list_cosine_similarity(qv, v) AS cos
           FROM q, e WHERE vec_id <> query_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY query_id, rank""",

    "e2_ann_lsh_topk" -> s"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ${duckBucket("embedding::DOUBLE[]", 4, 64)} AS bucket FROM $Emb),
q AS (SELECT query_id, qv, unnest([home, xor(home, 1), xor(home, 2), xor(home, 4), xor(home, 8)]) AS bucket
      FROM (SELECT vec_id AS query_id, v AS qv, bucket AS home FROM e WHERE vec_id < 8)),
scored AS (SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
           FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.query_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY query_id, rank""",

    "e3_cosine_neardups" -> s"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ${duckBucket("embedding::DOUBLE[]", 4, 64)} AS bucket FROM $Emb)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cos
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4
ORDER BY id_a, id_b""",

    "e4_ivf_topk" -> ivfOracle(nCells = 16, nProbe = 2, k = 5, iterations = 2,
      dim = 64),
    // e5 = e4 served from the maintained index — the engine must land on
    // the inline pipeline's exact result, so the oracle is identical
    // e13: filtered search, exact baseline — e1's chain with the English
    // allow-set semi-joined into the corpus side BEFORE ranking.
    "e13_filtered_topk" -> s"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM $Emb WHERE vec_id < 8),
al AS (SELECT doc_id FROM $Docs WHERE lang = 'en'),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $Emb JOIN al ON al.doc_id = vec_id),
scored AS (SELECT query_id, vec_id, list_cosine_similarity(qv, v) AS cos
           FROM q, e WHERE vec_id <> query_id)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY query_id, rank""",

    // e13b: the same filter on the SERVED index — e5's probe chain, the
    // allow-set applied to the scored members before the rank window
    // (centroids untouched, mirroring the engine's cell-list semi join).
    "e13b_filtered_ivf_topk" -> ivfOracle(nCells = 16, nProbe = 2, k = 5,
      iterations = 2, dim = 64, memberFilter =
        Some(s" s JOIN $Docs dd ON dd.doc_id = s.vec_id AND dd.lang = 'en'")),

    // e13c: e13b's selectivity dial as code — the probe bound is the
    // engine's EXACT integer arithmetic recomputed as a scalar subquery:
    // ⌈nProbe·corpus / allowed⌉ (allowed guarded to ≥ 1), floored at
    // nProbe = 2, capped at the 16 cells; counts from the same corpus
    // the engine measures (all vectors / the en-doc vectors).
    "e13c_filtered_ivf_adaptive" -> ivfOracle(nCells = 16, nProbe = 2, k = 5,
      iterations = 2, dim = 64,
      memberFilter =
        Some(s" s JOIN $Docs dd ON dd.doc_id = s.vec_id AND dd.lang = 'en'"),
      probeExpr = Some(s"""(SELECT least(16, greatest(2,
    (2 * (SELECT count(*) FROM e)
       + greatest((SELECT count(*) FROM e x
                   JOIN $Docs dd ON dd.doc_id = x.vec_id AND dd.lang = 'en'), 1) - 1)
    // greatest((SELECT count(*) FROM e x
               JOIN $Docs dd ON dd.doc_id = x.vec_id AND dd.lang = 'en'), 1))))""")),

    "e5_ivf_served_topk" -> ivfOracle(nCells = 16, nProbe = 2, k = 5,
      iterations = 2, dim = 64),
    // e6 = e5's served top-k + majority-vote labeling: the identical IVF
    // CTE chain with a vote tail instead of the rank projection
    "e6_knn_classify" -> ivfOracle(nCells = 16, nProbe = 2, k = 5,
      iterations = 2, dim = 64, tail = Some(knnClassifyTail(5))),
    // e5b = the corpus-built index (Lloyd over vec_id < 400 only) with
    // everything assigned on its frozen final centroids — the appended
    // index the engine maintains
    "e5b_ivf_appended_topk" -> ivfOracle(nCells = 16, nProbe = 2, k = 5,
      iterations = 2, dim = 64, corpusWhere = Some("vec_id < 400")),
    // e7 = SemDeDup over the same IVF chain: within-cell cosine pairs
    // (≥ 0.4, 6-dp) → recursive-CTE connected components (two different
    // algorithms from the engine's pointer-doubling, required to agree)
    // → per group keep the member LEAST similar to its cell centroid,
    // ties to the lower vec_id. Cells above 256 members are excluded
    // from pair generation (the engine's maxCell rail — their vectors
    // stay as singleton keeps).
    "e7_semantic_dedup" -> s"""WITH RECURSIVE ${ivfChainCtes(16, 2, 64)},
cellsz AS (SELECT cell FROM a2 GROUP BY cell HAVING count(*) <= 256),
ep AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
       JOIN cellsz cz ON cz.cell = a.cell
       WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
cosc AS (SELECT a.vec_id, a.cell, round(list_cosine_similarity(a.v, s.c), 6) AS cos_centroid
         FROM a2 a JOIN c1 s USING (cell)),
eedges AS (SELECT id_a AS src, id_b AS dst FROM ep
           UNION ALL SELECT id_b, id_a FROM ep),
ereach(id, r) AS (SELECT vec_id, vec_id FROM e
                  UNION
                  SELECT ereach.id, g.dst FROM ereach JOIN eedges g ON ereach.r = g.src),
egrp AS (SELECT id AS vec_id, min(r) AS group_id FROM ereach GROUP BY id),
ekeep AS (SELECT group_id, vec_id AS keep_id FROM (
  SELECT g.group_id, c.vec_id,
         row_number() OVER (PARTITION BY g.group_id ORDER BY c.cos_centroid, c.vec_id) AS rn
  FROM egrp g JOIN cosc c USING (vec_id)) WHERE rn = 1)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell, g.group_id, c.cos_centroid,
       c.vec_id = k.keep_id AS keep
FROM cosc c JOIN egrp g USING (vec_id) JOIN ekeep k ON k.group_id = g.group_id
ORDER BY c.vec_id""",
    // e10 = exact vector dedup: min-id keeper + multiplicity per
    // bit-identical embedding (group by the list value itself — the
    // fixture has no exact dups, so this gates the identity case and
    // cross-engine array-equality grouping; LlmSpec seeds real dups)
    "e10_exact_vector_dedup" -> s"""
SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS n_copies
FROM $Emb GROUP BY embedding ORDER BY vec_id""",

    // e9 = the centroid-drift dial over the e5b chain (corpus-built
    // centroids, everything assigned frozen): per segment the count and
    // exact ×1e6-integer cosine sum to the assigned centroid, mean as one
    // final division — the q1/t14 integer-cents discipline
    "e9_ivf_drift" -> s"""
WITH ${ivfChainCtes(16, 2, 64, Some("vec_id < 400"))},
cosd AS (SELECT CASE WHEN a.vec_id < 400 THEN 'corpus' ELSE 'increment' END AS segment,
                CAST(round(round(list_cosine_similarity(a.v, s.c), 6) * 1000000) AS BIGINT) AS c6
         FROM a2 a JOIN c1 s USING (cell))
SELECT segment, CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(c6) AS BIGINT) AS sum_cos_x1m,
       round(sum(c6) / (count(*) * 1000000.0), 6) AS mean_cos
FROM cosd GROUP BY segment ORDER BY segment""",

    // e8 = round-robin draw over the same IVF cells: per-cell rank by the
    // t6 salted hash, rounds ascending then cell then id, first 32 picks
    "e8_cluster_sample" -> s"""WITH ${ivfChainCtes(16, 2, 64)},
ranked AS (SELECT vec_id, cell,
                  CAST(row_number() OVER (PARTITION BY cell
                    ORDER BY CAST('0x' || substr(md5('e8-' || vec_id), 1, 15) AS BIGINT), vec_id) AS BIGINT) AS r
           FROM a2),
picked AS (SELECT vec_id, cell, r,
                  CAST(row_number() OVER (ORDER BY r, cell, vec_id) AS BIGINT) AS pick
           FROM ranked WHERE r <= 32)
SELECT vec_id, CAST(cell AS BIGINT) AS cell, r, pick
FROM picked WHERE pick <= 32 ORDER BY pick""",

    // e11 = product quantization, asymmetric-distance top-k: one
    // prefix-namespaced Lloyd chain per subspace (the same seeding/pass/
    // 6-dp discipline as e4), codes = each subspace's final cell, ADC
    // score = Σ of dot(query subvector, codebook centroid of the corpus
    // code) over the query/reconstruction norms, rounded 6 dp; ties to
    // the lower vec_id.
    "e11_pq_topk" -> pqOracle(m = 16, k = 16, iterations = 2, dim = 64, kTop = 5),
    // e11b = e11 served from the maintained PQ index (build ∉ query) —
    // the engine must land on the inline pipeline's exact result, so the
    // oracle is identical (the e4/e5 discipline)
    "e11b_pq_served_topk" -> pqOracle(m = 16, k = 16, iterations = 2, dim = 64, kTop = 5),
    // e12 = IVFADC: the shared coarse IVF chain picks each query's probed
    // cells; e11's ADC assembly ranks only those cells' codes
    "e12_ivfadc_topk" -> ivfAdcOracle(nCells = 16, nProbe = 2, m = 16,
      k = 16, iterations = 2, dim = 64, kTop = 5),

    "t1_text_stats" -> s"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       round(CAST(length(text) - (length(text) - length(replace(text, ' ', '')) + 1) + 1 AS DOUBLE)
             / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_token_len,
       round(CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
               + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
             / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS stopword_ratio,
       round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
             + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                  + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality_score
FROM $Docs ORDER BY doc_id""",

    "t2_lang_id" -> s"""
WITH s AS (
  SELECT doc_id, lang AS lang_declared,
    CAST((length(p) - length(replace(p, ' the ', ''))) / 5
       + (length(p) - length(replace(p, ' and ', ''))) / 5
       + (length(p) - length(replace(p, ' of ', ''))) / 4 AS BIGINT) AS s_en,
    CAST((length(p) - length(replace(p, ' der ', ''))) / 5
       + (length(p) - length(replace(p, ' und ', ''))) / 5
       + (length(p) - length(replace(p, ' die ', ''))) / 5 AS BIGINT) AS s_de,
    CAST((length(p) - length(replace(p, ' el ', ''))) / 4
       + (length(p) - length(replace(p, ' los ', ''))) / 5
       + (length(p) - length(replace(p, ' una ', ''))) / 5 AS BIGINT) AS s_es,
    CAST((length(p) - length(replace(p, ' le ', ''))) / 4
       + (length(p) - length(replace(p, ' les ', ''))) / 5
       + (length(p) - length(replace(p, ' une ', ''))) / 5 AS BIGINT) AS s_fr
  FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM $Docs))
SELECT doc_id, lang_declared,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred,
       s_en, s_de, s_es, s_fr
FROM s ORDER BY doc_id""",

    "t3_token_counts" -> s"""
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_tokens
FROM $Docs ORDER BY doc_id""",

    "t4_fingerprints" -> s"""
SELECT doc_id,
       CAST(sum(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 1000000007) % 1000000007 AS BIGINT) AS fingerprint
FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM $Docs)
GROUP BY doc_id ORDER BY doc_id""",

    "t5_quality_filter" -> s"""
SELECT doc_id, quality_score FROM (
  SELECT doc_id,
         round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
               + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                    + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                  / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality_score
  FROM $Docs)
WHERE quality_score >= 0.5 ORDER BY doc_id""",

    "t6_hash_sample" -> s"""
SELECT doc_id, lang, n_chars FROM $Docs
WHERE CAST('0x' || substr(md5('s1-' || doc_id), 1, 15) AS BIGINT) % 100 < 10
ORDER BY doc_id""",

    // t7/t8 reuse t5's quality expression verbatim; window sum is HUGEINT
    // in DuckDB → CAST to BIGINT (see memory: driver hash is width-aware)
    "t7_budget_pack" -> s"""WITH $QualityCte,
c AS (SELECT doc_id, lang, n_tokens, quality_score,
             CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM q)
SELECT * FROM c WHERE cum_tokens <= 8000 ORDER BY quality_score DESC, doc_id""",

    // t7b = the distributed two-phase prefix-sum form; same semantics,
    // same oracle — the scale path carries its own green row
    "t7b_budget_pack_scalable" -> s"""WITH $QualityCte,
c AS (SELECT doc_id, lang, n_tokens, quality_score,
             CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM q)
SELECT * FROM c WHERE cum_tokens <= 8000 ORDER BY quality_score DESC, doc_id""",

    // t16 = τ=1/2 temperature budgets: w = round(sqrt(n),6) (IEEE sqrt is
    // correctly rounded — exact cross-engine), Σw read as max over the
    // key-ordered running sum so both engines add in the same sequence
    "t16_temp_budgets" -> s"""
WITH k AS (SELECT lang,
             CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS n_tokens
           FROM $Docs GROUP BY lang),
ww AS (SELECT lang, n_tokens, round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS weight FROM k),
cw AS (SELECT lang, n_tokens, weight,
              sum(weight) OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
       FROM ww)
SELECT lang, n_tokens, weight,
       CAST(floor(8000.0 * weight / max(cum_w) OVER ()) AS BIGINT) AS budget_tokens
FROM cw ORDER BY lang""",

    // t18: the 3-round BPE unroll — same U+001F sentinel encoding, same
    // left-to-right non-overlapping LITERAL replace (both engines'
    // `replace` is exactly BPE's greedy merge order), same (n desc, pair)
    // tie order; each round's CTE block is generated by bpeRound so the
    // per-round semantics cannot drift between rounds
    "t18_bpe_merges" -> (s"""WITH enc0 AS (
  SELECT doc_id, chr(31) || replace(text, ' ', chr(31)||chr(31)) || chr(31) AS enc
  FROM $Docs)""" + (0 until 3).map(i => "," + bpeRound(i)).mkString + """
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS round, pair, n FROM top1
  UNION ALL SELECT 2, pair, n FROM top2
  UNION ALL SELECT 3, pair, n FROM top3) ORDER BY round"""),

    // t18b: the serve side — same 3-round unroll to enc3 (the learned
    // merges applied), then per-doc BPE token counts beside the
    // whitespace count
    "t18b_bpe_encode" -> (s"""WITH enc0 AS (
  SELECT doc_id, chr(31) || replace(text, ' ', chr(31)||chr(31)) || chr(31) AS enc
  FROM $Docs)""" + (0 until 3).map(i => "," + bpeRound(i)).mkString + s"""
SELECT e.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(string_split(substr(e.enc, 2, length(e.enc)-2), chr(31)||chr(31))) AS BIGINT)
         AS n_bpe_tokens
FROM enc3 e JOIN $Docs d USING (doc_id) ORDER BY doc_id"""),

    // t18c: canonical char-level BPE on the word dict — pair counts
    // weighted by word frequency (sum(n) not count), merged subwords
    // concatenate plainly; same exhaustion-safe LEFT JOIN rounds
    "t18c_bpe_subwords" -> (bpeSubwordTraining + """
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS round, pair, n FROM wtop1
  UNION ALL SELECT 2, pair, n FROM wtop2
  UNION ALL SELECT 3, pair, n FROM wtop3) ORDER BY round"""),

    // t18d: t18c's learned rules replayed per word (rule order = classic
    // BPE apply) over the doc's word-encoding list, one CTE per rule —
    // exhausted rounds degrade to identity exactly like the engine
    "t18d_bpe_subword_encode" -> (bpeSubwordTraining + bpeApplyChainSql),

    // t18e: the deployment composition — train the t18c subword rules on
    // the t6 HASH SAMPLE (same salted-md5 predicate as the t6 row), then
    // replay them over the FULL corpus with t18d's apply chain. Shares
    // the training generator with t18c/t18d, the apply chain with t18d,
    // and the sample predicate with t6, so none of the definitions can
    // fork.
    "t18e_bpe_sample_trained" -> (bpeSubwordTrainingFrom(
      s"""(SELECT * FROM $Docs
  WHERE CAST('0x' || substr(md5('s1-' || doc_id), 1, 15) AS BIGINT) % 100 < 10)""") +
      bpeApplyChainSql),

    // t17: the binned-CDF threshold stated directly — same 4-dp score, same
    // integer ceil target and tie-inclusive max-bin rule as the engine
    // t20: the tokenizer data card — t18c's training chain + t18d's apply
    // CTEs rolled up by language, every sum exact, both ratios derived
    // from the sums; composes the SAME fragments as t18c/t18d/t18e.
    "t20_tokenizer_card" -> (bpeSubwordTraining + bpeApplyCtes + s"""
SELECT d.lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum((length(d.text) - length(replace(d.text, ' ', ''))) + 1) AS BIGINT) AS n_words,
  CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
  CAST(sum($SubTokOf) AS BIGINT) AS n_subword_tokens,
  round(CAST(sum($SubTokOf) AS DOUBLE)
    / sum((length(d.text) - length(replace(d.text, ' ', ''))) + 1), 4) AS fertility,
  round(CAST(sum(length(d.text)) AS DOUBLE) / sum($SubTokOf), 4) AS chars_per_token
FROM apply3 a JOIN $Docs d USING (doc_id)
GROUP BY d.lang ORDER BY lang"""),

    // t21: winnowing fingerprints — the MOSS sketch recomputed over the
    // same md5-word/31-polynomial k-gram hashes as the d9 seed oracle
    // (k=5), window-min at w=4 with DuckDB's 1-based INCLUSIVE-end
    // list_slice standing in for Spark's (start, length) slice; docs
    // shorter than one window keep their global minimum, matching
    // slice's end-clamp.
    "t21_winnow_fingerprints" -> s"""$WinnowCtes
SELECT doc_id, fp FROM fps ORDER BY doc_id, fp""",

    // t21b: the MOSS match report — inverted-index self-join of the
    // sketches under the df ≤ 100 boilerplate rail, ≥ 2 shared prints.
    "t21b_winnow_similarity" -> s"""$WinnowCtes,
rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),
pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY id_a, id_b""",

    // t21c: the SERVED sketch screen — pairs whose LATER member is in the
    // increment (doc_id >= 400, the d5 split), corpus entering only
    // through its sketch rows; the engine's combined-population df rail
    // equals the whole-corpus rare set for every increment-present print.
    "t21c_winnow_screen" -> WinnowScreenSql,

    // t21d: the same screen off the STREAMING-MAINTAINED winnowfps side
    // (a real DedupStream admitBatch wrote the corpus sketch; the index
    // build admits everything, so the served corpus equals t21c's) —
    // same oracle, different serving state: the e4/e5 shared-oracle
    // discipline applied to the sketch index.
    "t21d_winnow_screen_served" -> WinnowScreenSql,

    // t19: unigram-LM NLL — per-word integer-quantized log terms summed
    // exactly (the q1 integer-cents discipline applied to logs), so the
    // per-doc reduction is order-independent on both engines; avg derives
    // from the exact integers.
    "t19_unigram_nll" -> s"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM $Docs),
f AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM f),
scored AS (
  SELECT doc_id,
         CAST(round(-ln(CAST(n AS DOUBLE) / (SELECT nn FROM tot)) * 10000) AS BIGINT) AS wn
  FROM w JOIN f USING (word))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wn) AS BIGINT) AS nll_x10k,
       round(CAST(sum(wn) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_nll
FROM scored GROUP BY doc_id ORDER BY doc_id""",

    // t19b: the SERVED screen — increment (doc_id >= 400) scored against
    // the corpus's (word, n) model, Laplace-smoothed: p(w) = (n_w + 1) /
    // (N + V + 1), OOV words take n_w = 0 (the ceiling). Same ×10⁴
    // integer quantization + exact long sums as t19.
    "t19b_unigram_nll_served" -> s"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM $Docs WHERE doc_id >= 400),
cw AS (SELECT unnest(string_split(text, ' ')) AS word
       FROM $Docs WHERE doc_id < 400),
f AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM cw GROUP BY 1),
st AS (SELECT CAST(sum(n) + count(*) + 1 AS DOUBLE) AS denom FROM f),
scored AS (
  SELECT w.doc_id,
         CASE WHEN f.n IS NULL THEN 1 ELSE 0 END AS oov,
         CAST(round(-ln((COALESCE(f.n, 0) + 1.0) / (SELECT denom FROM st))
              * 10000) AS BIGINT) AS wn
  FROM w LEFT JOIN f ON w.word = f.word)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST(sum(wn) AS BIGINT) AS nll_x10k,
       round(CAST(sum(wn) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_nll
FROM scored GROUP BY doc_id ORDER BY doc_id""",

    // t19d: the SERVED bigram screen — increment (doc_id >= 400) scored
    // against the corpus's unigram + bigram count models, Laplace-smoothed
    // on both: first word (n_w+1)/(N+V+1), later words
    // (c(prev,w)+1)/(c(prev)+V+1). Same ×10⁴ quantization + exact sums.
    "t19d_bigram_nll_served" -> s"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs WHERE doc_id >= 400),
cd AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs WHERE doc_id < 400),
f AS (SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(w) AS word FROM cd) GROUP BY 1),
st AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS v FROM f),
cbg AS (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1), i ->
          {'prev': w[i-1], 'word': w[i]})) AS b FROM cd),
bg AS (SELECT b.prev AS prev, b.word AS word, CAST(count(*) AS BIGINT) AS nb
       FROM cbg GROUP BY 1, 2),
ipr AS (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1), i ->
          {'prev': w[i-1], 'word': w[i]})) AS b FROM docs),
ip AS (SELECT doc_id, b.prev AS prev, b.word AS word FROM ipr),
terms AS (
  SELECT d.doc_id,
         CASE WHEN f.n IS NULL THEN 1 ELSE 0 END AS oov,
         CAST(round(-ln((COALESCE(f.n, 0) + 1.0) / (st.nn + st.v + 1))
              * 10000) AS BIGINT) AS wn
  FROM (SELECT doc_id, w[1] AS word FROM docs) d
  LEFT JOIN f USING (word), st
  UNION ALL
  SELECT p.doc_id,
         CASE WHEN fv.n IS NULL THEN 1 ELSE 0 END AS oov,
         CAST(round(-ln((COALESCE(b.nb, 0) + 1.0)
              / (COALESCE(fp.n, 0) + st.v + 1.0)) * 10000) AS BIGINT) AS wn
  FROM ip p
  LEFT JOIN bg b ON b.prev = p.prev AND b.word = p.word
  LEFT JOIN f fp ON fp.word = p.prev
  LEFT JOIN f fv ON fv.word = p.word, st)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST(sum(wn) AS BIGINT) AS nll_x10k,
       round(CAST(sum(wn) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_nll
FROM terms GROUP BY doc_id ORDER BY doc_id""",

    // t19c: bigram-LM NLL — first word under the unigram model, later
    // words under the MLE conditional c(prev,w)/c(prev); in-corpus
    // scoring needs no smoothing. Same ×10⁴ quantization + exact sums.
    "t19c_bigram_nll" -> s"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
uw AS (SELECT doc_id, unnest(w) AS word FROM docs),
uni AS (SELECT word, count(*) AS n FROM uw GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM uni),
pr AS (SELECT doc_id, unnest(list_transform(range(2, len(w) + 1), i ->
         {'prev': w[i-1], 'word': w[i]})) AS b FROM docs),
pairs AS (SELECT doc_id, b.prev AS prev, b.word AS word FROM pr),
big AS (SELECT prev, word, count(*) AS nb FROM pairs GROUP BY 1, 2),
terms AS (
  SELECT d.doc_id,
         CAST(round(-ln(CAST(u.n AS DOUBLE) / (SELECT nn FROM tot)) * 10000) AS BIGINT) AS wn
  FROM (SELECT doc_id, w[1] AS word FROM docs) d JOIN uni u USING (word)
  UNION ALL
  SELECT p.doc_id,
         CAST(round(-ln(CAST(b.nb AS DOUBLE) / up.n) * 10000) AS BIGINT) AS wn
  FROM pairs p JOIN big b USING (prev, word)
  JOIN uni up ON up.word = p.prev)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wn) AS BIGINT) AS nll_x10k,
       round(CAST(sum(wn) AS DOUBLE) / count(*) / 10000.0, 4) AS avg_nll
FROM terms GROUP BY doc_id ORDER BY doc_id""",

    "t17_quantile_gate" -> s"""WITH $QualityCte,
s AS (SELECT doc_id, lang, quality_score,
             CAST(round(quality_score * 10000) AS BIGINT) AS b FROM q),
h AS (SELECT lang, b, count(*) AS c FROM s GROUP BY 1, 2),
t AS (SELECT lang, (sum(c) * 2 + 4) // 5 AS target FROM h GROUP BY 1),
cum AS (SELECT lang, b,
               CAST(sum(c) OVER (PARTITION BY lang ORDER BY b DESC) AS BIGINT) AS cc
        FROM h),
thr AS (SELECT lang, max(b) AS thr_b FROM cum JOIN t USING (lang)
        WHERE cc >= target GROUP BY 1)
SELECT doc_id, s.lang, quality_score, thr_b
FROM s JOIN thr ON s.lang = thr.lang
WHERE b >= thr_b ORDER BY doc_id""",

    "t8_lang_mix" -> s"""WITH $QualityCte,
quotas AS (SELECT doc_id, lang, n_tokens, quality_score,
                  CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000 WHEN 'es' THEN 2000
                            WHEN 'fr' THEN 2000 WHEN 'zh' THEN 1500 END AS quota
           FROM q WHERE lang IN ('en', 'de', 'es', 'fr', 'zh')),
c AS (SELECT doc_id, lang, n_tokens, quality_score, quota,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM quotas)
SELECT doc_id, lang, n_tokens, quality_score, cum_tokens
FROM c WHERE cum_tokens <= quota ORDER BY lang, quality_score DESC, doc_id""",

    // t8b = t8's quota pack stratified by source (crawl-dump caps); the
    // quality expression is t5's, keyed by source instead of lang
    "t8b_source_mix" -> s"""
WITH q AS (SELECT doc_id, source,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
              + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                   + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality_score
      FROM $Docs),
quotas AS (SELECT doc_id, source, n_tokens, quality_score,
                  CASE source WHEN 'src0' THEN 800 WHEN 'src7' THEN 800
                              WHEN 'src12' THEN 600 WHEN 'src19' THEN 600 END AS quota
           FROM q WHERE source IN ('src0', 'src7', 'src12', 'src19')),
c AS (SELECT doc_id, source, n_tokens, quality_score, quota,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM quotas)
SELECT doc_id, source, n_tokens, quality_score, cum_tokens
FROM c WHERE cum_tokens <= quota ORDER BY source, quality_score DESC, doc_id""",

    "t9_seq_pack" -> s"""WITH $QualityCte,
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_token
      FROM q)
SELECT doc_id, n_tokens, start_token,
       CAST(floor(start_token / 2048.0) AS BIGINT) AS seq_id,
       start_token % 2048 AS seq_offset
FROM c ORDER BY doc_id""",

    // t9b = two-phase prefix-sum twin of t9 (same recipe as t7b)
    "t9b_seq_pack_scalable" -> s"""WITH $QualityCte,
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_token
      FROM q)
SELECT doc_id, n_tokens, start_token,
       CAST(floor(start_token / 2048.0) AS BIGINT) AS seq_id,
       start_token % 2048 AS seq_offset
FROM c ORDER BY doc_id""",

    // t10 = Gopher-style repetition signals, word-wise (docs are single
    // lines): dup-word fraction + share of words covered by the top bigram
    "t10_repetition" -> s"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS dup_word_frac
         FROM w),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      FROM w WHERE len(w) >= 2),
top AS (SELECT doc_id, max(c) AS top_c FROM (
          SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        GROUP BY doc_id)
SELECT b.doc_id, b.n_words, b.dup_word_frac,
       round(least(1.0, CAST(coalesce(t.top_c, 0) * 2 AS DOUBLE) / b.n_words), 4) AS top2_frac
FROM base b LEFT JOIN top t USING (doc_id) ORDER BY doc_id""",

    // t11 = PII scrub: same explicit-character-class patterns as the
    // Spark side (the Java-regex ∩ RE2 subset); 'g' = replace all, as
    // Spark's regexp_replace does by default
    "t11_pii_scrub" -> s"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_digit_runs,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
         '[0-9]{7,}', '<NUM>', 'g') AS text_clean
FROM $Docs ORDER BY doc_id""",

    // t12 = 64-word chunks advancing by 48 (overlap 16): chunk count is
    // 1 + ceil((n-64)/48) so starts are 0, 48, 96, … < n; the tail chunk
    // is short, never padded
    "t12_chunking" -> s"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM $Docs),
n AS (SELECT doc_id, w, len(w) AS nw FROM t),
c AS (SELECT doc_id, w,
        unnest(range(0, 1 + CAST(greatest(0, ceil((nw - 64) / 48.0)) AS BIGINT))) AS chunk_id
      FROM n)
SELECT doc_id, chunk_id, chunk_id * 48 AS start_word,
       CAST(len(list_slice(w, chunk_id*48 + 1, chunk_id*48 + 64)) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(w, chunk_id*48 + 1, chunk_id*48 + 64), ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id""",

    // t13 = word-frequency vocabulary, rank by (count desc, word), top
    // 1000 with cumulative token-stream coverage
    "t13_vocabulary" -> s"""
WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM $Docs),
counts AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY word),
total AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
ranked AS (SELECT word, n,
                  CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank,
                  CAST(sum(n) OVER (ORDER BY n DESC, word ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
           FROM counts)
SELECT word, rank, n, round(CAST(cum_n AS DOUBLE) / t, 6) AS coverage
FROM ranked, total WHERE rank <= 1000 ORDER BY rank""",

    // t15 = per-doc OOV rate + mean in-vocab rank vs the top-200
    // vocabulary (t13's ranking at a tighter cut) — every aggregate is an
    // integer, both output ratios one exact division rounded to 4 dp
    "t15_oov_stats" -> s"""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM $Docs),
counts AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY word),
vocab AS (SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank
          FROM counts ORDER BY n DESC, word LIMIT 200),
j AS (SELECT w.doc_id, v.rank FROM words w LEFT JOIN vocab v USING (word))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(CASE WHEN rank IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS oov_rate,
       CASE WHEN count(rank) > 0
            THEN round(sum(rank) / CAST(count(rank) AS DOUBLE), 4) END AS mean_rank
FROM j GROUP BY doc_id ORDER BY doc_id""",

    // t14 = per-language data card; quality enters as sum of round(q·10⁴)
    // longs (the q1 integer-cents discipline — no float summation order)
    "t14_corpus_report" -> s"""
WITH q AS (SELECT lang,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        round(least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
              + (CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5
                   + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3 AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)) * 0.5, 4) AS quality
      FROM $Docs)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS BIGINT) AS sum_quality_x10k,
       CAST(sum(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_half
FROM q GROUP BY lang ORDER BY lang""",

    // m1: the mixed-modality media table — every 4th doc is a VIDEO
    // record (a real RIFF/AVI whose avih header the engine's chunk walk
    // parses back: dims shared with the image formula, n_pixels =
    // w·h·frames, the whole-clip decode-cost unit), the rest REAL PNGs.
    // The oracle predicts both paths; equality is evidence the real
    // decoders ran (the engine never sees the generator's numbers — it
    // re-reads them from the container bytes).
    "m1_media_meta" -> mediaMetaSql,
    // m1b: the decode-only twin reads pre-generated payload parquet —
    // the RESULT is identical by construction, so the oracle is m1's,
    // byte-shared (what makes the pair a pure encode-vs-decode seam).
    "m1b_media_meta_from_table" -> mediaMetaSql,

    // m6: the media data card — m1's per-modality formulas rolled up per
    // (media_type, format); exact integer sums (video pixels carry the
    // frame-count multiplier).
    "m6_media_card" -> s"""
WITH m AS (SELECT
       CASE WHEN doc_id % 4 = 0 THEN 'video/' || source
            WHEN doc_id % 7 = 2 THEN 'image/bmp'
            ELSE 'image/png' END AS media_type,
       CASE WHEN doc_id % 4 = 0 THEN 'avi'
            WHEN doc_id % 7 = 2 THEN 'bmp'
            ELSE 'png' END AS format,
       CAST(16 + length(text) % 48 AS BIGINT) AS w,
       CAST(16 + (length(text) * 7) % 48 AS BIGINT) AS h,
       CASE WHEN doc_id % 4 = 0 THEN CAST(2 + length(text) % 3 AS BIGINT)
            ELSE CAST(1 AS BIGINT) END AS nf
     FROM $Docs)
SELECT media_type, format, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(w * h * nf) AS BIGINT) AS total_pixels,
       min(w) AS min_w, max(w) AS max_w, min(h) AS min_h, max(h) AS max_h
FROM m GROUP BY media_type, format
ORDER BY media_type, format""",

    // m2 at box = 32: the fixture's 16–63-px dims (one formula across
    // modalities — video thumbs come off the avih header dims) exercise
    // both the fit-through and the floor-arithmetic downscale branch.
    "m2_resize" -> s"""
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= 32 THEN width
            ELSE CAST(floor(width * 32.0 / greatest(width, height)) AS BIGINT) END AS thumb_w,
       CASE WHEN greatest(width, height) <= 32 THEN height
            ELSE CAST(floor(height * 32.0 / greatest(width, height)) AS BIGINT) END AS thumb_h
FROM (SELECT doc_id,
             CAST(16 + length(text) % 48 AS BIGINT) AS width,
             CAST(16 + (length(text) * 7) % 48 AS BIGINT) AS height
      FROM $Docs)
ORDER BY doc_id""",

    // m3 — REAL keyframe extraction over the VIDEO subset: the engine
    // parses the AVI container, decodes the evenly-sampled PNG frames
    // and aHashes them; the oracle recomputes the same prints from the
    // generative frame-pixel formula ((x·31 + y·17 + len + fno·7) &
    // 0xffffff) through the shared aHash arithmetic — agreement proves
    // the container→frame→pixel round-trip bit-exactly.
    "m3_frame_sample" -> s"""
WITH $VideoCteList,
$VideoFrameBitsCteList
SELECT f.doc_id, CAST(f.i AS BIGINT) AS frame_idx,
       CAST(f.fno AS BIGINT) AS frame_no,
       CAST(v.w AS BIGINT) AS width, CAST(v.h AS BIGINT) AS height,
       f.h_hi, f.h_lo
FROM fbits f JOIN vp v ON v.doc_id = f.doc_id
ORDER BY f.doc_id, frame_idx""",

    // m3b: SHOT-LEVEL near-dups — same-ordinal frame prints within
    // Hamming 3, banded candidates keyed (ordinal, band, key) under the
    // mirrored combined-population rail (the engine's frameNearDups);
    // m3c is the SERVED restriction over the same chain (the m5e/m5f
    // rule — its corpus is the all-admitted t21d index, so the pair set
    // equals the session-split form by construction).
    "m3b_frame_near_dups" -> frameNearDupSql("a.doc_id < b.doc_id"),
    "m3c_frame_near_dups_served" ->
      frameNearDupSql("""b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)"""),

    // m3f: the video time-shift tier — fixed-stride frame prints of the
    // prepended fixture recomputed from the generative formulas (intro
    // family +7000-displaced), the m5h per-ordinal chain on the frame
    // axis; a prepended re-edit matches at exactly its intro count.
    "m3f_frame_shift_near_dups" -> frameShiftNearDupSql,

    // m3g: the stride screen SERVED (prepended increment vs the
    // unprepended corpus); m3h is the maintained-side twin off the
    // twentieth framestride side — one oracle (the m5e/m5f rule).
    "m3g_frame_shift_served" -> frameShiftServedSql,
    "m3h_frame_shift_maintained" -> frameShiftServedSql,

    // m3i: the dihedral∘shift composition — dihedral-CANONICAL stride
    // prints (the m4k HUGEINT-least recomputation per stride frame, over
    // MIRRORED pixels where the fixture's (doc_id/4)%2 rule says) matched
    // by the m3f chain verbatim: the mirrored-AND-prepended re-edit the
    // r19 verdict named, caught at its true intro offset.
    "m3i_frame_kstride_near_dups" -> frameKStrideNearDupSql,
    // m3j: the canonical-stride screen SERVED (mirrored+prepended
    // increment vs the plain corpus); m3k is the maintained-side twin off
    // the twenty-first framestridek side — one oracle (the m5e/m5f rule).
    "m3j_frame_kstride_served" -> frameKStrideServedSql,
    "m3k_frame_kstride_maintained" -> frameKStrideServedSql,

    // m7d: d1's exact-dedup semantics on video — identical keyframe
    // prints form a group, keeper = min doc_id (m4b/m5b's rule on the
    // fourth modality), over the m7b keyframe chain.
    "m7d_video_dup_groups" -> s"""
WITH $VideoCteList,
$VideoKeyframeBitsCteList,
grp AS (SELECT h_hi, h_lo, min(doc_id) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM abits GROUP BY 1, 2)
SELECT b.doc_id, g.keeper_id, g.n_copies
FROM abits b JOIN grp g USING (h_hi, h_lo) ORDER BY doc_id""",

    // m7: the video modality's metadata round-trip — every field (header
    // dims, movi frame count, timing-implied duration at the generator's
    // 25 fps) recomputed from the generative formula.
    "m7_video_meta" -> s"""
WITH $VideoCteList
SELECT doc_id, 'avi' AS format, CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height, CAST(nf AS BIGINT) AS n_frames,
       CAST(nf * 40 AS BIGINT) AS duration_ms
FROM vp ORDER BY doc_id""",

    // m7b: near-dup videos via KEYFRAME prints (frame 0's aHash — the
    // fno = 0 case of the m3 chain) under the mirrored band rail; m7c is
    // the SERVED restriction over the same chain (the m5e/m5f rule).
    "m7b_video_near_dups" ->
      videoKeyframeNearDupSql("a.doc_id < b.doc_id"),
    "m7c_video_near_dups_served" ->
      videoKeyframeNearDupSql("""b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)"""),

    // m7e: the DIHEDRAL-canonical keyframe print — the m4k chain applied
    // to frame 0's generative pixels; the engine must land on the same
    // canonical prints from frames it decoded out of a real AVI
    // container. m7f is the SERVED restriction off the maintained
    // videokhashes side (the m4n rule on the fourth modality).
    "m7e_video_dihedral_near_dups" ->
      videoDihedralNearDupSql("a.doc_id < b.doc_id"),
    "m7f_video_dihedral_served_maintained" ->
      videoDihedralNearDupSql("""b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)"""),

    // m3d: the shot-level screen over canonical prints — per-ordinal
    // dihedral recomputation (luma term l + fno·7), same-ordinal banded
    // candidates under the mirrored per-ordinal rail; m3e is the SERVED
    // restriction off the maintained framekhashes side (the m3c rule).
    "m3d_frame_dihedral_near_dups" ->
      frameDihedralNearDupSql("a.doc_id < b.doc_id"),
    "m3e_frame_dihedral_served_maintained" ->
      frameDihedralNearDupSql("""b.doc_id >= 400 AND a.doc_id <> b.doc_id
           AND (a.doc_id < 400 OR a.doc_id < b.doc_id)"""),

    // m5h: time-shift-robust audio near-dups over the SHIFTED fixture —
    // windowed sub-prints recomputed from the generative sample formula
    // behind each clip's leading-silence pad; a pair of equal-length
    // clips under different pads matches at exactly its pad delta.
    "m5h_audio_shift_near_dups" -> audioShiftNearDupSql,

    // m5i: the shift screen SERVED (padded increment vs the unpadded
    // session-cache corpus); m5j is the maintained-side twin off the
    // seventeenth audiowins side — one oracle (the m5e/m5f rule).
    "m5i_audio_shift_served" -> audioShiftServedSql,
    "m5j_audio_shift_maintained" -> audioShiftServedSql,

    // m5k: the reversal-canonical print — the oracle recomputes the
    // symmetric-bound energies and BOTH packings from the generative
    // sample formula and takes their HUGEINT minimum; agreement proves
    // the engine's canonicalization bit-exactly off real decoded PCM.
    "m5k_audio_reversal_phash" -> s"""
WITH $ReversalBitsCteList
SELECT doc_id, h_hi, h_lo, CAST(nf AS BIGINT) AS n_frames
FROM rvbits ORDER BY doc_id""",

    // m5l: banded near-dups over the canonical prints, rail mirrored
    // (the m4l discipline — canonical acoustic prints of the generative
    // sawtooth correlate heavily, so the oracle must prune exactly the
    // engine's buckets).
    "m5l_audio_reversal_near_dups" -> s"""
WITH $ReversalBitsCteList,
${bandRailOver("rvbits", "rv")},
rvcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM rvpruned a JOIN rvpruned b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM rvcand c JOIN rvbits x ON x.doc_id = c.id_a
              JOIN rvbits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m5m: the reversal∘shift composition — dual-family canonical window
    // prints recomputed from the generative formula under the mixed
    // reversed/plain rule; a reversed(+padded) rendition matches on the
    // cross family legs, a plain copy on (f,f).
    "m5m_audio_revwin_near_dups" -> audioRevNearDupSql,

    // m5n: the reversal∘shift screen SERVED (mixed-rule increment vs the
    // plain session-cache corpus); m5o is the maintained-side twin off
    // the nineteenth audiorwins side — one oracle (the m5e/m5f rule).
    "m5n_audio_revwin_served" -> audioRevServedSql,
    "m5o_audio_revwin_maintained" -> audioRevServedSql,

    // m4: the engine aHashes PIXELS it decoded from real PNG bytes; the
    // oracle computes the same 8×8 nearest-sample / integer-luma /
    // mean-threshold arithmetic from the generative pixel formula
    // ((x*31 + y*17 + len) & 0xffffff) — agreement proves the decode
    // round-trip bit-exactly, the m1-dims trick extended to pixel data.
    "m4_image_phash" -> s"""$ImagePhashCtes
SELECT doc_id, h_hi, h_lo, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
FROM bits ORDER BY doc_id""",

    // m4e: the dHash GRADIENT lens — a 9×8 nearest-sample luma grid over
    // the same generative pixels, bit (x, y) = luma(x+1, y) > luma(x, y)
    // (flat 1-based list index y·9 + x + 1); the engine must land on the
    // same bits from pixels it decoded out of real PNG bytes.
    "m4e_image_dhash" -> s"""$ImagePhashCtes,
$ImageDHashBitsCteList
SELECT doc_id, h_hi, h_lo,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
FROM dbits ORDER BY doc_id""",

    // m4f: the banded near-dup search over the GRADIENT lens — the m4c
    // arithmetic on the dHash prints, with the engine's band rail
    // MIRRORED (the m5d discipline: gradient prints of a generative ramp
    // are far more correlated than mean-threshold ones, so a (band, key)
    // bucket CAN exceed maxBucket at a larger SF — the oracle must drop
    // exactly the pairs the engine drops or scale-up flips this red).
    "m4f_image_dhash_near_dups" -> s"""$ImagePhashCtes,
$ImageDHashBitsCteList,
${bandRailOver("dbits", "d")},
dcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM dpruned a JOIN dpruned b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM dcand c JOIN dbits x ON x.doc_id = c.id_a
             JOIN dbits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m4g: the MULTI-LENS candidate union — aHash band candidates ∪
    // dHash band candidates (each under its own mirrored rail), dedup on
    // (id_a, id_b), ONE verify computing BOTH exact distances; a pair
    // survives if EITHER lens sees it within Hamming 3. The engine must
    // land on the identical pair set AND both distances from pixels it
    // decoded once out of real PNG bytes.
    "m4g_image_lens_union" -> s"""$ImagePhashCtes,
$ImageDHashBitsCteList,
${bandRailOver("bits", "ua")},
${bandRailOver("dbits", "ud")},
ucand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM uapruned a JOIN uapruned b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
          UNION
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM udpruned a JOIN udpruned b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(xa.h_hi, xb.h_hi))
            + bit_count(xor(xa.h_lo, xb.h_lo)) AS BIGINT) AS ham_ahash,
       CAST(bit_count(xor(ya.h_hi, yb.h_hi))
            + bit_count(xor(ya.h_lo, yb.h_lo)) AS BIGINT) AS ham_dhash
FROM ucand c JOIN bits xa ON xa.doc_id = c.id_a
             JOIN bits xb ON xb.doc_id = c.id_b
             JOIN dbits ya ON ya.doc_id = c.id_a
             JOIN dbits yb ON yb.doc_id = c.id_b
WHERE bit_count(xor(xa.h_hi, xb.h_hi)) + bit_count(xor(xa.h_lo, xb.h_lo)) <= 3
   OR bit_count(xor(ya.h_hi, yb.h_hi)) + bit_count(xor(ya.h_lo, yb.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m2b: REAL thumbnails — thumb dims from the integer box-fit rule,
    // thumb pixel (x, y) = src((x·w)//tw, (y·h)//th) (nearest sampling,
    // the engine's one resize rule), then the standard aHash over the
    // thumb grid: sample position ((k%8)·tw)//8 in THUMB space composes
    // with the resize into nested integer floors over the generative
    // source pixels — exactly what the engine's materialized pixels
    // produce, so agreement proves the resample bit-exactly.
    "m2b_thumb_hashes" -> s"""$ImagePhashCtes,
td AS (SELECT doc_id, l, w, h,
        CASE WHEN greatest(w, h) <= 32 THEN w ELSE w * 32 // greatest(w, h) END AS tw,
        CASE WHEN greatest(w, h) <= 32 THEN h ELSE h * 32 // greatest(w, h) END AS th
      FROM dm),
tg AS (SELECT doc_id, tw, th,
         list_transform(
           list_transform(range(0, 64), k ->
             (((((k % 8) * tw) // 8) * w // tw) * 31
              + ((((k // 8) * th) // 8) * h // th) * 17 + l) & 16777215),
           v -> (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
                 + (v & 255) * 114) // 1000) AS gray
       FROM td),
tm AS (SELECT doc_id, tw, th, gray, list_sum(gray) // 64 AS mean FROM tg)
SELECT doc_id, CAST(tw AS BIGINT) AS thumb_w, CAST(th AS BIGINT) AS thumb_h,
       CAST(list_sum(list_transform(range(32, 64), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << (k - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(0, 32), k ->
         CASE WHEN gray[k + 1] > mean THEN (CAST(1 AS BIGINT) << k)
              ELSE 0 END)) AS BIGINT) AS h_lo
FROM tm ORDER BY doc_id""",

    // m4o: the spatial-crop tier — tile sub-prints (the tile-grid aHash
    // recomputation over the crop-rule renditions) matched per 2-D
    // ordinal under a ±1 offset square: the cropped re-upload every
    // full-frame lens misses, caught at its true (dx, dy).
    "m4o_image_tile_near_dups" -> imageTileNearDupSql,
    // m4p: the tile screen SERVED (cropped increment vs the uncropped
    // corpus); m4q is the maintained-side twin off the twenty-second
    // imagetiles side — one oracle (the m5e/m5f rule).
    "m4p_image_tile_served" -> imageTileServedSql,
    "m4q_image_tile_maintained" -> imageTileServedSql,
    // m4r: the crop∘dihedral composition — dihedral-CANONICAL tile
    // prints in four anchor families; the matched family is the
    // transform witness. m4s is the served form (plain corpus 'lt'
    // side vs the composed increment's four families); m4t the
    // maintained-side twin off the twenty-third side — one oracle
    // (the m5e/m5f rule).
    "m4r_image_ktile_near_dups" -> imageTileKNearDupSql,
    "m4s_image_ktile_served" -> imageTileKServedSql,
    "m4t_image_ktile_maintained" -> imageTileKServedSql,

    // m4k: the dihedral-canonical print — the oracle recomputes the
    // symmetric grid and ALL 8 orientations' packed prints from the
    // generative pixels and takes their HUGEINT minimum; agreement
    // proves the engine's canonicalization bit-exactly.
    "m4k_image_dihedral_phash" -> s"""$ImagePhashCtes,
$DihedralBitsCteList
SELECT doc_id, h_hi, h_lo,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
FROM kbits ORDER BY doc_id""",

    // m4l: banded near-dups over the canonical prints, rail mirrored
    // (the m4f discipline — canonical prints of structured content can
    // correlate, so the oracle must prune exactly the engine's buckets).
    "m4l_image_dihedral_near_dups" -> s"""$ImagePhashCtes,
$DihedralBitsCteList,
${bandRailOver("kbits", "dk")},
kcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM dkpruned a JOIN dkpruned b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM kcand c JOIN kbits x ON x.doc_id = c.id_a
             JOIN kbits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m4n: the dihedral rung SERVED — the m4l railed search under the
    // m4d increment-later restriction (the t21d index builds under
    // dihedralRung, so the maintained imagekhashes side equals the
    // session print cache's corpus split by the all-admitted build).
    "m4n_image_dihedral_served_maintained" -> s"""$ImagePhashCtes,
$DihedralBitsCteList,
${bandRailOver("kbits", "sk")},
skc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM skpruned a JOIN skpruned b
          ON a.band = b.band AND a.key = b.key
         AND b.doc_id >= 400 AND a.doc_id <> b.doc_id
         AND (a.doc_id < 400 OR a.doc_id < b.doc_id))
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM skc c JOIN kbits x ON x.doc_id = c.id_a
           JOIN kbits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m4m: exact-dedup over the canonical prints — orientation variants
    // collapse into one group, keeper = min doc_id (the m4b rule on the
    // dihedral family).
    "m4m_image_dihedral_dup_groups" -> s"""$ImagePhashCtes,
$DihedralBitsCteList,
kgrp AS (SELECT h_hi, h_lo, min(doc_id) AS keeper_id,
                CAST(count(*) AS BIGINT) AS n_copies
         FROM kbits GROUP BY 1, 2)
SELECT b.doc_id, g.keeper_id, g.n_copies
FROM kbits b JOIN kgrp g USING (h_hi, h_lo) ORDER BY doc_id""",

    // m4h: the lens union SERVED — each lens's railed band candidates
    // under the m4d increment-later restriction, verified within its OWN
    // lens space, pairs unioned. m4i is the maintained-side twin (the
    // t21d index is built under BothLens, so its imagehashes/imagedhashes
    // parquet equals the session cache's corpus split — same oracle, the
    // e4/e5 shared-oracle discipline).
    "m4h_image_lens_union_served" -> imageLensUnionServedSql,
    "m4i_image_lens_union_maintained" -> imageLensUnionServedSql,

    // m4b: d1's exact-dedup semantics on the image modality — identical
    // fingerprints form a group, keeper = min doc_id.
    "m4b_image_dup_groups" -> s"""$ImagePhashCtes,
grp AS (SELECT h_hi, h_lo, min(doc_id) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM bits GROUP BY 1, 2)
SELECT b.doc_id, g.keeper_id, g.n_copies
FROM bits b JOIN grp g USING (h_hi, h_lo) ORDER BY doc_id""",

    // m4c: Hamming ≤ 3 near-dup image pairs — the oracle brute-forces the
    // n² bit_count over the formula-derived fingerprints (documented
    // exact baseline, the d4 pattern); the engine's banded pigeonhole
    // must reproduce it exactly (4 disjoint 16-bit bands ⇒ full recall
    // at Hamming ≤ 3).
    "m4c_image_near_dups" -> s"""$ImagePhashCtes
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
FROM bits a JOIN bits b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m4d: the SERVED image screen — near-dup pairs whose LATER member is
    // in the increment (doc_id >= 400, the d5 split); the corpus enters
    // only through its maintained fingerprint rows. Brute-force restricted
    // to the increment side, exactly the d9b oracle pattern.
    "m4d_image_near_dups_served" -> s"""$ImagePhashCtes
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
FROM bits a JOIN bits b ON a.doc_id < b.doc_id AND b.doc_id >= 400
WHERE bit_count(xor(a.h_hi, b.h_hi)) + bit_count(xor(a.h_lo, b.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m5: the audio modality — header fields and the PCM content hash
    // recomputed from the generative formula; the engine parses them out
    // of a real WAV with javax.sound.sampled, so agreement proves the
    // container round-trip bit-exactly (the m4 discipline).
    "m5_audio_meta" -> audioMetaSql,
    // m5g: the decode-only twin (the m1b discipline) — oracle byte-shared.
    "m5g_audio_meta_from_table" -> audioMetaSql,

    // m5d: audio NEAR-dups — the acoustic fingerprint (65 equal sample
    // windows by integer bounds, exact energy sums, bit w = E(w+1) >
    // E(w), two 32-bit halves) recomputed from the generative formula,
    // brute-force Hamming ≤ 3 (the m4c oracle pattern; the engine's
    // banded pigeonhole must land on the identical pair set).
    "m5d_audio_near_dups" -> s"""$AudioCtes,
$AudioFpCteList,
$BandRailCteList,
acand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM apruned a JOIN apruned b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(x.h_hi, y.h_hi))
            + bit_count(xor(x.h_lo, y.h_lo)) AS BIGINT) AS hamming
FROM acand c JOIN abits x ON x.doc_id = c.id_a
             JOIN abits y ON y.doc_id = c.id_b
WHERE bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) <= 3
ORDER BY id_a, id_b""",

    // m5e: m5d's screen SERVED — pairs whose LATER member is in the
    // increment (the m4d restriction over the same recomputed prints),
    // under the same mirrored band rail.
    "m5e_audio_near_dups_served" -> audioServedNearDupSql,

    // m5f: m5e's screen off the streaming-MAINTAINED audiofps side —
    // the same pair set by construction (the t21d/t21c shared-oracle
    // discipline: the side is written by an all-admitted corpus
    // admission, so the maintained prints equal the session cache's).
    "m5f_audio_near_dups_maintained" -> audioServedNearDupSql,

    // m5b: d1's exact-dedup semantics on audio — identical PCM content
    // groups, keeper = min doc_id (m4b's rule on the third modality).
    "m5b_audio_dup_groups" -> s"""$AudioCtes,
ag AS (SELECT pcm_hash, min(doc_id) AS keeper_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM am GROUP BY 1)
SELECT am.doc_id, ag.keeper_id, ag.n_copies
FROM am JOIN ag USING (pcm_hash) ORDER BY doc_id""",

    // ---- flagship relational agg (driver-contract example shape) -------
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
}
