package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, k[, algo])` — fused distinct word-k-shingle
  * hashes per document: split on ' ' (trailing empties kept, as Spark
  * `split` does), per-word portable 60-bit hash mod p, adjacent word
  * hashes combined polynomially (Σ wh[i+j]·31^(k−1−j) mod p), then
  * first-occurrence-order dedup (exact `array_distinct` semantics). Docs
  * with fewer than k words yield an EMPTY array — callers filter
  * `size > 0`, mirroring the declarative form's `size(whs) >= k` drop.
  *
  * `algo` selects the word hash (an analysis-time constant — the
  * generated code dispatches on a compiled-in flag, not per row):
  *  - `'md5'` (default): first 15 hex digits of md5 — identical to
  *    [[graft.llm.TextOps.h60]] and reproducible bit-for-bit by the
  *    DuckDB oracle. The correctness-gate path.
  *  - `'xxh64'`: Spark's own XXH64 (seed 42, the built-in `xxhash64`),
  *    top 60 bits, mod p — the PRODUCTION hash, ~an order of magnitude
  *    cheaper than md5 with no crypto state. Every downstream set
  *    operation (minhash, banding, Jaccard) is hash-agnostic, so the
  *    swap is this one argument; LlmSpec asserts the fixture's verified
  *    near-dup pair set is identical under both hashes.
  *
  * Why a custom Expression (SURVEY §4, same rationale as graft_simhash):
  * the declarative formulation was the ONLY shuffle in the whole d2/d4
  * shingling path — posexplode each word, md5 on the exploded stream, and
  * a collect_list aggregation to reassemble per-doc arrays, plus an
  * aggregation barrier needed to stop CollapseProject from inlining the
  * word-hash array quadratically. This computes the array in one pass per
  * row inside whole-stage codegen: no explode, no shuffle, no barrier
  * required — shingling becomes a narrow map, so dedup candidate
  * generation scales embarrassingly parallel with the corpus. The heavy
  * body is a static method invoked from generated code (StaticInvoke
  * pattern — md5 needs thread-local MessageDigest state). */
case class ShinglesExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  def this(text: Expression, k: Expression) = this(text, k, Literal("md5"))

  override def checkInputDataTypes(): TypeCheckResult =
    ShinglesExpr.checkArgs(prettyName, first, second, third)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val algo: Int =
    ShinglesExpr.algoCode(third.eval().asInstanceOf[UTF8String].toString)

  override protected def nullSafeEval(t: Any, b: Any, a: Any): Any =
    ShinglesExpr.shingles(t.asInstanceOf[UTF8String], b.asInstanceOf[Int], algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // algo is folded into the generated source as a constant — no per-row
    // string comparison survives into the hot loop
    nullSafeCodeGen(ctx, ev, (t, b, _) =>
      s"${ev.value} = graft.functions.ShinglesExpr.shingles($t, $b, $algo);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_shingles"
}

/** `graft_pos_shingles(text, k[, algo])` — the POSITIONAL variant of
  * [[ShinglesExpr]]: the same word-hash + polynomial k-gram combine, but
  * emitted in document order WITHOUT dedup, so `array index == word
  * position` (element i is the hash of words [i, i+k)). This is the seed
  * table for span-level dedup ([[graft.llm.DedupOps.duplicatedSpans]]):
  * matching a duplicated substring needs every occurrence at its position,
  * which the distinct-set form deliberately erases. Same analysis-time
  * argument checks, same empty-array contract for docs shorter than k
  * words, same md5/xxh64 oracle-vs-production hash seam. */
case class PosShinglesExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  def this(text: Expression, k: Expression) = this(text, k, Literal("md5"))

  // identical argument surface → identical analysis-time validation,
  // reported under THIS function's name
  override def checkInputDataTypes(): TypeCheckResult =
    ShinglesExpr.checkArgs(prettyName, first, second, third)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val algo: Int =
    ShinglesExpr.algoCode(third.eval().asInstanceOf[UTF8String].toString)

  override protected def nullSafeEval(t: Any, b: Any, a: Any): Any =
    ShinglesExpr.posShingles(t.asInstanceOf[UTF8String], b.asInstanceOf[Int], algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b, _) =>
      s"${ev.value} = graft.functions.ShinglesExpr.posShingles($t, $b, $algo);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_pos_shingles"
}

object ShinglesExpr {

  private val P = 1000000007L

  val Md5 = 0
  val Xxh64 = 1

  def algoCode(name: String): Int = name match {
    case "md5" => Md5
    case "xxh64" => Xxh64
    case _ => -1
  }

  /** Shared analysis-time validation for the distinct and positional
    * forms — session-registered → reachable from arbitrary SQL, so a bad
    * shingle width or algo is rejected at ANALYSIS time rather than on
    * executors, and the diagnostic names the function the user called. */
  private[functions] def checkArgs(fn: String, first: Expression,
      second: Expression, third: Expression): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, IntegerType, _: StringType)
          if second.foldable && third.foldable =>
        (second.eval(), third.eval()) match {
          case (k: java.lang.Integer, _) if k < 1 || k > 7 =>
            TypeCheckResult.TypeCheckFailure(
              s"$fn k must be an int literal in [1, 7], got $k")
          case (_, a: UTF8String) if algoCode(a.toString) < 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"$fn algo must be 'md5' or 'xxh64', got $a")
          case (_: java.lang.Integer, _: UTF8String) =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$fn got non-literal arguments $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$fn expects (string, foldable int[, foldable string]), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          third.dataType.catalogString)
    }

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** h60(w) % p: first 8 md5 digest bytes big-endian >>> 4 (= first 15 hex
    * digits as a long), reduced mod p — bit-identical to the declarative
    * `conv(substr(md5(w),1,15),16,10) % p`. */
  private def wordHashMd5(digest: MessageDigest, w: String): Long = {
    digest.reset()
    val d = digest.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h >>> 4) % P
  }

  /** Production hash: Spark's XXH64 at the built-in `xxhash64` seed (42),
    * top 60 bits mod p — the same [0, p) domain the permutation and
    * combination arithmetic downstream is bounded for. */
  private def wordHashXx(w: String): Long = {
    val u = UTF8String.fromString(w)
    (XxHash64Function.hash(u, StringType, 42L) >>> 4) % P
  }

  /** Word-hash pass shared by the distinct and positional forms: null when
    * the doc has fewer than k words (callers emit the empty array). */
  private def hashWords(text: UTF8String, k: Int, algo: Int): Array[Long] = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    if (n < k) return null
    // words repeat heavily in real text: hash each distinct word once
    val cache = new java.util.HashMap[String, java.lang.Long](Math.max(16, n * 2))
    val wh = new Array[Long](n)
    val digest = if (algo == Md5) md5.get() else null
    var i = 0
    while (i < n) {
      val w = words(i)
      val c = cache.get(w)
      if (c != null) wh(i) = c.longValue()
      else {
        val h = if (algo == Md5) wordHashMd5(digest, w) else wordHashXx(w)
        wh(i) = h; cache.put(w, h)
      }
      i += 1
    }
    wh
  }

  // Σ_j wh[i+j]·31^(k−1−j): per-term bound p·31^(k−1) < 2^60 and sum
  // < k·2^60 ≤ 2^63 at the k ≤ 7 analysis bound — no silent long wrap,
  // and the DuckDB oracle's BIGINT mirror stays overflow-free too
  private def coefficients(k: Int): Array[Long] = {
    val coef = new Array[Long](k)
    coef(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { coef(j) = coef(j + 1) * 31L; j -= 1 }
    coef
  }

  def shingles(text: UTF8String, k: Int, algo: Int): ArrayData = {
    val wh = hashWords(text, k, algo)
    if (wh == null) return new GenericArrayData(Array.emptyLongArray)
    val n = wh.length
    val coef = coefficients(k)
    val out = new Array[Long](n - k + 1)
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, n * 2))
    var m = 0
    var i = 0
    var j = 0
    while (i <= n - k) {
      var s = 0L
      j = 0
      while (j < k) { s += wh(i + j) * coef(j); j += 1 }
      val sh = s % P
      if (seen.add(sh)) { out(m) = sh; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Positional form: element i is the k-gram hash at word position i —
    * no dedup, array length = n − k + 1. */
  def posShingles(text: UTF8String, k: Int, algo: Int): ArrayData = {
    val wh = hashWords(text, k, algo)
    if (wh == null) return new GenericArrayData(Array.emptyLongArray)
    val n = wh.length
    val coef = coefficients(k)
    val out = new Array[Long](n - k + 1)
    var i = 0
    var j = 0
    while (i <= n - k) {
      var s = 0L
      j = 0
      while (j < k) { s += wh(i + j) * coef(j); j += 1 }
      out(i) = s % P
      i += 1
    }
    new GenericArrayData(out)
  }
}
