package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, k)` — fused distinct word-k-shingle hashes per
  * document: split on ' ' (trailing empties kept, as Spark `split` does),
  * per-word portable 60-bit hash mod p (first 15 hex digits of md5 —
  * identical to [[graft.llm.TextOps.h60]] and the DuckDB oracle), adjacent
  * word hashes combined polynomially (Σ wh[i+j]·31^(k−1−j) mod p), then
  * first-occurrence-order dedup (exact `array_distinct` semantics). Docs
  * with fewer than k words yield an EMPTY array — callers filter
  * `size > 0`, mirroring the declarative form's `size(whs) >= k` drop.
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
case class ShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      // session-registered → reachable from arbitrary SQL: reject a bad
      // shingle width at ANALYSIS time rather than on executors
      right.eval() match {
        case k: java.lang.Integer if k >= 1 && k <= 7 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_shingles k must be an int literal in [1, 7], got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (string, foldable int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(t: Any, b: Any): Any =
    ShinglesExpr.shingles(t.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) =>
      s"${ev.value} = graft.functions.ShinglesExpr.shingles($t, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingles"
}

object ShinglesExpr {

  private val P = 1000000007L

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** h60(w) % p: first 8 md5 digest bytes big-endian >>> 4 (= first 15 hex
    * digits as a long), reduced mod p — bit-identical to the declarative
    * `conv(substr(md5(w),1,15),16,10) % p`. */
  private def wordHash(digest: MessageDigest, w: String): Long = {
    digest.reset()
    val d = digest.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h >>> 4) % P
  }

  def shingles(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // words repeat heavily in real text: hash each distinct word once
    val cache = new java.util.HashMap[String, java.lang.Long](Math.max(16, n * 2))
    val wh = new Array[Long](n)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      val w = words(i)
      val c = cache.get(w)
      if (c != null) wh(i) = c.longValue()
      else { val h = wordHash(digest, w); wh(i) = h; cache.put(w, h) }
      i += 1
    }
    // Σ_j wh[i+j]·31^(k−1−j): per-term bound p·31^(k−1) < 2^60 and sum
    // < k·2^60 ≤ 2^63 at the k ≤ 7 analysis bound — no silent long wrap,
    // and the DuckDB oracle's BIGINT mirror stays overflow-free too
    val coef = new Array[Long](k)
    coef(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { coef(j) = coef(j + 1) * 31L; j -= 1 }
    val out = new Array[Long](n - k + 1)
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, n * 2))
    var m = 0
    i = 0
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
}
