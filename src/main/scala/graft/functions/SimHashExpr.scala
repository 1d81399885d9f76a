package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(text, bits[, algo])` — fused SimHash signature: split on
  * ' ', distinct words, per-word hash, ±1 bit sums, sign-packed into a
  * long. One row in, one long out.
  *
  * `algo` selects the word hash (analysis-time constant, compiled into
  * the generated code — see [[ShinglesExpr]] for the same seam on the
  * shingle kernel):
  *  - `'md5'` (default): first 15 hex digits of md5, identical to
  *    [[graft.llm.TextOps.h60]] and the DuckDB oracle — 60 usable bits,
  *    so `bits` ≤ 60 (the d3b QUERY further restricts itself to ≤ 53 for
  *    the oracle's exact pow(2,b) mirror).
  *  - `'xxh64'`: Spark's XXH64 at the built-in seed — the production
  *    hash; all 64 hash bits are usable, so `bits` extends to 64 (the
  *    width the d3b scaladoc promises the production swap unlocks).
  *
  * Why a custom Expression (same rationale as graft_minhash): the
  * DataFrame formulation explodes (doc × distinct-word) rows — a ~100-500×
  * row inflation — then runs a `bits`-column conditional aggregation and a
  * shuffle just to reassemble per-doc sums. This computes the whole
  * signature in one tight loop per document inside whole-stage codegen:
  * no explode, no aggregation, no shuffle; the signature stage becomes a
  * narrow map. The heavy body lives in a static method invoked from the
  * generated code (the StaticInvoke pattern — md5 needs MessageDigest
  * state, which is thread-local, not worth inlining as Java source). */
case class SimHashExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  def this(text: Expression, bits: Expression) = this(text, bits, Literal("md5"))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, IntegerType, _: StringType)
          if second.foldable && third.foldable =>
        // session-registered → reachable from arbitrary SQL: reject a bad
        // width or algo at ANALYSIS time
        (second.eval(), third.eval()) match {
          case (_, a: UTF8String) if ShinglesExpr.algoCode(a.toString) < 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"graft_simhash algo must be 'md5' or 'xxh64', got $a")
          case (k: java.lang.Integer, a: UTF8String) =>
            val max = if (ShinglesExpr.algoCode(a.toString) == ShinglesExpr.Xxh64) 64 else 60
            if (k >= 1 && k <= max) TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"graft_simhash bits must be an int literal in [1, $max] for algo $a, got $k")
          case other => TypeCheckResult.TypeCheckFailure(
            s"graft_simhash got non-literal arguments $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_simhash expects (string, foldable int[, foldable string]), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          third.dataType.catalogString)
    }

  override def dataType: DataType = LongType

  private lazy val algo: Int =
    ShinglesExpr.algoCode(third.eval().asInstanceOf[UTF8String].toString)

  override protected def nullSafeEval(t: Any, b: Any, a: Any): Any =
    SimHashExpr.signature(t.asInstanceOf[UTF8String], b.asInstanceOf[Int], algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b, _) =>
      s"${ev.value} = graft.functions.SimHashExpr.signature($t, $b, $algo);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_simhash"
}

object SimHashExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Exact parity contract with the declarative path (and the oracle):
    * words = split(text, ' ', -1) — trailing empties KEPT, as Spark's
    * `split` with its default -1 limit does; per distinct word, md5 →
    * h = first 15 hex digits = big-endian first 8 digest bytes >>> 4
    * (xxh64 → the full 64-bit hash); bit j of the signature is set iff
    * Σ±1 over words of ((h >> j) & 1 → +1 else −1) is positive. */
  def signature(text: UTF8String, bits: Int, algo: Int): Long = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](Math.max(16, words.length * 2))
    val s = new Array[Int](bits)
    val digest = if (algo == ShinglesExpr.Md5) md5.get() else null
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (seen.add(w)) {
        val h =
          if (algo == ShinglesExpr.Md5) {
            digest.reset()
            val d = digest.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var acc = 0L
            var bi = 0
            while (bi < 8) { acc = (acc << 8) | (d(bi) & 0xffL); bi += 1 }
            acc >>> 4 // 16 hex digits → first 15 (60 bits)
          } else
            XxHash64Function.hash(UTF8String.fromString(w), StringType, 42L)
        var j = 0
        while (j < bits) {
          s(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      wi += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (s(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
