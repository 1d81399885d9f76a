package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(text, bits)` — fused SimHash signature: split on ' ',
  * distinct words, per-word portable 60-bit hash (first 15 hex digits of
  * md5, identical to [[graft.llm.TextOps.h60]] and the DuckDB oracle), ±1
  * bit sums, sign-packed into a long. One row in, one long out.
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
case class SimHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      // session-registered → reachable from arbitrary SQL: reject a bad
      // width at ANALYSIS time (the hash carries 60 usable bits)
      right.eval() match {
        case k: java.lang.Integer if k >= 1 && k <= 60 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_simhash bits must be an int literal in [1, 60], got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_simhash expects (string, foldable int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(t: Any, b: Any): Any =
    SimHashExpr.signature(t.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) =>
      s"${ev.value} = graft.functions.SimHashExpr.signature($t, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_simhash"
}

object SimHashExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Exact parity contract with the declarative path (and the oracle):
    * words = split(text, ' ', -1) — trailing empties KEPT, as Spark's
    * `split` with its default -1 limit does; per distinct word,
    * h = first 15 hex digits of md5 = big-endian first 8 digest bytes
    * >>> 4; bit j of the signature is set iff Σ±1 over words of
    * ((h >> j) & 1 → +1 else −1) is positive. */
  def signature(text: UTF8String, bits: Int): Long = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](Math.max(16, words.length * 2))
    val s = new Array[Int](bits)
    val digest = md5.get()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (seen.add(w)) {
        digest.reset()
        val d = digest.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var bi = 0
        while (bi < 8) { h = (h << 8) | (d(bi) & 0xffL); bi += 1 }
        h = h >>> 4 // 16 hex digits → first 15 (60 bits)
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
