package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_minhash(sh_arr, numPerms)` — codegen'd MinHash signature over a
  * per-document shingle-hash array: out[i] = min over h of
  * ((2i+3)·h + 7i+1) mod p, p = 1000000007 (same permutation family and
  * fold semantics as the `aggregate`/`transform` HOF formulation in
  * [[graft.llm.DedupOps]], bit-identical output, and mirrored by the
  * DuckDB oracle's list_transform/list_min form).
  *
  * Why a custom Expression (SURVEY §4 stretch, same rationale as
  * graft_dot): the HOF formulation is CodegenFallback — per shingle it
  * allocates a fresh numPerms-element accumulator array and makes 2·perms
  * boxed lambda calls. This stays inside whole-stage codegen as one tight
  * primitive double loop with a single output allocation per row. */
case class MinHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      // the function is session-registered, so an arbitrary SQL caller can
      // reach it: reject a non-positive perm count at ANALYSIS time rather
      // than throwing NegativeArraySizeException on executors
      right.eval() match {
        case k: java.lang.Integer if k > 0 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_minhash numPerms must be a positive int literal, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash expects (array<bigint>, foldable int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Int]
    val mins = Array.fill(k)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // null slots are skipped (a null shingle is no shingle) — the input
      // schema may carry containsNull=true even when no nulls occur
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = ((2L * j + 3L) * h + 7L * j + 1L) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh identifiers: two graft_minhash calls can land in one codegen
    // scope, where fixed names would collide into a Janino compile error
    // (and a silent interpreted fallback)
    val (n, k, mins, i, h, j, v) = (ctx.freshName("n"), ctx.freshName("k"),
      ctx.freshName("mins"), ctx.freshName("i"), ctx.freshName("h"),
      ctx.freshName("j"), ctx.freshName("v"))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = $a.numElements();
         |int $k = $b;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${P}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ((2L * $j + 3L) * $h + 7L * $j + 1L) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_minhash"
}
