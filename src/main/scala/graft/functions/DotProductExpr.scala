package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(a, b)` — codegen'd dot product over two numeric arrays
  * (float or double elements), computed in double with a sequential
  * left-to-right loop (same fold order as `aggregate(zip_with(...))`, so
  * results are bit-identical to the built-in-function formulation and to
  * the DuckDB oracle's list ops).
  *
  * Why a custom Catalyst Expression (SURVEY §4 stretch item): Spark's
  * higher-order functions (`aggregate`/`zip_with`) evaluate their lambda
  * per element in interpreted mode — for a 64-dim embedding that is ~128
  * boxed lambda calls per row, which dominated the similarity operators'
  * profile. This expression stays inside whole-stage codegen: one tight
  * primitive loop, no allocation. Assumes non-null array elements (enforced
  * by the embeddings schema).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float>/array<double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      case _ =>
        while (i < n) {
          val xv = if (elemType(left) == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
          val yv = if (elemType(right) == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
          s += xv * yv; i += 1
        }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression) =
      if (elemType(e) == FloatType) "getFloat" else "getDouble"
    val (ga, gb) = (getter(left), getter(right))
    // fresh identifiers: multiple graft_dot calls in one codegen scope
    // (every cosine computes three) must not collide on local names
    val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.$ga($i) * (double)$b.$gb($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Session-level registration for the engine's custom expressions. Safe to
  * call repeatedly; ops call it on their input's session so any session
  * (including the driver's) gets the function on first use. */
object GraftFunctions {
  private val dotBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
    DotProductExpr(exprs.head, exprs(1))
  }

  private val minhashBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "graft_minhash takes exactly 2 arguments")
    MinHashExpr(exprs.head, exprs(1))
  }

  private val simhashBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2 || exprs.length == 3,
      "graft_simhash takes 2 or 3 arguments (text, bits[, algo])")
    if (exprs.length == 2) new SimHashExpr(exprs.head, exprs(1))
    else SimHashExpr(exprs.head, exprs(1), exprs(2))
  }

  private val shinglesBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2 || exprs.length == 3,
      "graft_shingles takes 2 or 3 arguments (text, k[, algo])")
    if (exprs.length == 2) new ShinglesExpr(exprs.head, exprs(1))
    else ShinglesExpr(exprs.head, exprs(1), exprs(2))
  }

  private val posShinglesBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2 || exprs.length == 3,
      "graft_pos_shingles takes 2 or 3 arguments (text, k[, algo])")
    if (exprs.length == 2) new PosShinglesExpr(exprs.head, exprs(1))
    else PosShinglesExpr(exprs.head, exprs(1), exprs(2))
  }

  private val nearestBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "graft_nearest takes exactly 2 arguments")
    NearestCentroidExpr(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", shinglesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pos_shingles", posShinglesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest", nearestBuilder, "built-in")
  }

  /** For SparkSessionExtensions.injectFunction (see
    * [[graft.plans.GraftExtensions]]). */
  val dotFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductExpr].getCanonicalName, "graft_dot"),
      dotBuilder)

  val minhashFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashExpr].getCanonicalName, "graft_minhash"),
      minhashBuilder)

  val simhashFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHashExpr].getCanonicalName, "graft_simhash"),
      simhashBuilder)

  val shinglesFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShinglesExpr].getCanonicalName, "graft_shingles"),
      shinglesBuilder)

  val posShinglesFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pos_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PosShinglesExpr].getCanonicalName, "graft_pos_shingles"),
      posShinglesBuilder)

  val nearestFunctionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nearest"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NearestCentroidExpr].getCanonicalName, "graft_nearest"),
      nearestBuilder)
}
