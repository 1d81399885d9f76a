package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_nearest(vec, codebook)` — nearest-centroid id (argmin of squared
  * distance) of a numeric vector against a FOLDABLE codebook literal, as
  * one codegen'd primitive loop.
  *
  * Semantics are bit-identical to the composed form it replaces
  * (`array_max(array(struct(round(graft_dot(v,cᵢ)·2 − ‖cᵢ‖², 6), i)…))
  * .getField("cell")`, reference huracan's per-subspace quantizer step):
  *  - per centroid: score = round₆(2·dot(v,cᵢ) − ‖cᵢ‖²), the dot a
  *    sequential left-to-right double fold and the self-dot a sequential
  *    sum, both matching `graft_dot`/Scala `sum` fold order;
  *  - round₆ is Spark `round`'s exact double path (NaN/∞ passthrough,
  *    else BigDecimal.valueOf → setScale(6, HALF_UP));
  *  - argmax ties resolve to the LARGER centroid id (struct-max order),
  *    via nan-safe comparison (NaN compares greatest, like Spark doubles).
  *
  * Why a custom Expression (SCALE.md "Known costs", the documented fix):
  * the composed form inlines K score structs per argmax — m·K struct
  * constructions per PQ encode row — whose generated method exceeds
  * Janino's size limit, so the whole stage silently fell back to the
  * interpreted path (4 events per verify run). This loop keeps the
  * encode/assign projections inside whole-stage codegen at any (m, K):
  * the codebook rides as a reference object (a bytes-sized plan
  * parameter, the graft_dot/centroid-collect discipline), not as K
  * inlined literals.
  */
case class NearestCentroidExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => right.foldable
      case _ => false
    }
    if (vecOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest expects (array<float|double> vec, foldable " +
        s"array<array<double>> codebook), got ${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString}" +
        (if (!right.foldable) " (codebook not foldable)" else ""))
  }

  override def dataType: DataType = IntegerType

  // The codebook is a plan constant: materialize it (and its self-dots)
  // once per task, not per row. Self-dot fold order matches the composed
  // form's Scala `c.map(x => x*x).sum`.
  @transient private lazy val codebook: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    val cb = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    // the composed struct-max form returned null on an empty codebook —
    // surfacing the misuse; fabricating cell -1 silently would not
    require(cb.nonEmpty, "graft_nearest: empty codebook")
    cb
  }
  @transient private lazy val selfDots: Array[Double] =
    codebook.map { c =>
      var s = 0.0; var d = 0
      while (d < c.length) { s += c(d) * c(d); d += 1 }
      s
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    var best = -1
    var bestScore = 0.0
    var i = 0
    while (i < codebook.length) {
      val c = codebook(i)
      val n = math.min(v.numElements(), c.length)
      var dot = 0.0; var d = 0
      if (isFloat) while (d < n) { dot += v.getFloat(d).toDouble * c(d); d += 1 }
      else while (d < n) { dot += v.getDouble(d) * c(d); d += 1 }
      val score = NearestCentroidExpr.round6(dot * 2.0 - selfDots(i))
      if (best < 0 || NearestCentroidExpr.nanSafeGe(score, bestScore)) {
        bestScore = score; best = i
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    val cb = ctx.addReferenceObj("graftNearestCb", codebook, "double[][]")
    val sd = ctx.addReferenceObj("graftNearestSd", selfDots, "double[]")
    val (best, bestS, i, d, n, dot, raw, score, c) = (
      ctx.freshName("best"), ctx.freshName("bestS"), ctx.freshName("i"),
      ctx.freshName("d"), ctx.freshName("n"), ctx.freshName("dot"),
      ctx.freshName("raw"), ctx.freshName("score"), ctx.freshName("c"))
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |int $best = -1;
         |double $bestS = 0.0;
         |for (int $i = 0; $i < $cb.length; $i++) {
         |  double[] $c = $cb[$i];
         |  int $n = java.lang.Math.min($a.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double)$a.$getter($d) * $c[$d];
         |  }
         |  double $raw = $dot * 2.0 - $sd[$i];
         |  double $score = graft.functions.NearestCentroidExpr.round6($raw);
         |  if ($best < 0 ||
         |      graft.functions.NearestCentroidExpr.nanSafeGe($score, $bestS)) {
         |    $bestS = $score; $best = $i;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_nearest"
}

object NearestCentroidExpr {
  /** Spark `round(x, 6)`'s exact double semantics (MathExpressions
    * RoundBase): NaN/∞ pass through, else decimal HALF_UP at scale 6 —
    * the generated code calls THIS method via its static forwarder (so
    * interpreted and codegen paths literally share one definition). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's nan-safe double ordering (NaN compares greatest) reduced to
    * the `x >= y` case — called from the generated code via its static
    * forwarder, one definition for both paths. */
  def nanSafeGe(x: Double, y: Double): Boolean =
    java.lang.Double.isNaN(x) || (!java.lang.Double.isNaN(y) && x >= y)
}
