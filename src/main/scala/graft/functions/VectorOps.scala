package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused ordered vector folds as native codegen'd Catalyst expressions
  * (SURVEY §2.10).
  *
  * The composable form — `aggregate(zip_with(a, b, …), 0.0, +)` — is
  * semantically right but runs INTERPRETED: Spark's higher-order
  * functions have no `doGenCode`, so every (row, centroid) distance in
  * the ANN/k-means/PQ hot paths paid a lambda dispatch per element plus
  * an intermediate `zip_with` array allocation per pair. These
  * expressions keep the EXACT same IEEE op sequence — left-to-right
  * fold seeded at 0.0, one multiply(+subtract) per element — inside
  * WholeStageCodegen: one fused loop over the two `ArrayData`, no
  * intermediate array, no virtual calls.
  *
  * Null semantics match the composable form exactly: null array → null;
  * length mismatch → null (`zip_with` pads with null, which poisons the
  * fold); any null element → null.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one element's contribution, given double operands. */
  protected def termJava(x: String, y: String): String
  /** One element's contribution, interpreted path. */
  protected def termEval(x: Double, y: Double): Double

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects two array<float|double>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val (xd, yd) = (elemIsDouble(left), elemIsDouble(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xe = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val ye = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += termEval(xe, ye)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val getX = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val getY = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val xe = ctx.freshName("xe")
      val ye = ctx.freshName("ye")
      s"""
        final int $n = $a.numElements();
        boolean $bad = ($b.numElements() != $n);
        double $acc = 0.0;
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            final double $xe = (double) $a.$getX($i);
            final double $ye = (double) $b.$getY($i);
            $acc += ${termJava(xe, ye)};
          }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
      """
    })
  }
}

/** Σ aᵢ·bᵢ, left-to-right from 0.0 — bit-identical to
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
  */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecDot = copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)², left-to-right from 0.0 — bit-identical to the
  * `zip_with` squared-difference fold.
  */
case class VecSqDist(left: Expression, right: Expression) extends VecFold {
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecSqDist = copy(left = l, right = r)
}

object VectorOps {
  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))
  def vecSqDist(a: Column, b: Column): Column =
    ColumnShim.column(VecSqDist(ColumnShim.expression(a), ColumnShim.expression(b)))
}
