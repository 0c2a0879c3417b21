package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels (SURVEY §2.12 U4, §4.2 "custom
  * Expressions — the one place a custom expression genuinely pays").
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) are correct
  * but interpret a lambda per element and fall out of whole-stage codegen;
  * these expressions compile to a tight primitive loop over the unsafe array
  * data instead — the hot kernel of every n²-pair similarity stage.
  *
  * Accumulation is Double in array order, matching the HOF fold
  * bit-for-bit, so swapping implementations cannot change oracle results.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs array<float|double>, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) {
          acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
        }
      case (DoubleType, DoubleType) =>
        while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
      case _ => throw new IllegalStateException("unreachable")
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm as a native loop (companion kernel to [[VectorDot]]). */
case class VectorNormSq(child: Expression) extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_norm_sq needs array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    elemType match {
      case FloatType =>
        while (i < n) {
          val x = a.getFloat(i).toDouble; acc += x * x; i += 1
        }
      case _ =>
        while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, i)};
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNormSq =
    copy(child = newChild)
}
