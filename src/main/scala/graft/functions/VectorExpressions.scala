package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation of a dot product
  * (`aggregate(zip_with(a,b,*),0,+)`) evaluates its lambda interpreted,
  * one element at a time — fine for a few thousand rows, hopeless for
  * the O(n·k) inner loop of similarity search at scale. These are tight
  * codegen'd loops over the array data, usable from whole-stage
  * codegen.
  */
object VectorExpressions {

  private def getter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(s"vec op on array<$t>")
    }

  private def read(x: ArrayData, g: String, i: Int): Double =
    if (g == "getFloat") x.getFloat(i).toDouble else x.getDouble(i)

  /** Σ aᵢ·bᵢ over two float/double arrays (shorter length wins).
    * Element types are read natively — no array-wide cast copy per row,
    * which matters when the same vector participates in thousands of
    * pair comparisons. */
  case class ArrayDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes() = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got ${left.dataType}, ${right.dataType}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val (gx, gy) = (getter(left), getter(right))
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += read(x, gx, i) * read(y, gy, i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}_s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}_s += (double) $a.${getter(left)}($i) * (double) $b.${getter(right)}($i);
           |}
           |${ev.value} = ${ev.value}_s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ aᵢ² — squared L2 norm, same codegen shape. */
  case class ArrayNormSq(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def checkInputDataTypes() = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_norm_sq expects array<float|double>, got $t")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm_sq"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val g = getter(child)
      var s = 0.0
      var i = 0
      while (i < x.numElements()) { val v = read(x, g, i); s += v * v; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        s"""
           |double ${ev.value}_s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double v = (double) $a.${getter(child)}($i);
           |  ${ev.value}_s += v * v;
           |}
           |${ev.value} = ${ev.value}_s;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: codegen'd dot product (inputs auto-cast to
    * array<double>). */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_norm_sq(a: Column): Column =
    ColumnBridge.column(ArrayNormSq(ColumnBridge.expression(a)))

  /** make vec_dot / vec_norm_sq available to spark.sql(...) texts. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "vec_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))
    ColumnBridge.registerFunction(spark, "vec_norm_sq",
      exprs => ArrayNormSq(exprs.head))
  }
}
