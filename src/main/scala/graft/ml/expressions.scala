package graft.ml

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernels referenced from generated code (same pattern as
  * text.TextUtil). Inputs are non-null ARRAY<DOUBLE> without null elements
  * (embedding columns); sums run sequentially in index order — the same
  * evaluation order as DuckDB's list_dot_product, so rounded oracle
  * results agree. */
object VecUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * Why an Expression and not the builtin `aggregate(zip_with(...))` HOF:
  * Catalyst evaluates higher-order functions interpretively (per-element
  * lambda dispatch, boxed accumulators) — measured 129 s for the LSH dedup
  * at sf0.01. A primitive-loop kernel invoked from generated code stays
  * inside WholeStageCodegen with zero per-element overhead. Beats a Scala
  * UDF too: no Seq[Double] conversion, no encoder boundary — the kernel
  * reads Tungsten's UnsafeArrayData in place. */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ml.VecUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  def dot_d(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductD(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
