package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the embedding hot path — the
  * implementations behind [[VectorFunctions.quantize]] / `dotL` /
  * `norm2`.
  *
  * The declarative forms (`transform`/`zip_with`/`aggregate`) are
  * INTERPRETED higher-order functions — ~128 lambda invocations per
  * 64-dim dot product, which dominates every ANN / embedding-dedup
  * query (NOTES.md measured ~50× penalty vs a JVM loop). These
  * expressions keep the exact integer semantics of the HOF forms
  * (and of the DuckDB oracles) while running one tight primitive
  * loop per row. All are one-pass, null-intolerant, and evaluated
  * inside the scan/join projections — no change to plan shape.
  */
object VectorExprs {

  /** e3 fixed-point quantization: round(x*1000) HALF_UP per element —
    * identical to `transform(emb, x -> round(x*1000, 0))` and the
    * oracle's `list_transform(..., round(x*1000))`. */
  def quantizeE3(emb: Column): Column =
    ColumnBridge.column(QuantizeE3Expr(ColumnBridge.expression(emb)))

  /** Integer dot product of two array<long> columns. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Integer squared norm of an array<long> column. */
  def norm2Long(a: Column): Column =
    ColumnBridge.column(Norm2LongExpr(ColumnBridge.expression(a)))
}

case class QuantizeE3Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val elemIsDouble =
    child.dataType.asInstanceOf[ArrayType].elementType ==
      org.apache.spark.sql.types.DoubleType
  override def nullSafeEval(emb: Any): Any = {
    val a = emb.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (elemIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      out(i) = VectorFunctions.roundHalfUp(x * 1000)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): QuantizeE3Expr =
    copy(child = c)
  override def prettyName: String = "quantize_e3"
}

case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData].toLongArray()
    val bb = b.asInstanceOf[ArrayData].toLongArray()
    // zip_with pads the shorter array with nulls and null*x sums to
    // null — mismatched lengths yield NULL, never a truncated dot
    if (aa.length != bb.length) return null
    var dot = 0L
    var i = 0
    while (i < aa.length) { dot += aa(i) * bb(i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotLongExpr = copy(left = l, right = r)
  override def prettyName: String = "dot_long"
}

case class Norm2LongExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = {
    val aa = a.asInstanceOf[ArrayData].toLongArray()
    var n2 = 0L
    var i = 0
    while (i < aa.length) { n2 += aa(i) * aa(i); i += 1 }
    n2
  }
  override protected def withNewChildInternal(c: Expression): Norm2LongExpr =
    copy(child = c)
  override def prettyName: String = "norm2_long"
}
