package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native expression for multi-dimensional data-layout keys
  * ([[graft.operators.LayoutOps]]): the Morton / z-order interleave
  * that turns two scan-predicate dimensions into ONE cluster key, so
  * parquet row-group min/max statistics prune on BOTH dimensions —
  * a single-column sort can only ever prune on its leading column.
  * Codegen'd like every other graft expression (a fallback would
  * break the write projection's whole-stage span). */
object LayoutFunctions {

  /** Bit-interleave of the low `bits` bits of two non-negative
    * longs: result bit 2i is x's bit i, bit 2i+1 is y's bit i. A
    * contiguous range of z values is a small set of axis-aligned
    * tiles — which is exactly why range-partitioning on z yields
    * files whose min/max are tight in BOTH source columns. */
  def zInterleaveJvm(x: Long, y: Long, bits: Int): Long = {
    // negatives have no grid cell: two's-complement low bits would
    // interleave -1 as the TOP cell and silently corrupt the layout —
    // the one failure this family exists to prevent. Normalize first
    // (zorderWrite does) or shift the domain.
    if (x < 0 || y < 0)
      throw new IllegalArgumentException(
        s"zvalue inputs must be non-negative grid cells, got ($x, $y)")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def zvalue(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(ZValueExpr(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}

/** Inputs must already be LongType — construct through
  * [[LayoutFunctions.zvalue]] or the SQL registration, which insert
  * explicit casts (an INT argument would otherwise ClassCastException
  * on the interpreted path — constant folding included — while
  * codegen silently widens: same query, mode-dependent behavior). */
case class ZValueExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  // a shift amount past 31 wraps mod 64 in the interleave (2·i+1 > 63)
  // and scribbles high bits over low — reject at construction, for the
  // SQL surface as well as the Scala one
  require(bits >= 1 && bits <= 31, s"zvalue bits must be in [1,31], got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    LayoutFunctions.zInterleaveJvm(
      x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.LayoutFunctions.zInterleaveJvm($x, $y, $bits);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZValueExpr =
    copy(left = l, right = r)
  override def prettyName: String = "zvalue"
}
