package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers for Spark's Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * behind runtime join-filter pushdown, not exposed in the public
  * function registry).
  *
  * Why these and not `DataFrameStatFunctions.bloomFilter`: the stat
  * helper collects the filter eagerly via its own RDD aggregate; the
  * expressions integrate with Catalyst — the build is a partial-agg'd
  * aggregation (bit-OR merge, order-independent → deterministic bits
  * for a given input set) and the membership probe is a codegen'd
  * predicate usable inside a scan projection. */
object BloomFunctions {

  /** Aggregate a LONG column into Bloom-filter bits (binary).
    * `numBits` must stay under Spark's runtime-filter cap
    * (67,108,864 by default). */
  def bloomAgg(hashCol: Column, estItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashCol),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against CONSTANT bloom bits (Spark requires the
    * filter side to be foldable or a scalar subquery). */
  def mightContain(bloomBits: Array[Byte], hashCol: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBits), ColumnBridge.expression(hashCol)))
}
