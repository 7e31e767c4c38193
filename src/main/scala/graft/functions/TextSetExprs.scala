package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native set-membership counting over string arrays — the
  * implementation behind [[TextFunctions.markerHits]].
  *
  * The declarative form `size(filter(tk, t -> t.isin(markers)))` is an
  * INTERPRETED higher-order function (a lambda invocation per token —
  * the NOTES.md ~16 µs/lambda class) sitting in the per-document hot
  * path of language ID, quality scoring, and curation. This expression
  * keeps the exact semantics (count WITH multiplicity, nulls never
  * match) as one hash-set probe per token, and ships real `doGenCode`
  * so the text projections stay inside whole-stage codegen
  * (`CollapseCodegenStages` refuses WSCG for any node holding a
  * `CodegenFallback`). */
object TextSetExprs {

  /** Count of elements of `tk` (array<string>) present in `markers`,
    * with multiplicity. */
  def countInSet(tk: Column, markers: Seq[String]): Column =
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(tk), markers))

  /** Occurrence count of the most frequent element of `tk`
    * (array<string>); 0 for an empty array — the Gopher-style
    * repetition signal's kernel. */
  def maxTokenCount(tk: Column): Column =
    ColumnBridge.column(MaxTokenCountExpr(ColumnBridge.expression(tk)))

  /** Σ count² over the distinct elements of `tk` (array<string>) —
    * the Simpson-diversity kernel: P(two sampled tokens equal) =
    * Σc²/n². 0 for an empty array. One hash-map pass per document,
    * same narrow codegen'd shape as [[maxTokenCount]]. */
  def sumSqTokenCounts(tk: Column): Column =
    ColumnBridge.column(SumSqTokenCountsExpr(ColumnBridge.expression(tk)))

  /** Every unordered pair of DISTINCT values of a long-id array as
    * array<struct<doc_a, doc_b>> with doc_a < doc_b strictly (equal
    * ids emit nothing, matching the replaced form's filter) — the
    * candidate-pair expansion inside every bucket-grouped pair
    * generator (MinHash band buckets, n-gram prefix buckets). The
    * declarative form (`filter(flatten(transform(ids, a ->
    * transform(ids, b -> ...))))`) allocates n² structs through three
    * interpreted lambdas and discards half; this emits exactly C(n,2)
    * pairs in one codegen'd pass. Bucket sizes are df-/collision-
    * bounded by construction, so the output array stays small. */
  def orderedPairs(ids: Column): Column =
    ColumnBridge.column(OrderedPairsExpr(
      ColumnBridge.expression(ids.cast("array<bigint>"))))

  /** r14 fusion of dedupNgram's packed candidate-pair stage (guide §4:
    * kill per-row allocation in the hot path). Semantically identical
    * to the chain it replaces —
    * `explode(orderedPairs(ids))` → size-compatibility filter →
    * re-pack both sides into one agg key — but emits the final packed
    * longs directly as one primitive array per bucket, where the old
    * chain allocated a struct row per candidate pair (2 boxed longs +
    * a GenericInternalRow each) just to unpack, filter, and re-pack it
    * in the next two operators. Inputs are pids = doc_id·packN + size
    * (non-negative by the caller's scan guard); for each unordered
    * pair with pidA < pidB it emits
    * `((docA·32 + min(sa,31)) << 32) | (docB·32 + min(sb,31))`
    * iff max(sa,sb) ≤ 2·min(sa,sb), exactly the old pipeline's
    * arithmetic. */
  def packedCandPairs(ids: Column, packN: Long): Column =
    ColumnBridge.column(PackedCandPairsExpr(
      ColumnBridge.expression(ids.cast("array<bigint>")), packN))

  def packedCandPairsData(ids: ArrayData, packN: Long): ArrayData = {
    val n = ids.numElements()
    val cap = java.lang.Math.toIntExact(n.toLong * (n - 1) / 2)
    val out = new Array[Long](cap)
    var k = 0
    var i = 0
    while (i < n) {
      // NULL slots emit nothing (same contract as orderedPairs)
      if (!ids.isNullAt(i)) {
        val a = ids.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!ids.isNullAt(j)) {
            val b = ids.getLong(j)
            if (a != b) {
              val lo = if (a < b) a else b
              val hi = if (a < b) b else a
              val sa = lo % packN
              val sb = hi % packN
              val mx = if (sa > sb) sa else sb
              val mn = if (sa > sb) sb else sa
              if (mx <= mn * 2) {
                out(k) = (((lo / packN) * 32L +
                    (if (sa < 31L) sa else 31L)) << 32) |
                  ((hi / packN) * 32L + (if (sb < 31L) sb else 31L))
                k += 1
              }
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      if (k == cap) out else java.util.Arrays.copyOf(out, k))
  }

  // codegen kernels (static forwarders; called from generated Java and
  // the interpreted eval paths)
  def orderedPairsData(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    // fail loudly on an array big enough to overflow C(n,2) in Int —
    // bucket inputs are df-/collision-bounded, so this only fires on
    // misuse of the SQL function
    val cap = java.lang.Math.toIntExact(n.toLong * (n - 1) / 2)
    val out = new Array[Any](cap)
    var k = 0
    var i = 0
    while (i < n) {
      // NULL slots emit nothing — the replaced declarative form's
      // `null < x` predicate dropped them; reading them as getLong's
      // default 0 would fabricate phantom doc-0 pairs
      if (!ids.isNullAt(i)) {
        val a = ids.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!ids.isNullAt(j)) {
            val b = ids.getLong(j)
            // strict: equal ids emit nothing (the replaced declarative
            // form's `doc_a < doc_b` filter — a duplicate id in a bucket
            // must not become a Jaccard-1 self-edge downstream)
            if (a != b) {
              out(k) =
                if (a < b) new GenericInternalRow(Array[Any](a, b))
                else new GenericInternalRow(Array[Any](b, a))
              k += 1
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(if (k == cap) out else out.slice(0, k))
  }

  def countInSetData(a: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = a.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  def maxTokenCountData(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val c = counts.merge(s, 1, (x, y) => x + y)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }

  def sumSqTokenCountsData(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) counts.merge(a.getUTF8String(i), 1, (x, y) => x + y)
      i += 1
    }
    var ssq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; ssq += c * c }
    ssq
  }
}

/** Input must already be array<bigint> — construct through
  * [[TextSetExprs.orderedPairs]] or the SQL registration, which
  * insert an explicit cast (an int-element array would otherwise
  * fail `getLong` on the interpreted path while codegen widens:
  * mode-dependent behavior on the SQL surface). */
case class OrderedPairsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(a: Any): Any =
    TextSetExprs.orderedPairsData(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSetExprs.orderedPairsData($c);")
  override protected def withNewChildInternal(c: Expression): OrderedPairsExpr =
    copy(child = c)
  override def prettyName: String = "ordered_pairs"
}

/** [[TextSetExprs.packedCandPairs]] — input must already be
  * array<bigint> of non-negative packed pids (the construction helper
  * inserts the cast; dedupNgram's scan-time guard enforces the
  * domain). */
case class PackedCandPairsExpr(child: Expression, packN: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    TextSetExprs.packedCandPairsData(a.asInstanceOf[ArrayData], packN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSetExprs.packedCandPairsData($c, ${packN}L);")
  override protected def withNewChildInternal(c: Expression): PackedCandPairsExpr =
    copy(child = c)
  override def prettyName: String = "packed_cand_pairs"
}

case class CountInSetExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  // rebuilt per JVM after serialization; UTF8String equality is
  // byte-wise, matching Spark's string semantics for isin
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }
  override def nullSafeEval(a: Any): Any =
    TextSetExprs.countInSetData(a.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSetExprs.countInSetData($c, $setRef);")
  }
  override protected def withNewChildInternal(c: Expression): CountInSetExpr =
    copy(child = c)
  override def prettyName: String = "count_in_set"
}

case class MaxTokenCountExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    TextSetExprs.maxTokenCountData(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSetExprs.maxTokenCountData($c);")
  override protected def withNewChildInternal(c: Expression): MaxTokenCountExpr =
    copy(child = c)
  override def prettyName: String = "max_token_count"
}

case class SumSqTokenCountsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    TextSetExprs.sumSqTokenCountsData(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSetExprs.sumSqTokenCountsData($c);")
  override protected def withNewChildInternal(c: Expression): SumSqTokenCountsExpr =
    copy(child = c)
  override def prettyName: String = "sum_sq_token_counts"
}
