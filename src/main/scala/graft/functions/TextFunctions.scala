package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Codegen-friendly text primitives (SURVEY.md §2.7).
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (higher-order array functions + md5), so the whole text pipeline
  * stays inside whole-stage codegen — no UDF serialization cost, and
  * the expressions are visible to Catalyst for pruning/pushdown. The
  * only hash used is md5, which is bit-identical across engines
  * (the cross-engine determinism contract, SURVEY.md §4).
  */
object TextFunctions {

  /** 60-bit non-negative hash: first 15 hex chars of md5 as a LONG.
    * 15 hex digits < 2^60 always fits BIGINT; identical in DuckDB via
    * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** hash60 in SQL form, for oracle strings. */
  def hash60Sql(inner: String): String =
    s"CAST(concat('0x', substr(md5($inner),1,15)) AS BIGINT)"

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct word n-grams joined with single spaces. Empty array when
    * the doc has fewer than n tokens (guards `sequence`, which would
    * otherwise generate a descending range). */
  def ngrams(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      array_distinct(transform(sequence(lit(1), size(tk) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + lit(o))): _*))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Count of tokens that appear in a marker set (with multiplicity) —
    * the n-gram-heuristic language-ID building block. */
  def markerHits(tk: Column, markers: Seq[String]): Column =
    size(filter(tk, t => t.isin(markers.map(m => m: Any): _*))).cast(LongType)

  /** English/German/French stopword markers for the language-ID
    * heuristic. Short, high-frequency function words. */
  val enMarkers = Seq("the", "a", "of", "and", "is", "to", "in")
  val deMarkers = Seq("der", "die", "das", "und", "ist", "ein")
  val frMarkers = Seq("le", "la", "les", "et", "est", "un", "une")
}
