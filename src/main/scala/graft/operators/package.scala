package graft

import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.col

package object operators {
  /** THE canonical per-key event order: partition by user, order by
    * (ts, event_id). The event_id tiebreak is load-bearing — every
    * window-function oracle's determinism depends on it — so the spec
    * lives in exactly one place. */
  private[operators] def eventOrder: WindowSpec =
    Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
}
