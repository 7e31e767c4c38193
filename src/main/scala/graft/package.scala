import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object graft {
  /** `$"name"` → Column, without needing a session's implicits in
    * scope (operator builders are session-agnostic). */
  implicit class ColumnInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
