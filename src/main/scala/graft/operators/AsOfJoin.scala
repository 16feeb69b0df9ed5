package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic time-alignment operator Spark lacks as a
  * built-in (builder brief §custom-operators). Implemented by
  * composition (preference order (a)): a keyed range join filtered to
  * `rightTime ≤ leftTime` (optionally within a tolerance) followed by a
  * per-left-row "latest wins" window. Catalyst plans the equi-key part
  * as a hash join with the range predicate applied as a join filter,
  * so cost is bounded by per-key match counts, and AQE handles skewed
  * keys; a custom SparkPlan (sort-merge with a backward scan) is the
  * escalation path if per-key fan-out ever dominates.
  */
object AsOfJoin {

  /** For each left row, attach the single right row with the same key
    * and the greatest `rightTime ≤ leftTime` (within `tolerance`, if
    * given). Left rows with no match keep nulls (left-outer
    * semantics). Ties on `rightTime` break by the descending
    * `tieBreaker` column for determinism.
    *
    * The left side must carry a unique row id (`leftId`) to window on —
    * at 100 TB a synthetic id would force a global shuffle, so the
    * caller supplies a natural unique key instead.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreaker: String,
      tolerance: Option[Column] = None,
  ): DataFrame = {
    val base = col(rightTime) <= col(leftTime)
    val cond = tolerance match {
      case Some(tol) => base && col(rightTime) >= col(leftTime) - tol
      case None      => base
    }
    val joined = left.join(right,
      col(leftKey) === col(rightKey) && cond, "left")
    val w = Window.partitionBy(col(leftId)).orderBy(
      col(rightTime).isNull, // matched rows first
      col(rightTime).desc,
      col(tieBreaker).desc,
    )
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
