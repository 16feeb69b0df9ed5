package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the classic time-alignment operator Spark lacks as a
  * built-in (builder brief §custom-operators). Implemented by
  * composition (preference order (a)) as a **union + running-last
  * window**: tag both sides, union them, and for every left row take
  * `last(right_payload, ignoreNulls)` over the per-key event sequence
  * ordered by time (right rows sorted before left rows at equal
  * timestamps, so `rightTime ≤ leftTime` is inclusive).
  *
  * Scale shape: ONE shuffle on the key and a linear per-key sort —
  * there is no join, so there is no per-key fan-out at all. The
  * round-1/2 formulation (keyed range join + latest-wins window)
  * materialized |L_k|·|R_k| rows for every hot key before trimming;
  * a time-bucketed join bounds that only when a tolerance exists,
  * while the union-window form is exact for the unbounded case too.
  * The range-join form is kept as the semantic baseline the window
  * form is unit-tested against ([[asOfViaRangeJoin]]).
  */
object AsOfJoin {

  /** For each left row, attach the single right row with the same key
    * and the greatest `rightTime ≤ leftTime` (within `tolerance`, if
    * given). Left rows with no match keep nulls (left-outer
    * semantics). Ties on `rightTime` break by the descending
    * `tieBreaker` column for determinism.
    *
    * `leftTime` and `rightTime` must have union-compatible types
    * (cast beforehand); right rows with a null `rightTime` never
    * match, left rows with a null `leftTime` surface unmatched.
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
    val lPayload = StructType(left.schema.fields)
    val rPayload = StructType(right.schema.fields)
    val tbType = right.schema(tieBreaker).dataType
    // null-key right rows can never match under equi-join semantics
    // (NULL = NULL is not true) — exclude them so the window's
    // null-key partition contains only left rows, which then surface
    // unmatched exactly like the join baseline.
    val r = right
      .filter(col(rightTime).isNotNull && col(rightKey).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        col(tieBreaker).as("__tb"), lit(1).as("__isR"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("__r"),
        lit(null).cast(lPayload).as("__l"))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(null).cast(tbType).as("__tb"), lit(0).as("__isR"),
      lit(null).cast(rPayload).as("__r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
    // Order: time asc (nulls first → null-time left rows match
    // nothing), right-before-left at equal time (inclusive ≤), and
    // tieBreaker asc so the LAST preceding right row at the winning
    // time is the max-tieBreaker one — same winner as the baseline's
    // `ORDER BY rightTime DESC, tieBreaker DESC ... rn = 1`.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isR").desc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("__m",
        when(col(s"__m.$rightTime") >= col("__t") - tol, col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        right.columns.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** The round-1 formulation — keyed range join + latest-wins window.
    * O(|L_k|·|R_k|) intermediate rows per key; kept ONLY as the
    * semantic baseline for the equivalence/stress tests.
    */
  private[graft] def asOfViaRangeJoin(
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

  /** Point-in-time (SCD2) lookup join: attach to each fact row the
    * dimension VERSION that was valid at the fact's timestamp —
    * `fact.key = dim.key AND valid_from <= ts AND (ts < valid_to OR
    * valid_to IS NULL)`. The warehouse staple [[asOf]] is NOT: as-of
    * picks the nearest preceding event (needs a per-row argmax);
    * a well-formed SCD2 history has half-open, non-overlapping
    * validity windows, so the range predicate alone selects AT MOST
    * ONE version per fact row — no window, no argmax, no
    * post-aggregation.
    *
    * Shape at scale: a plain equi hash/sort-merge join on the KEY
    * with the validity range as a residual filter — the join
    * partitions by key exactly like any fact⋈dim join; nothing about
    * the temporal predicate changes the shuffle. (Contrast a keyless
    * range join, which needs binning — see `IntervalJoin`.)
    *
    * `fact` and `dim` must not share column names apart from the join
    * key being compared (`factKey`/`dimKey` may differ). Inner join:
    * facts before their key's first version drop.
    */
  def pointInTime(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      factTime: String, validFrom: String, validTo: String): DataFrame =
    fact.join(dim,
      col(factKey) === col(dimKey) &&
        col(validFrom) <= col(factTime) &&
        (col(factTime) < col(validTo) || col(validTo).isNull))
}
