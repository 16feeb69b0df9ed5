package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Item co-occurrence (market-basket pair counting): how often two
  * items appear in the same basket. The bipartite-projection primitive
  * behind "bought together", co-viewed graphs, and item-similarity
  * features.
  *
  * The reference has no basket operator; this extends the engine's
  * analytics family the same way the funnel/cohort queries do.
  *
  * Scale shape — the quadratic risk is the BASKET, not the corpus:
  * pair expansion is |basket|² per basket, and one pathological
  * basket (a crawler's cart with 100k items) would emit 5×10⁹ pairs
  * from a single group. So baskets are capped FIRST, inside the
  * per-basket aggregate (sorted, deterministic prefix of `cap`
  * items), which bounds the fan-out at cap²/2 per basket — a
  * constant. The expansion itself is doc-local (`transform` over the
  * collected array — no self-join, so the basket table shuffles
  * once); pair counts are map-side-combined onto (item, item) keys.
  */
object Cooccur {

  /** Per-basket capped pair counts: distinct items per basket, sorted
    * ascending, truncated to `cap`, expanded to ordered pairs
    * (a < b), counted corpus-wide. Emits (item_a, item_b, n).
    */
  def pairCounts(df: DataFrame, basket: Column, item: Column,
      cap: Int = 32): DataFrame = {
    require(cap >= 2, "cap must be >= 2")
    val arr = df.groupBy(basket.as("__b"))
      .agg(slice(array_sort(collect_set(item)), 1, cap).as("__items"))
    arr.select(explode(expr(
        """flatten(transform(__items, (x, i) ->
          |  transform(slice(__items, i + 2, size(__items)),
          |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin))
        .as("__p"))
      .select(col("__p.item_a"), col("__p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n"))
  }
}
