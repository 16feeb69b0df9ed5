package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Record linkage / fuzzy entity resolution: find records that refer
  * to the same real-world entity despite typos or format drift, then
  * collapse each match-group to a canonical survivor.
  *
  * The reference is a registry ETL (farmer registrations keyed by
  * RSBSA number — `services/etlService.js` syncs per-person rows
  * across systems); resolving near-identical person records is the
  * natural next step of exactly that pipeline, so the engine ships it
  * as a first-class extension (the reference itself matches on exact
  * keys only).
  *
  * Scale shape — the classic ER trap is the all-pairs compare
  * (O(n²) levenshtein at 100 TB is unrunnable). Standard fix, used
  * here: BLOCKING (Fellegi–Sunter practice; see also Christen,
  * "Data Matching", 2012). Records shuffle once on a cheap
  * deterministic block key; candidate pairs exist only WITHIN a
  * block, so the compare cost is Σ|block|² — bounded by the blocking
  * scheme, not the corpus. The join is a plain equi-join on the block
  * key (hash-partitioned, AQE-splittable if a block is hot, never a
  * cartesian — plan-guarded in `PlanQualitySpec`). The edit-distance
  * filter runs with Spark's bounded `levenshtein(l, r, threshold)`
  * kernel, which early-exits scanning at `maxDist` — O(maxDist·len)
  * per pair instead of O(len²).
  *
  * Recall caveat (inherent to blocking, documented not hidden): a
  * pair whose typo lands INSIDE the block key is never compared.
  * Production schemes union several complementary block keys; the
  * operator takes the key as a `Column` so callers compose
  * `blockedPairs(df, .., key1) ∪ blockedPairs(df, .., key2)`.
  */
object Linkage {

  /** Candidate pairs within a block whose attribute edit distance is
    * ≤ `maxDist`. Emits `(a_id, b_id, a_val, b_val, dist)` with
    * `a_id < b_id` (each unordered pair once).
    */
  def blockedPairs(df: DataFrame, id: Column, attr: Column,
      block: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val rec = df.select(id.cast("long").as("__id"), attr.as("__v"),
      block.as("__blk"))
    val a = rec.as("a")
    val b = rec.as("b")
    a.join(b, col("a.__blk") === col("b.__blk") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__v").as("a_val"), col("b.__v").as("b_val"),
        // bounded kernel: -1 when the distance exceeds maxDist
        levenshtein(col("a.__v"), col("b.__v"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Full ER pipeline face: match-pairs → connected components →
    * canonical entity per record. Emits one row per record that
    * belongs to a multi-record entity: `(rec_id, entity_id, n_recs)`
    * where `entity_id` is the component minimum (the survivor) and
    * `n_recs` the entity's record count. Transitive by construction:
    * A~B, B~C groups A,B,C even when A~C exceeds `maxDist`.
    */
  def resolveEntities(df: DataFrame, id: Column, attr: Column,
      block: Column, maxDist: Int): DataFrame = {
    val pairs = blockedPairs(df, id, attr, block, maxDist)
      .select("a_id", "b_id")
    Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("rec_id"), col("component").as("entity_id"))
      .withColumn("n_recs",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("entity_id"))))
  }
}
