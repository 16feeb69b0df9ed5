package graft.operators
import graft.plans.Materialize.MaterializeOps

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
    // Join-condition economics (this runs once per CANDIDATE pair,
    // i.e. block² times): the distance test is ONE bounded-kernel
    // call — `-1 iff > max` makes `>= 0` the complete predicate — and
    // the id< dedup test is listed first as an ordering HINT (And
    // short-circuits left-to-right in generated code, though Catalyst
    // does not guarantee residual-conjunct order, so correctness and
    // the cost bound never depend on it). The surviving pairs (tiny)
    // recompute the distance once in the projection.
    a.join(b, col("a.__blk") === col("b.__blk") &&
        col("a.__id") < col("b.__id") &&
        levenshtein(col("a.__v"), col("b.__v"), maxDist) >= 0)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__v").as("a_val"), col("b.__v").as("b_val"),
        levenshtein(col("a.__v"), col("b.__v"), maxDist)
          .cast("long").as("dist"))
  }

  /** Sorted-neighborhood matching (Hernández & Stolfo 1995): order
    * records by a sort key, compare each record only with the next
    * `window − 1` records in that order. The classic complement to
    * [[blockedPairs]] — blocking fixes the compare SET, SNM fixes the
    * compare BUDGET (exactly (window−1)·n comparisons regardless of
    * how values cluster, so a degenerate mega-block cannot blow up).
    *
    * Scale shape — the textbook formulation sorts globally and slides
    * a window, which in naive Spark is ONE unpartitioned sort task.
    * Here the global index is computed scalably in two phases:
    * `repartitionByRange` on the sort key (parallel range sort), a
    * per-partition `row_number` (windows partitioned by partition id
    * — parallel), and per-partition counts prefix-summed into offsets
    * (one window over #partitions rows — driver-scale metadata, not
    * data). Neighbor pairs then come from an EQUI-join: each record
    * emits `window − 1` index probes (`idx+1 … idx+window−1`) and
    * joins them against the index — bounded fan-out, hash-partitioned,
    * AQE-splittable; no sliding state anywhere.
    *
    * Emits `(a_id, b_id, a_val, b_val, dist)` like [[blockedPairs]]
    * (a before b in sort order, each pair once).
    */
  def sortedNeighborPairs(df: DataFrame, id: Column, attr: Column,
      sortKey: Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    require(maxDist >= 0, "maxDist must be >= 0")
    val rec = df.select(id.cast("long").as("__id"), attr.as("__v"),
      sortKey.as("__k"))
    // exact global index via the shared two-phase helper (range
    // partition → per-partition row_number → broadcast driver-summed
    // offsets — Skew.withGlobalIndex); the indexed table feeds BOTH
    // sides of the neighbor equi-join, so materialize it once
    val (indexed, _) = Skew.withGlobalIndex(rec,
      Seq(col("__k"), col("__id")), "__idx")
    val idx = indexed.select(col("__id"), col("__v"), col("__idx"))
      .materialize()
    val probes = idx.select(col("__id").as("a_id"), col("__v").as("a_val"),
      explode(sequence(col("__idx") + 1, col("__idx") + (window - 1)))
        .as("__idx2"))
    // Same join-condition economics as [[blockedPairs]]: the bounded
    // kernel's `-1 iff > max` contract makes `>= 0` the complete
    // distance predicate, evaluated ONCE per window pair as the hash
    // join's residual condition; the few survivors recompute it in
    // the projection.
    val b = idx.select(col("__id").as("b_id"), col("__v").as("b_val"),
      col("__idx").as("__idx2"))
    probes.join(b, probes("__idx2") === b("__idx2") &&
        levenshtein(col("a_val"), col("b_val"), maxDist) >= 0)
      .select(col("a_id"), col("b_id"), col("a_val"), col("b_val"),
        levenshtein(col("a_val"), col("b_val"), maxDist)
          .cast("long").as("dist"))
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
