package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.Materialize.MaterializeOps

/** Skew mitigation utilities (SURVEY.md §4 scale notes; builder brief:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * default on) splits oversized shuffle partitions at runtime and is
  * the first line of defense. Salting is the declarative fallback for
  * the cases AQE can't fix: a single hot key inside one partition
  * (AQE can split partitions, not keys), or skewed aggregations.
  */
object Skew {

  /** Salted equi-join for a skew-heavy fact side: the fact's rows get a
    * deterministic salt in [0, factor); the (small, broadcastable-ish
    * but above broadcast threshold) dim side is replicated `factor`
    * times, so each hot key's rows spread over `factor` reducers.
    * Deterministic — salt comes from xxhash64 of the whole fact row,
    * not rand(), so replays/retries see identical placement.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner",
  ): DataFrame = {
    // right/full outer would emit `factor` null-padded rows per
    // unmatched dim key (one per replica) — only fact-preserving join
    // types are sound under dim replication.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support join type $joinType " +
        "(dim side is replicated; right/full outer would duplicate rows)")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(factor))
        .cast("int"))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Expressed
    * here for the count/sum family, which re-aggregates losslessly.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      sumCol: Option[String],
      factor: Int,
  ): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val partialAggs = Seq(count(lit(1)).as("__n")) ++
      sumCol.map(c => sum(col(c)).as("__s"))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = Seq(sum(col("__n")).as("n")) ++
      sumCol.map(_ => sum(col("__s")).as("total"))
    partial.groupBy(col(key)).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Two-phase (salted) MIN for a skew-heavy key column: partial min
    * on (key, salt), final min on key — min re-aggregates losslessly,
    * so this equals a direct `groupBy(key).min` for any input
    * (property-proven in `DedupSimilaritySpec`). The salt comes from
    * `xxhash64` of the VALUE, so a hub key's rows spread over `factor`
    * reducers deterministically (replays see identical placement).
    *
    * When it matters: hash aggregation normally map-side-combines, so
    * even a hub key reaches its reducer as ≤ #map-partitions partial
    * rows — but Spark silently FALLS BACK to sort-based aggregation
    * when the hash map spills, and a sort-agg's reducer must sort the
    * hub's full row set in one task. The explicit two-phase shape
    * bounds the final aggregation's biggest key group at `factor`
    * rows BY CONSTRUCTION — a plan property (`PlanQualitySpec` pins
    * the double HashAggregate over `__salt`), not a best-effort
    * runtime behavior. (The connected-components star rounds used
    * this for their min-label reductions through round 13; round 14
    * moved them to plain map-side-combined groupBy.min — partial
    * aggregation's ≤-1-partial-row-per-map-task bound plus the
    * measured 2-exchange saving per round won there, see
    * `Dedup.connectedComponents` — this salted face remains for
    * callers that want the by-construction bound even under hash-agg
    * fallback.)
    */
  def saltedMin(
      df: DataFrame,
      key: String,
      valCol: String,
      alias: String,
      factor: Int = 32,
  ): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    df.withColumn("__salt", pmod(xxhash64(col(valCol)), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(min(col(valCol)).as("__pmin"))
      .groupBy(col(key))
      .agg(min(col("__pmin")).as(alias))
  }

  /** Range-partition a log by its offset column — the engine's
    * replacement for the reference's LIMIT/OFFSET batch loop (each
    * partition IS a batch, SURVEY.md §2.5 W2), with even sizing even
    * when log_ids are dense at one end.
    */
  def partitionByLogRange(log: DataFrame, partitions: Int): DataFrame =
    log.repartitionByRange(partitions, col("log_id"))

  /** Exact 1-based global index over a TOTAL order (`sortCols` must be
    * a unique key, or ties land nondeterministically at range-partition
    * boundaries) with NO unpartitioned window anywhere — the scale-safe
    * replacement for `row_number().over(Window.orderBy(...))`, which
    * funnels every row through one task.
    *
    * Three phases (the RDD `zipWithIndex` recipe, expressed on
    * DataFrames): `repartitionByRange` on the key (parallel range
    * sort), a per-partition `row_number` (windows PARTITIONED by
    * partition id — parallel), and per-partition counts prefix-summed
    * into offsets ON THE DRIVER (one row per shuffle partition —
    * bounded metadata even at 100k partitions, the same driver-side
    * step `RDD.zipWithIndex` performs) that ride back via a broadcast
    * equi-join. The ranked table is materialized once, so the range
    * sort + window never re-run for downstream consumers.
    *
    * Returns `(df + idxName column, total row count)` — the count is
    * free (it's the offsets' sum), and callers computing quantile
    * bands need it anyway.
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
      idxName: String): (DataFrame, Long) = {
    // the groupless special case of the per-group recipe: a constant
    // group tags every row (4 bytes/row through the range shuffle —
    // the price of ONE copy of the tricky three-phase machinery)
    require(!df.columns.contains("__ggrp"),
      "withGlobalIndex: input already has a __ggrp column")
    val (out, total) =
      perGroupIndex(df.withColumn("__ggrp", lit(0)), "__ggrp",
        sortCols, idxName)
    (out.drop("__ggrp"), total)
  }

  /** Exact 1-based PER-GROUP index — [[withGlobalIndex]] with the
    * count restarting at 1 inside each value of `groupCol` — built so
    * the parallelism is the shuffle-partition count, NEVER the group
    * count. `row_number().over(Window.partitionBy(group))` looks
    * partitioned, but with a handful of groups (curriculum stages,
    * booleans, quartile bands) it IS a global sort split |groups|
    * ways: each reducer sorts corpus/|groups| rows, and no rank
    * filter means InferWindowGroupLimit can't pre-prune.
    *
    * Same three phases, group-aware: `repartitionByRange` on
    * (group ++ sortCols) — a group's rows land on consecutive
    * partition ids, each partition holding at most a partition-sized
    * slice of any group; per-partition `row_number` partitioned by
    * (partition id, group) — parallel, each task sorting only its own
    * slice; per-(partition, group) counts (≤ partitions + groups rows
    * of metadata, since range partitioning makes groups contiguous)
    * prefix-summed per group on the driver and broadcast back. The
    * index equals the low-cardinality window's output bit-for-bit —
    * (group ++ sortCols) must be a unique key, same contract as
    * [[withGlobalIndex]].
    */
  def withPerGroupIndex(df: DataFrame, groupCol: String,
      sortCols: Seq[Column], idxName: String): DataFrame =
    perGroupIndex(df, groupCol, sortCols, idxName)._1

  /** Shared three-phase core for [[withGlobalIndex]] /
    * [[withPerGroupIndex]]; also returns the total row count (free —
    * it is the offsets' sum). The offset join is NULL-SAFE on the
    * group column (`<=>`): a NULL group is a group like any other —
    * a plain `===` would silently DROP every null-group row from the
    * result instead of indexing it.
    */
  private def perGroupIndex(df: DataFrame, groupCol: String,
      sortCols: Seq[Column], idxName: String): (DataFrame, Long) = {
    // fail loudly on temporary-name collisions: a pre-existing __pid /
    // __rn (or downstream __opid/__og/__off) would be silently
    // clobbered and dropped, corrupting caller data
    for (tmp <- Seq("__pid", "__rn", "__opid", "__og", "__off"))
      require(!df.columns.contains(tmp),
        s"perGroupIndex: input already has a $tmp column")
    val spark = df.sparkSession
    val w = org.apache.spark.sql.expressions.Window
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranked = df.repartitionByRange(parts, col(groupCol) +: sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(
        w.partitionBy(col("__pid"), col(groupCol)).orderBy(sortCols: _*))
        .cast("long"))
      .materialize()
    val counts = ranked.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__c")).collect()
    val offRows = counts.groupBy(_.get(1)).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_.getInt(0)).map { r =>
        val off = acc; acc += r.getLong(2)
        org.apache.spark.sql.Row(r.getInt(0), r.get(1), off)
      }
    }
    val total = counts.map(_.getLong(2)).sum
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__opid",
        org.apache.spark.sql.types.IntegerType),
      ranked.schema(groupCol).copy(name = "__og"),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType)))
    val offDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema))
    val out = ranked.join(offDf,
        col("__pid") === col("__opid") && col(groupCol) <=> col("__og"))
      .withColumn(idxName, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__opid", "__og", "__off")
    (out, total)
  }
}
