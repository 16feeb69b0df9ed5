package graft.operators
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics beyond connected components (which lives
  * with the dedup family — `Dedup.connectedComponents`). First
  * resident: PageRank (Brin & Page 1998) in EXACT integer arithmetic.
  *
  * Why integer: floating-point PageRank is order-sensitive (the
  * incoming-contribution sum changes with partitioning), so no two
  * engines — or two RUNS — agree bit-for-bit. Scaling ranks to
  * integer units (`r0` per node) and flooring every division makes
  * each iteration a pure function of the edge set: Spark and the
  * DuckDB oracle unroll to identical BIGINTs, and re-runs are
  * reproducible regardless of shuffle order (sums of integers
  * commute).
  *
  * Scale shape: the edge list joins its out-degree ONCE up front and
  * persists hash-partitioned on `src`; each iteration is then one
  * shuffle of the O(nodes) rank table to the edge partitioning plus a
  * map-side-combined sum onto `dst` — cost per iteration O(edges)
  * with no growing state. Rank lineage is truncated with a
  * `localCheckpoint` every few rounds so deep iteration counts don't
  * accumulate a quadratic plan (same discipline as
  * `Dedup.connectedComponents`).
  *
  * Overflow bound (documented, asserted): `85 * Σ contributions` must
  * fit a signed 64-bit long. Σ over ALL nodes is ≤ nodes·r0, so with
  * the default r0 = 10⁹ the operator is safe to ~10⁸ nodes; larger
  * graphs pass a smaller `r0` (precision degrades gracefully — ranks
  * are relative).
  */
object Graphs {

  /** Fixed-iteration integer PageRank over a directed edge list
    * `(src, dst)` (LONG node ids). Every node must have at least one
    * out-edge (undirected graphs: pass both directions) — dangling
    * mass is not redistributed. Nodes with no IN-edges drop from the
    * rank table after the first iteration (their rank would be the
    * bare teleport term); undirected graphs are unaffected. Returns
    * `(node, rank)` with ranks in
    * `r0`-scaled integer units; damping 0.85 as `(15·r0)/100 +
    * (85·Σ)/100` in floor arithmetic.
    */
  def pageRank(edges: DataFrame, iters: Int, r0: Long = 1000000000L): DataFrame = {
    val (_, ranks, e, freeRounds) = pageRankStates0(edges, iters, r0,
      materializePrev = false)
    // The final ranks are materialized (eager localCheckpoint) so the
    // degree-joined edge table and any retained round checkpoints can
    // be freed HERE — callers get a self-contained result with no
    // storage obligation left behind.
    val out = ranks.materialize()
    freeRounds()
    e.unpersist(blocking = false)
    out
  }

  /** (final ranks — value-identical to [[pageRank]] — and the
    * [[pageRankReport]] certificate row), both from ONE trajectory:
    * the suite-level answer to running `pageRank` and
    * `pageRankReport` side by side, which would re-run every round
    * twice. The extra cost over [[pageRank]] alone is the
    * prev-round checkpoint only: the changed-count rides the output
    * materialization job as an `observe` metric
    * ([[graft.plans.Materialize.withMetrics]]) on the final-round ⟗
    * prev full join, so there is NO separate compare job (round 11 ran
    * one — a full-join + count action after the final materialize —
    * and graph_pagerank regressed 2.9× for it).
    */
  def pageRankWithReport(edges: DataFrame, iters: Int,
      r0: Long = 1000000000L): (DataFrame, DataFrame) = {
    require(iters >= 2, "need two rounds to compare")
    val (prev, last, e, freeRounds) = pageRankStates0(edges, iters, r0,
      materializePrev = true)
    // From round 1 onward the rank table's node set is exactly the
    // in-edge node set, so prev (round iters−1 ≥ 1) and last cover the
    // SAME nodes: the full join is row-for-row the final rank table
    // plus a `__pr` column, and dropping it back out is value-identical
    // to [[pageRank]]. The changed-count is observed ON the
    // materialization; r.isNotNull keeps prev-only rows (impossible by
    // the set argument, kept for defense) out of the output.
    val (ck, m) = graft.plans.Materialize.withMetrics(
      last.join(prev.select(col("node"), col("r").as("__pr")),
        Seq("node"), "full"),
      sum(when(not(col("r") <=> col("__pr")), 1L)).as("changed"))
    val changed = Option(m("changed")).fold(0L)(_.asInstanceOf[Long])
    val out = ck.filter(col("r").isNotNull).select("node", "r")
    freeRounds()
    e.unpersist(blocking = false)
    (out, certRow(edges, "pagerank", iters, changed))
  }

  /** PERSONALIZED PageRank (Haveliwala 2002 lineage — the
    * recommendation-system face of [[pageRank]]: the random walk
    * teleports only to the SEED set, so ranks measure proximity to
    * the seeds instead of global centrality). Same exact-integer
    * discipline: teleport `15·r0/100` lands on seed nodes only, every
    * contribution is floor arithmetic, so Spark and the unrolled
    * DuckDB oracle agree bit-for-bit. Initial state: seeds at `r0`,
    * everyone else absent; a node appears in the output once any walk
    * mass reaches it (or it is a seed). Same per-round O(edges)
    * shuffle + map-side combine as [[pageRank]]; the seed table is
    * O(seeds) and broadcast-able; round lineage truncates via the
    * [[pageRankStates0]] checkpoint discipline.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int, r0: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(r0 >= 100, "r0 must carry at least 2 decimal digits")
    val sc = edges.sparkSession.sparkContext
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = 15L * r0 / 100L
    val seed = seeds.select(col(seeds.columns(0)).as("node")).distinct()
      .materialize()
    var gens: List[Set[Int]] = Nil
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    def ckpt(df: DataFrame): DataFrame = {
      val ck = df.materialize()
      val g = graft.plans.Materialize.rddIds(ck) :: gens
      gens = if (g.size > 1) { free(g.last); g.init } else g
      ck
    }
    var ranks = seed.withColumn("r", lit(r0))
    for (i <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"), expr("(85 * s) div 100").as("rc"))
      ranks = contrib
        .join(seed.withColumn("__t", lit(teleport)), Seq("node"), "full")
        .select(col("node"),
          (coalesce(col("rc"), lit(0L)) + coalesce(col("__t"), lit(0L)))
            .as("r"))
      if (i % 5 == 0 && i < iters) ranks = ckpt(ranks)
    }
    val out = ranks.materialize()
    free(gens.flatten.toSet)
    free(graft.plans.Materialize.rddIds(seed))
    e.unpersist(blocking = false)
    out
  }

  /** One-row fixpoint certificate `(op, rounds, changed_last_round,
    * converged)` — literal-only plan, the count already a driver
    * scalar.
    */
  private def certRow(edges: DataFrame, op: String, rounds: Int,
      changed: Long): DataFrame =
    edges.sparkSession.range(1).select(lit(op).as("op"),
      lit(rounds.toLong).as("rounds"),
      lit(changed).as("changed_last_round"),
      lit(changed == 0L).as("converged"))

  /** (round iters−1 ranks, round iters ranks, the persisted
    * degree-joined edge table — caller unpersists — and a closure
    * freeing the retained round checkpoints, called by the caller
    * AFTER its last action reading the returned states).
    * `materializePrev` checkpoints the state BEFORE the final round,
    * so a caller comparing prev vs last (the report) runs the shared
    * round prefix ONCE — Catalyst shares no subtrees, so without it
    * the compare join recomputes rounds 1…iters−1 twice.
    *
    * Checkpoint retention follows [[hitsLoop]]'s discipline: one
    * generation stays live inside the loop (a new checkpoint is
    * eager, so its predecessor can never be read again), superseded
    * generations are freed immediately, and the final generation is
    * freed by the returned closure — no node-scale blocks outlive the
    * call in a long-lived session.
    */
  private def pageRankStates0(edges: DataFrame, iters: Int,
      r0: Long, materializePrev: Boolean)
      : (DataFrame, DataFrame, DataFrame, () => Unit) = {
    require(iters >= 1, "iters must be >= 1")
    require(r0 >= 100, "r0 must carry at least 2 decimal digits")
    val sc = edges.sparkSession.sparkContext
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) — the per-iteration join input, reused `iters`
    // times; persist so the degree join runs once.
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = 15L * r0 / 100L
    var gens: List[Set[Int]] = Nil // newest first; keep 1 live
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    def ckpt(df: DataFrame): DataFrame = {
      val ck = df.materialize()
      val g = graft.plans.Materialize.rddIds(ck) :: gens
      gens = if (g.size > 1) { free(g.last); g.init } else g
      ck
    }
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("r", lit(r0))
    var prev = ranks
    for (i <- 1 to iters) {
      if (materializePrev && i == iters) ranks = ckpt(ranks)
      prev = ranks
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(teleport) + expr("(85 * s) div 100")).as("r"))
      if (i % 5 == 0 && i < iters) ranks = ckpt(ranks)
    }
    (prev, ranks, e, () => free(gens.flatten.toSet))
  }

  /** Convergence certificate for fixed-iteration [[pageRank]] (the
    * [[kCoreReport]] family face for the fixpoint ops): one row
    * `(op, rounds, changed_last_round, converged)` where
    * `changed_last_round` counts nodes whose integer rank differs
    * between round iters−1 and round iters (a node entering or
    * leaving the rank table counts as changed). Integer PageRank is a
    * deterministic fixpoint iteration, so a zero count certifies the
    * iteration has converged EXACTLY — further rounds are provably
    * identical. One O(nodes) full join over the last two states.
    */
  def pageRankReport(edges: DataFrame, iters: Int,
      r0: Long = 1000000000L): DataFrame = {
    require(iters >= 2, "need two rounds to compare")
    val (prev, last, e, freeRounds) = pageRankStates0(edges, iters, r0,
      materializePrev = true)
    val changed = last
      .join(prev.select(col("node"), col("r").as("__pr")), Seq("node"), "full")
      .filter(not(col("r") <=> col("__pr")))
      .count()
    freeRounds()
    e.unpersist(blocking = false)
    certRow(edges, "pagerank", iters, changed)
  }

  /** Fixed-iteration integer HITS (Kleinberg 1999 — hubs point at good
    * authorities, authorities are pointed at by good hubs): the
    * query-independent link-analysis complement of [[pageRank]]
    * (PageRank ranks by one global random walk; HITS separates the
    * CITED-BY role from the CITES role, which on a bipartite trade
    * graph distinguishes "ordered by many customers" from "orders from
    * many suppliers").
    *
    * Why integer (the [[pageRank]] argument): the usual L2
    * normalization makes every iteration order-sensitive FP. Here each
    * half-step rescales by the MAX raw score in floor arithmetic —
    * `score ← (raw·r0) div max(raw)` — so every value is a pure
    * integer function of the edge set, the top node sits at exactly
    * `r0` each half-step, and Spark and the unrolled DuckDB oracle
    * agree bit-for-bit under any partitioning.
    *
    * Overflow bound (documented): `max_in_degree · r0² < 2⁶³` — with
    * the default r0 = 10⁶ safe to ~9·10⁶ in-degree; denser hubs pass
    * a smaller r0.
    *
    * Shape at scale: per half-step ONE shuffle of the O(nodes) score
    * table to the edge side plus a map-side-combined sum; the rescale
    * max rides as an `observe` metric ON that same job and returns as
    * a driver literal (round 10 — it used to be a separate 1-row
    * aggregate crossJoined back, one extra job per half-step). Nodes
    * with no in-edges hold authority 0, no out-edges hub 0 — kept in
    * the output via the node-universe left join.
    *
    * Each half-step's raw-score table feeds the NEXT half-step and
    * (for the final step) the output join, so it is checkpointed per
    * round ([[labelPropagation]]'s discipline) — without the
    * materialization the unshared subtree DOUBLES per half-step
    * (Catalyst does not share subtrees across consumers, see
    * [[triangleCount]]); measured round 8 at 57 s for a 1,600-node
    * graph vs ~3 s with it.
    */
  def hits(edges: DataFrame, iters: Int, r0: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(r0 >= 100, "r0 must carry at least 2 decimal digits")
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the node universe feeds the loop's hub seed AND the output join
    // — materialize so its shuffle runs once (no-subtree-sharing).
    // Derived with ONE explode pass over e, not a src∪dst self-union:
    // the union form read e twice in the cache-fill job (two subtree
    // consumers racing a cold cache), and this single-consumer pass
    // doubles as the edge-cache warm-up that hitsLoop used to pay a
    // separate count() job for (round 15; node set identical).
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .materialize()
    val (_, _, hub, auth, freeLoop) = hitsLoop(e, nodes, iters, r0,
      keepGens = 1)
    val out = nodes
      .join(hub.select(col("node"), col("h").as("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("a").as("auth")), Seq("node"), "left")
      .na.fill(0L, Seq("hub", "auth"))
      .materialize()
    // `out` is eagerly materialized: the retained half-step
    // checkpoints, the node universe and the edge cache are no longer
    // reachable.
    freeLoop()
    freeIds(nodes)
    e.unpersist(blocking = false)
    out
  }

  /** Free a materialized frame's own backing RDD blocks (its
    * LogicalRDD leaves — safe alongside concurrent plans, no global
    * diffing).
    */
  private def freeIds(df: DataFrame, blocking: Boolean = false): Unit = {
    val sc = df.sparkSession.sparkContext
    graft.plans.Materialize.rddIds(df).foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking)))
  }

  /** The HITS half-step engine shared by [[hits]] and [[hitsReport]]:
    * `iters` max-rescaled integer rounds over the persisted edge
    * table. Returns (round iters−1 hub, round iters−1 auth, final
    * hub, final auth, free-retained-checkpoints closure).
    *
    * Superseded half-step checkpoints are freed EAGERLY inside the
    * loop — `keepGens` generations stay live (1 for [[hits]]: araw_i
    * until araw_{i+1} materializes, since the final auth projection
    * reads the final araw; 2 for [[hitsReport]], which compares the
    * last two rounds). Without the eager free a single high-iters
    * call accumulates 2·iters materialized edge-scale RDDs for its
    * whole lifetime. Each checkpoint's OWN backing RDD ids come from
    * its LogicalRDD leaves (`Materialize.rddIds`) — no global
    * `getPersistentRDDs` diffing, so the loop is safe to run
    * concurrently with other plans (the fixpoint-delta query runs it
    * alongside the PageRank report).
    *
    * The rescale MAX rides as an `observe` metric ON each half-step's
    * materialization job (Materialize.withMetrics) and comes back as
    * a driver literal — no separate 1-row aggregate job, no
    * scalar-attach crossJoin in the plan.
    */
  private def hitsLoop(e: DataFrame, nodes: DataFrame, iters: Int,
      r0: Long, keepGens: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame, () => Unit) = {
    val sc = e.sparkSession.sparkContext
    // the edge cache is already warm: both callers materialize the
    // node universe from `e` (one single-consumer explode pass) before
    // entering the loop, so the separate count() warm-up job round 10
    // added is gone (round 15)
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    def ckptMaxed(df: DataFrame, scoreCol: String): (DataFrame, Long) = {
      val (ck, m) = graft.plans.Materialize.withMetrics(df,
        max(col(scoreCol)).as("m"))
      // empty raw table (edge-less graph): any nonzero divisor works,
      // the rescale projects zero rows
      (ck, Option(m("m")).fold(1L)(_.asInstanceOf[Long]))
    }
    var aGens: List[Set[Int]] = Nil // newest first
    var hGens: List[Set[Int]] = Nil
    def push(gens: List[Set[Int]], ids: Set[Int]): List[Set[Int]] = {
      val g = ids :: gens
      if (g.size > keepGens) { free(g.last); g.init } else g
    }
    var hub = nodes.withColumn("h", lit(r0))
    var auth: DataFrame = null
    var hubPrev: DataFrame = null
    var authPrev: DataFrame = null
    for (_ <- 1 to iters) {
      hubPrev = hub
      authPrev = auth
      val (araw, am) = ckptMaxed(
        e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst")).agg(sum(col("h")).as("ar")), "ar")
      aGens = push(aGens, graft.plans.Materialize.rddIds(araw))
      auth = araw.select(col("dst").as("node"),
        expr(s"(ar * $r0) div ${am}L").as("a"))
      val (hraw, hm) = ckptMaxed(
        e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src")).agg(sum(col("a")).as("hr")), "hr")
      hGens = push(hGens, graft.plans.Materialize.rddIds(hraw))
      hub = hraw.select(col("src").as("node"),
        expr(s"(hr * $r0) div ${hm}L").as("h"))
    }
    (hubPrev, authPrev, hub, auth,
      () => { free(aGens.flatten.toSet); free(hGens.flatten.toSet) })
  }

  /** Convergence certificate for fixed-iteration [[hits]]: one row
    * `(op, rounds, changed_last_round, converged)` where
    * `changed_last_round` counts nodes whose (hub, auth) pair —
    * 0-filled over the node universe, exactly like the [[hits]]
    * output — differs between round iters−1 and round iters.
    * Max-rescaled integer HITS is a deterministic fixpoint iteration,
    * so a zero count certifies exact convergence.
    */
  def hitsReport(edges: DataFrame, iters: Int,
      r0: Long = 1000000L): DataFrame =
    hitsStatesCompared(edges, iters, r0, wantScores = false)._2

  /** (hub/auth scores — value-identical to [[hits]] — and the
    * [[hitsReport]] certificate row), both from ONE trajectory (the
    * [[pageRankWithReport]] counterpart). Extra cost over [[hits]]
    * alone: one retained half-step generation — the changed-count
    * rides the output materialization job as an `observe` metric, no
    * separate compare job.
    */
  def hitsWithReport(edges: DataFrame, iters: Int,
      r0: Long = 1000000L): (DataFrame, DataFrame) = {
    val (scores, report) = hitsStatesCompared(edges, iters, r0,
      wantScores = true)
    (scores.get, report)
  }

  private def hitsStatesCompared(edges: DataFrame, iters: Int,
      r0: Long, wantScores: Boolean): (Option[DataFrame], DataFrame) = {
    require(iters >= 2, "need two rounds to compare")
    require(r0 >= 100, "r0 must carry at least 2 decimal digits")
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 3 consumers (loop seed + both filled states): materialize once;
    // single explode pass = the cache warm-up too (see [[hits]])
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .materialize()
    val (hubPrev, authPrev, hub, auth, freeLoop) =
      hitsLoop(e, nodes, iters, r0, keepGens = 2)
    def filled(h: DataFrame, a: DataFrame, hn: String,
        an: String): DataFrame = nodes
      .join(h.select(col("node"), col("h").as(hn)), Seq("node"), "left")
      .join(a.select(col("node"), col("a").as(an)), Seq("node"), "left")
      .na.fill(0L, Seq(hn, an))
    // Both filled states cover the SAME node universe, so the inner
    // compare join is row-for-row the final state plus the prev
    // columns. When scores are wanted, the changed-count rides the
    // output materialization as an `observe` metric (the
    // [[pageRankWithReport]] fusion — no separate compare job) and the
    // output projects the prev columns back out, value-identical to
    // [[hits]]. Report-only callers skip the materialization: one
    // count job over the loop checkpoints is already minimal.
    val changedCond =
      col("hub") =!= col("phub") || col("auth") =!= col("pauth")
    val (scores, changed) = if (wantScores) {
      val (ck, m) = graft.plans.Materialize.withMetrics(
        filled(hub, auth, "hub", "auth")
          .join(filled(hubPrev, authPrev, "phub", "pauth"), Seq("node")),
        sum(when(changedCond, 1L)).as("changed"))
      (Some(ck.select("node", "hub", "auth")),
        Option(m("changed")).fold(0L)(_.asInstanceOf[Long]))
    } else {
      (None,
        filled(hub, auth, "hub", "auth")
          .join(filled(hubPrev, authPrev, "phub", "pauth"), Seq("node"))
          .filter(changedCond)
          .count())
    }
    freeLoop()
    freeIds(nodes)
    e.unpersist(blocking = false)
    (scores, certRow(edges, "hits", iters, changed))
  }

  /** Bounded-depth BFS: exact hop distance (0…maxHops) from a source
    * set to every reachable node. Frontier-at-a-time — the textbook
    * distributed BFS: round i joins only the PREVIOUS frontier (nodes
    * first reached at i−1) against the edge list, anti-joins the
    * visited set, and unions the survivors in at distance i. Cost per
    * round is O(frontier·avg-degree + visited), not O(nodes²); hop
    * distances are integers so the result is exactly reproducible
    * (and recursive-CTE-oracle-able). Visited-set lineage is
    * truncated every round (`localCheckpoint`) — BFS state is the
    * canonical quadratic-lineage trap.
    *
    * Returns `(node, dist)`; unreachable-within-maxHops nodes are
    * absent.
    */
  def kHopDistances(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame =
    kHopStates(edges, sources, maxHops)._1

  /** (distances, size of the final frontier) — the frontier counts
    * already ride as `observe` metrics on the per-round checkpoints,
    * so the convergence certificate is free: the last materialized
    * frontier holds exactly the nodes at `dist = maxHops` (or is
    * empty when the traversal exhausted early — same answer either
    * way).
    */
  private def kHopStates(edges: DataFrame, sources: DataFrame,
      maxHops: Int): (DataFrame, Long) = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Per-round job budget matters here (bounded rounds of TINY jobs —
    // fixed per-job latency adds up): the frontier count rides as an
    // `observe` metric ON the materialization job (no separate isEmpty
    // job), and the visited set is NOT re-materialized per round — it
    // is a union of already-checkpointed frontiers, so its lineage is
    // O(rounds) unions over materialized RDDs (linear, not the
    // quadratic-lineage trap the frontier checkpoint guards against).
    var (dist, n0) = ckptCounted(sources
      .select(col(sources.columns(0)).as("node"))
      .distinct().withColumn("dist", lit(0L)))
    var frontier = dist
    var frontierN = n0
    var i = 1
    while (i <= maxHops && frontierN > 0) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(i.toLong))
      val (ck, n) = ckptCounted(next)
      frontier = ck
      frontierN = n
      dist = dist.union(frontier)
      i += 1
    }
    (dist, frontierN)
  }

  /** Exact triangle count of an undirected graph, by degree-ordered
    * edge orientation (Ortmann & Brandes 2014 lineage; the classic
    * compact-forward scheme). Input: a 2-column edge list in either
    * orientation (duplicates and self-loops tolerated — normalized
    * away). Returns ONE row `(n_nodes, n_edges, n_triangles)`.
    *
    * Why orientation is the whole story at scale: the naive
    * wedge join fans out Σ deg(v)² — a single celebrity node with
    * 10⁶ neighbors makes 10¹² wedges. Orienting every edge from its
    * (degree, id)-smaller endpoint to its larger bounds each node's
    * OUT-degree by O(√edges) (arboricity bound), so the wedge join
    * fans out Σ outdeg(v)² = O(edges^1.5) worst-case — the hub's
    * million edges all point INTO it and generate no wedges. Each
    * triangle {a<b<c} (in the orientation's total order) survives as
    * exactly one oriented wedge a→b→c closed by the oriented edge
    * a→c, checked with a LEFT SEMI join (no fan-out on the close).
    *
    * The normalized edge set and the oriented edge set are each
    * `localCheckpoint`ed: both feed 2–3 consumers (degree join, the
    * two wedge arms, the closing semi join, the stat counts), and
    * Catalyst does not share subtrees across consumers — without the
    * checkpoint the upstream edge derivation would re-execute per
    * consumer.
    */
  def triangleCount(pairs: DataFrame): DataFrame = {
    val cs = pairs.columns
    require(cs.length >= 2, "edge list needs two id columns first")
    val und = pairs
      .select(least(col(cs(0)), col(cs(1))).as("u"),
        greatest(col(cs(0)), col(cs(1))).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .materialize()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dir = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .materialize()
    val wedges = dir.as("e1").join(dir.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e2.b").as("z"))
    val closed = wedges.join(dir.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002 lineage;
    * the synchronous, clamped-seed variant): seed nodes carry a fixed
    * label; each round every NON-seed node adopts the majority label
    * of its labeled in-neighbors, ties broken deterministically
    * (highest count, then lowest label — no randomized update order,
    * unlike classic LPA, so the whole trajectory is a pure function of
    * the graph and replays bit-for-bit in an unrolled oracle).
    * Synchronous rounds: round i votes use ONLY round i−1 labels.
    *
    * Input: a directed edge list `(src, dst)` (pass both directions
    * for undirected semantics) and `seeds (node, label)`. Returns
    * `(node, label, is_seed)` for every node labeled after `rounds`
    * rounds; unreached nodes are absent.
    *
    * Shape at scale: each round is one O(edges) shuffle of
    * `(dst, label)` votes with map-side combine onto the composite
    * (node, label) key, then an O(nodes) argmax re-aggregation —
    * the majority vote is `min(struct(−count, label))`, a 16-byte
    * accumulator, NOT a per-node sorted window. Seeds clamp via an
    * anti join (seed set is O(seeds), shuffled once per round).
    * Label-table lineage is truncated each round (the iterative-state
    * discipline of [[kHopDistances]]).
    */
  /** Newman modularity of a node partition: `Q = Σ_c (e_c/m −
    * (d_c/2m)²)` over an UNDIRECTED distinct edge list `(u, v)` and a
    * `(node, label)` community assignment — the standard quality score
    * for [[labelPropagation]] output (Newman & Girvan 2004). Unlabeled
    * nodes count as singleton communities (no within-edges, degree
    * mass still penalized — the conservative convention).
    *
    * Exactness: m, within-community edge counts, and community degree
    * sums are exact integers; each community's term is ONE fixed FP
    * tree and the cross-community sum is an ordered fold by community
    * label (the `stat_chisq` discipline). Returns ONE row
    * `(n_edges, n_communities, modularity)`.
    *
    * Shape at scale: degree = one O(edges) map-combined count; the
    * within-edge count joins each edge end to the O(nodes) community
    * table (two hash joins, no fan-out); everything after runs on
    * |communities| rows.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col(edges.columns(0)).as("u"),
      col(edges.columns(1)).as("v"))
    val m = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val lab = labels.select(col(labels.columns(0)).as("node"),
      col(labels.columns(1)).as("label"))
    val nc = deg.join(lab, Seq("node"), "left")
      .select(col("node"), col("d"),
        coalesce(col("label"),
          concat(lit("node:"), col("node").cast("string"))).as("comm"))
    val within = und
      .join(nc.select(col("node").as("u"), col("comm").as("ca")), Seq("u"))
      .join(nc.select(col("node").as("v"), col("comm").as("cb")), Seq("v"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("comm")).agg(count(lit(1)).as("within"))
    val dc = nc.groupBy("comm").agg(sum("d").as("dsum"))
    def d(c: String): Column = col(c).cast("double")
    val term = d("within") / d("m") -
      (d("dsum") / (lit(2.0) * d("m"))) * (d("dsum") / (lit(2.0) * d("m")))
    dc.join(within, Seq("comm"), "left")
      .na.fill(0L, Seq("within"))
      .crossJoin(broadcast(m))
      .select(col("comm"), col("m"), term.as("t"))
      .groupBy("m")
      .agg(count(lit(1)).as("n_communities"),
        aggregate(
          array_sort(collect_list(struct(col("comm"), col("t")))),
          lit(0.0), (acc, e) => acc + e.getField("t")).as("modularity"))
      .select(col("m").as("n_edges"), col("n_communities"),
        col("modularity"))
  }

  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val (_, labels, seed, e) = labelPropagationStates0(edges, seeds, rounds)
    val out = labels
      .join(seed.select(col("node"), lit(true).as("is_seed")),
        Seq("node"), "left")
      .na.fill(false, Seq("is_seed"))
      .materialize()
    e.unpersist(blocking = false)
    out
  }

  /** Last two label states — (round rounds−1, round rounds); both
    * eagerly checkpointed so the convergence join is cheap.
    */
  private def labelPropagationStates(edges: DataFrame, seeds: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    val (prev, last, _, e) = labelPropagationStates0(edges, seeds, rounds)
    e.unpersist(blocking = false)
    (prev, last)
  }

  private def labelPropagationStates0(edges: DataFrame, seeds: DataFrame,
      rounds: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed = seeds.select(col(seeds.columns(0)).as("node"),
      col(seeds.columns(1)).as("label")).distinct().materialize()
    var labels = seed
    var prev = labels
    for (_ <- 1 to rounds) {
      prev = labels
      val votes = e.join(labels, e("src") === labels("node"))
        .select(col("dst"), col("label"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val inferred = votes
        .groupBy("dst")
        .agg(min(struct((col("cnt") * -1).as("nc"), col("label"))).as("m"))
        .select(col("dst").as("node"), col("m.label").as("label"))
      labels = seed.unionAll(
          inferred.join(seed.select("node"), Seq("node"), "left_anti"))
        .materialize()
    }
    (prev, labels, seed, e)
  }

  /** Bounded-round k-core peeling over a SYMMETRIC edge list (both
    * directions present, so a node's degree is its out-degree): each
    * round drops every node whose current degree is below `k` and the
    * edges touching it — the standard iterative decomposition
    * (Batagelj–Zaversnik turned rounds-bounded, the [[labelPropagation]]
    * discipline: a FIXED round count keeps the operator deterministic
    * and oracle-unrollable; peeling converges in ≤ diameter-ish rounds
    * in practice, and un-converged output is still a sound OVER-
    * approximation of the k-core — peeling only ever removes nodes).
    * Returns `(node, degree)` of the surviving subgraph.
    *
    * Scale shape: each round is one map-combined degree count plus two
    * broadcast-able semi-joins on the shrinking survivor set —
    * O(edges) per round, no all-pairs anything; lineage truncates per
    * round (`localCheckpoint`) so plans stay flat at any round count.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kCoreStates(edges, k, rounds)._2
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))

  /** Shared observe-count-on-materialization step (the
    * [[graft.plans.Materialize.withMetrics]] pattern): row count rides
    * on the checkpoint job — zero extra jobs for loop bookkeeping.
    */
  private def ckptCounted(df: DataFrame): (DataFrame, Long) = {
    val (ck, m) = graft.plans.Materialize.withMetrics(df,
      count(lit(1)).as("n"))
    (ck, m("n").asInstanceOf[Long])
  }

  /** Last two peeling states — (round rounds−1 edges, round rounds
    * edges, their edge counts); counts ride as `observe` metrics on
    * the per-round checkpoints (the [[kHopDistances]] discipline), so
    * the convergence report costs ZERO extra jobs.
    */
  private def kCoreStates(edges: DataFrame, k: Int,
      rounds: Int): (DataFrame, DataFrame, Long, Long) = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    var (e, n) = ckptCounted(edges.select(
      col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst")))
    var prev = e
    var prevN = n
    for (_ <- 1 to rounds) {
      prev = e
      prevN = n
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      val next = ckptCounted(e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst"))
      e = next._1
      n = next._2
    }
    (prev, e, prevN, n)
  }

  /** Convergence certificate for bounded-round [[kCore]] (the gap
    * `kCore`'s own doc records): one row `(op, rounds,
    * changed_last_round, converged)` where `changed_last_round` is
    * the number of edges the FINAL round removed. Peeling is
    * monotone, so a no-op final round is a sound fixpoint
    * certificate (`converged = true`); a nonzero count means the
    * round budget may have stopped early and the (still sound,
    * over-approximate) output is flagged as such. The fixed round
    * count — and therefore the unrolled oracle — is unchanged; the
    * certificate is two counts over already-checkpointed states.
    */
  def kCoreReport(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kCoreWithReport(edges, k, rounds)._2

  /** (surviving-subgraph degrees — value-identical to [[kCore]] — and
    * the [[kCoreReport]] certificate row) from ONE peeling: the
    * certificate is the difference of the per-round edge counts that
    * already ride as `observe` metrics, so it is FREE on top of the
    * peel (the [[pageRankWithReport]] suite-dedup pattern).
    */
  def kCoreWithReport(edges: DataFrame, k: Int,
      rounds: Int): (DataFrame, DataFrame) = {
    val (_, last, prevN, lastN) = kCoreStates(edges, k, rounds)
    val surv = last.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
    (surv, certRow(edges, "kcore", rounds, prevN - lastN))
  }

  /** Convergence certificate for bounded-round [[labelPropagation]]:
    * `changed_last_round` counts nodes whose label differs between
    * round rounds−1 and round rounds (including nodes first labeled
    * in the final round). Synchronous LPA can oscillate, so a zero
    * count certifies a fixpoint while a nonzero count only says the
    * budget stopped at a still-moving state. Same fixed rounds, same
    * oracle; the certificate is one join between two checkpointed
    * label tables.
    */
  def labelPropagationReport(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val (prev, last) = labelPropagationStates(edges, seeds, rounds)
    val changed = last.select(col("node"), col("label"))
      .join(prev.select(col("node"), col("label").as("__prev")),
        Seq("node"), "left")
      .filter(not(col("label") <=> col("__prev")))
      .count()
    edges.sparkSession.range(1).select(lit("labelprop").as("op"),
      lit(rounds.toLong).as("rounds"),
      lit(changed).as("changed_last_round"),
      lit(changed == 0L).as("converged"))
  }

  /** Convergence certificate for bounded-depth [[kHopDistances]]:
    * `changed_last_round` is the frontier size at `maxHops` — zero
    * means the traversal exhausted the reachable set within budget
    * (the loop's own early-exit condition), nonzero means nodes at
    * the horizon may still have unvisited neighbors.
    */
  def kHopReport(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame =
    kHopWithReport(edges, sources, maxHops)._2

  /** (hop distances — value-identical to [[kHopDistances]] — and the
    * [[kHopReport]] certificate row) from ONE traversal: the frontier
    * size already rides as an `observe` metric on the per-round
    * checkpoints, so the certificate is free on top of the BFS.
    */
  def kHopWithReport(edges: DataFrame, sources: DataFrame,
      maxHops: Int): (DataFrame, DataFrame) = {
    val (dist, frontierN) = kHopStates(edges, sources, maxHops)
    (dist, certRow(edges, "bfs", maxHops, frontierN))
  }

  /** (labeled nodes — value-identical to [[labelPropagation]] — and
    * the [[labelPropagationReport]] certificate row) from ONE
    * propagation: both final label states are already checkpointed by
    * the loop, so the certificate adds one O(nodes) compare-join
    * count.
    */
  def labelPropagationWithReport(edges: DataFrame, seeds: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    val (prev, labels, seed, e) = labelPropagationStates0(edges, seeds, rounds)
    val out = labels
      .join(seed.select(col("node"), lit(true).as("is_seed")),
        Seq("node"), "left")
      .na.fill(false, Seq("is_seed"))
      .materialize()
    val changed = labels.select(col("node"), col("label"))
      .join(prev.select(col("node"), col("label").as("__prev")),
        Seq("node"), "left")
      .filter(not(col("label") <=> col("__prev")))
      .count()
    e.unpersist(blocking = false)
    (out, certRow(edges, "labelprop", rounds, changed))
  }

  // ------------------------------------------------------------- SCC

  /** Min-label reachability fixpoint over DIRECTED edges with
    * pointer-jumping acceleration (the FastSV-style shortcut, sound
    * here because labels are WITNESSES: f(v) = x proves x reaches v,
    * and f(x) = y proves y reaches x, hence y reaches v — so folding
    * the label table onto itself can only propose valid reachers):
    * each round's one plan takes the min of the node's label, its
    * in-neighbors' labels, and its label's own label, then checkpoints
    * with the changed-count riding `observe`. Min labels are MONOTONE,
    * so changed == 0 is an exact fixpoint certificate (no signature
    * collision caveat), and the jump makes rounds O(log depth) instead
    * of O(depth) — the difference between a 14-deep acyclic fringe
    * costing 14 shuffled rounds and costing 5. Every leaf of the round
    * plan is a checkpoint scan or the materialized edge table, so
    * nothing recomputes; superseded rounds free eagerly.
    */
  private def minLabelFixpoint(e: DataFrame, nodes: DataFrame,
      maxIter: Int): DataFrame = {
    var f = nodes.select(col("node"), col("node").as("f")).materialize()
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      if (rounds > maxIter)
        throw new IllegalStateException(
          s"min-label fixpoint did not converge in $maxIter rounds")
      // ONE propagation step per checkpoint — in-neighbor min plus a
      // pointer jump over the round-start labels (every leaf is a
      // checkpoint scan or the materialized edge table, and the plan
      // stays SHALLOW: nesting fused steps re-enters the analyzer's
      // self-join disambiguation on an exponentially duplicated
      // subtree, measured at 60 s of driver time per round)
      val prop = e
        .join(f.select(col("node").as("pn"), col("f").as("pf")),
          e("src") === col("pn"))
        .groupBy(col("dst")).agg(min(col("pf")).as("mn"))
      val jump = f.select(col("node").as("jn"), col("f").as("jf"))
      val stepped = f
        .join(prop, f("node") === prop("dst"), "left")
        .select(col("node"), col("f"),
          least(col("f"), coalesce(col("mn"), col("f"))).as("f1"))
        .join(jump, col("f1") === col("jn"), "left")
        .select(col("node"), col("f"),
          least(col("f1"), coalesce(col("jf"), col("f1"))).as("nf"))
      val (ck, m) = graft.plans.Materialize.withMetrics(
        stepped.select(col("node"), col("nf").as("__nf"),
          (col("nf") < col("f")).as("__chg")),
        sum(when(col("__chg"), 1L).otherwise(0L)).as("c"))
      changed = Option(m("c")).fold(0L)(_.asInstanceOf[Long])
      freeIds(f, blocking = true)
      f = ck.select(col("node"), col("__nf").as("f"))
    }
    f
  }

  /** Iterative Tarjan (1972) over a driver-resident edge list —
    * explicit DFS stack (no recursion, safe at the full
    * `collectThreshold`), component id canonicalized to the MINIMUM
    * member so the fast path and the distributed peeling emit the
    * identical table (spec-pinned against each other).
    */
  private def tarjanScc(edges: Array[(Long, Long)]): Map[Long, Long] = {
    import scala.collection.mutable
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.filter(e => e._1 != e._2).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val index = mutable.Map[Long, Int]()
    val low = mutable.Map[Long, Int]()
    val onStack = mutable.Set[Long]()
    val st = mutable.ArrayBuffer[Long]()
    val work = mutable.ArrayBuffer[(Long, Iterator[Long])]()
    val sccOf = mutable.Map[Long, Long]()
    var counter = 0
    def open(v: Long): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      st += v; onStack += v
      work += ((v, adj.getOrElse(v, Array.empty[Long]).iterator))
    }
    for (root <- nodes if !index.contains(root)) {
      open(root)
      while (work.nonEmpty) {
        val (v, it) = work.last
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) open(w)
          else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = mutable.ArrayBuffer[Long]()
            var w = 0L
            do {
              w = st.remove(st.length - 1); onStack -= w; comp += w
            } while (w != v)
            val id = comp.min
            comp.foreach(c => sccOf(c) = id)
          }
        }
      }
    }
    sccOf.toMap
  }

  /** Strongly connected components over a DIRECTED edge list —
    * forward-backward min-label CLASS PEELING (the FW-BW partition
    * family: Fleischer et al. 2000 divide-and-conquer, Orzan 2004
    * coloring, with min labels so component ids are canonical): per
    * peel, compute the forward min-reach F and backward min-reach B
    * fixpoints ([[minLabelFixpoint]], O(edges) per round, never
    * all-pairs). F(v) = B(v) = x proves v and x reach each other, so v
    * settles into SCC(x) — and the remaining minimum node's whole SCC
    * always satisfies it, so every peel provably progresses. Unsettled
    * nodes carry the (F, B) pair as their CLASS: any cycle lies wholly
    * inside one class (crossing edges can never close a cycle — F or B
    * would differ), so the next peel keeps only same-class edges and
    * all classes recurse IN ONE DataFrame, no per-class dispatch.
    * Returns `(node, scc)` with scc = the component's minimum node id
    * — exactly mutual-reachability ground truth (the DuckDB oracle
    * computes it by transitive closure; the engine never does).
    *
    * Scale shape: every step is an equi-join + map-combined min
    * aggregate on the shrinking remainder; fixpoints are
    * jump-accelerated (each round also folds the label table onto
    * itself) and peel count is the class-recursion depth, never O(n).
    * Self-loops drop from the loop edges (they never affect strong
    * connectivity); self-loop-only nodes settle as their own SCC like
    * any other edge-less node. A distinct edge set at or under
    * `collectThreshold` rows short-circuits to driver Tarjan — the
    * bounded-collect convention: ~13 fixpoint checkpoints of pure job
    * overhead lose to one exact O(V+E) pass on driver-sized graphs,
    * and the two paths are spec-pinned identical.
    */
  def stronglyConnectedComponents(edges: DataFrame, maxPeel: Int = 25,
      maxIter: Int = 60, collectThreshold: Int = 4096): DataFrame = {
    require(edges.columns.length >= 2,
      "edges must have the two id columns first")
    val ids = edges.columns
    val (e0, nEdges) = ckptCounted(
      edges.select(col(ids(0)).cast("long").as("src"),
        col(ids(1)).cast("long").as("dst")).distinct())
    // Bounded-collect fast path (the repo's k-means-codebook
    // convention): a DISTINCT edge set at or under `collectThreshold`
    // rows is driver-sized by definition — Tarjan's exact O(V+E) pass
    // beats ~13 distributed fixpoint checkpoints of pure job overhead.
    // The aggregation that produced the edge list stays distributed
    // (it already ran, inside the checkpoint above); graphs that
    // outgrow the bound take the peeling loop below unchanged.
    if (nEdges <= collectThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val el = e0.as[(Long, Long)].collect()
      val out = spark.createDataFrame(tarjanScc(el).toSeq)
        .toDF("node", "scc")
      freeIds(e0)
      return out
    }
    var nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().materialize()
    var rem = e0.filter(col("src") =!= col("dst")).materialize()
    // every checkpoint this loop creates, freed AFTER the output
    // materializes (settled parts are narrow views over the per-peel
    // label checkpoints)
    var owned: List[DataFrame] = List(e0, nodes, rem)
    var settledParts: List[DataFrame] = Nil
    var nLeft = nodes.count()
    var peel = 0
    while (nLeft > 0) {
      peel += 1
      if (peel > maxPeel)
        throw new IllegalStateException(
          s"SCC peeling did not converge in $maxPeel peels")
      val f = minLabelFixpoint(rem, nodes, maxIter)
      val b = minLabelFixpoint(
        rem.select(col("dst").as("src"), col("src").as("dst")),
        nodes, maxIter)
      val lbl = f.join(b.select(col("node"), col("f").as("b")),
        Seq("node")).materialize()
      freeIds(f, blocking = true); freeIds(b, blocking = true)
      owned ::= lbl
      settledParts ::= lbl.filter(col("f") === col("b"))
        .select(col("node"), col("f").as("scc"))
      val (kept, nKept) = ckptCounted(lbl.filter(col("f") =!= col("b")))
      owned ::= kept
      nLeft = nKept
      if (nKept > 0) {
        nodes = kept.select(col("node"))
        val sl = kept.select(col("node").as("sn"), col("f").as("sf"),
          col("b").as("sb"))
        val dl = kept.select(col("node").as("dn"), col("f").as("df"),
          col("b").as("db"))
        rem = rem.join(sl, rem("src") === col("sn"))
          .join(dl, rem("dst") === col("dn"))
          .filter(col("sf") === col("df") && col("sb") === col("db"))
          .select(col("src"), col("dst")).materialize()
        owned ::= rem
      }
    }
    if (settledParts.isEmpty) // edge-less input: empty graph, empty out
      return e0.select(col("src").as("node"), col("dst").as("scc")).limit(0)
    val out = settledParts.reduce(_ unionAll _).materialize()
    owned.foreach(freeIds(_))
    out
  }
}
