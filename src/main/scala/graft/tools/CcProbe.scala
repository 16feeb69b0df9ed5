package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: A/B the connected-components round structure at bench
  * scale. (A) the current Dedup.connectedComponents (salted two-phase
  * mins ×2, intermediate distinct on the large-star output — ~9
  * logical exchanges per round). (B) a restructured round: plain
  * map-side-combined groupBy.min (partial aggregation already bounds
  * a hub key's final group at ≤1 row per map task — guide §2.3),
  * NO intermediate distinct (min over a multiset and the final
  * distinct absorb duplicates), all exchanges ENSURE_REQUIREMENTS so
  * AQE skew-split/coalesce still apply, and identical subtrees
  * (sym-by-u, large-by-u) dedupe via ReusedExchange — ~5 logical /
  * ~3 physical exchanges per round. Outputs must be identical sets.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // B: restructured star rounds (exact same algebra as A)
    def ccB(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
      val sc = pairs.sparkSession.sparkContext
      var knownIds = sc.getPersistentRDDs.keySet
      var prevRoundIds = Set.empty[Int]
      def trackRound(): Unit = {
        val now = sc.getPersistentRDDs.keySet
        prevRoundIds = (now -- knownIds).toSet
        knownIds = now
      }
      def freePrevRound(): Unit =
        prevRoundIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      def checkpointWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
        val (ck, m) = graft.plans.Materialize.withMetrics(df,
          count(lit(1)).as("n"),
          bit_xor(xxhash64(col("u"), col("v"))).as("x"))
        (ck, (m("n").asInstanceOf[Long],
          Option(m("x")).map(_.asInstanceOf[Long]).getOrElse(0L)))
      }
      val ids = pairs.columns
      var (edges, edgeSig) = checkpointWithSig(pairs
        .select(col(ids(0)).cast("long").as("a"), col(ids(1)).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct())
      trackRound()
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val tR = System.nanoTime()
        val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
        val lmins = sym.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val large = sym.join(lmins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
        val smins = large.groupBy("u").agg(min(col("v")).as("m"))
        val (small, smallSig) = checkpointWithSig(large.join(smins, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(smins.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct())
        converged = smallSig == edgeSig && small.except(edges).isEmpty
        freePrevRound()
        trackRound()
        edges = small
        edgeSig = smallSig
        it += 1
        println(f"    round $it: ${(System.nanoTime() - tR) / 1e9}%.2f s " +
          s"(${smallSig._1} edges, converged=$converged)")
      }
      require(converged, s"ccB did not converge in $maxIter rounds")
      edges.select(col("u").as("doc_id"), col("v").as("component"))
        .union(edges.select(col("v"), col("v")).distinct())
    }

    // C: round-15 experiment — B plus a POINTER-JUMP prepended to each
    // round from round `jumpFrom` on (fused into the same checkpoint
    // job, no extra action): parents p(u) = min target of u; every
    // edge (u,v) re-points at p(v) when v has a parent (p(v) < v < u,
    // so the u>v invariant holds), and the parent edges (v, p(v)) stay
    // in the set, so connectivity is exactly preserved. Chain-heavy
    // graphs (ER names: 5 star rounds = diameter-bound) contract ~2×
    // extra per round. Convergence safety: when a round's output
    // equals its input (sig + except, as in A/B) AND the round had the
    // jump active, the state is additionally CERTIFIED to be min-stars
    // structurally — every source exactly once, no target is a source;
    // with node+connectivity preservation that implies each component
    // is one star rooted at its min, so the output is correct without
    // appealing to the alternating-round fixpoint theorem. If
    // certification ever failed, the jump is demoted and pure B rounds
    // (the proven algorithm) finish from that state.
    def ccC(pairs: DataFrame, jumpFrom: Int = 1, maxIter: Int = 30): DataFrame = {
      val sc = pairs.sparkSession.sparkContext
      var knownIds = sc.getPersistentRDDs.keySet
      var prevRoundIds = Set.empty[Int]
      def trackRound(): Unit = {
        val now = sc.getPersistentRDDs.keySet
        prevRoundIds = (now -- knownIds).toSet
        knownIds = now
      }
      def freePrevRound(): Unit =
        prevRoundIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      def checkpointWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
        val (ck, m) = graft.plans.Materialize.withMetrics(df,
          count(lit(1)).as("n"),
          bit_xor(xxhash64(col("u"), col("v"))).as("x"))
        (ck, (m("n").asInstanceOf[Long],
          Option(m("x")).map(_.asInstanceOf[Long]).getOrElse(0L)))
      }
      val ids = pairs.columns
      var (edges, edgeSig) = checkpointWithSig(pairs
        .select(col(ids(0)).cast("long").as("a"), col(ids(1)).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct())
      trackRound()
      var converged = false
      var jumpOn = true
      var it = 0
      while (!converged && it < maxIter) {
        val tR = System.nanoTime()
        val jumped = jumpOn && it + 1 >= jumpFrom
        val base =
          if (jumped) {
            val par = edges.groupBy("u").agg(min(col("v")).as("pv"))
            edges.join(par.select(col("u").as("v"), col("pv")), Seq("v"), "left")
              .select(col("u"), coalesce(col("pv"), col("v")).as("v"))
              .union(par.select(col("u"), col("pv").as("v")))
              .filter(col("u") =!= col("v"))
          } else edges
        val sym = base.union(base.select(col("v").as("u"), col("u").as("v")))
        val lmins = sym.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val large = sym.join(lmins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
        val smins = large.groupBy("u").agg(min(col("v")).as("m"))
        val (small, smallSig) = checkpointWithSig(large.join(smins, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(smins.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct())
        if (smallSig == edgeSig && small.except(edges).isEmpty) {
          if (!jumped) converged = true
          else {
            // structural min-star certificate, one fused job: sources
            // with >1 edge ∪ targets that are also sources must be ∅
            val multi = small.groupBy("u").agg(count(lit(1)).as("n"))
              .filter(col("n") > 1).select(col("u").as("x"))
            val tgtSrc = small.select(col("v").as("x"))
              .join(small.select(col("u").as("x")), Seq("x"), "left_semi")
            if (multi.union(tgtSrc).isEmpty) converged = true
            else jumpOn = false // demote: finish with proven pure rounds
          }
        }
        freePrevRound()
        trackRound()
        edges = small
        edgeSig = smallSig
        it += 1
        println(f"    C round $it (jump=$jumped): ${(System.nanoTime() - tR) / 1e9}%.2f s " +
          s"(${smallSig._1} edges, converged=$converged)")
      }
      require(converged, s"ccC did not converge in $maxIter rounds")
      edges.select(col("u").as("doc_id"), col("v").as("component"))
        .union(edges.select(col("v"), col("v")).distinct())
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // ER pairs over customer (the er_entities graph)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val erPairs = graft.operators.Linkage.blockedPairs(cust,
      col("c_custkey"), col("c_name"),
      struct(col("c_nationkey"), col("c_mktsegment")), maxDist = 2)
      .select("a_id", "b_id").materialize()
    // ngram near-dup pairs over documents (the dedup_components graph)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val docPairs = graft.functions.Dedup
      .ngramJaccardPairs(docs, w = 3, threshold = 0.5)
      .select("a_id", "b_id").materialize()

    // equality check once per graph (B = shipped structure; C = jump
    // hybrid at two insertion points)
    for ((nm, pairs) <- Seq("er" -> erPairs, "doc" -> docPairs)) {
      val a = graft.functions.Dedup.connectedComponents(pairs)
      val b = ccB(pairs)
      val c1 = ccC(pairs, jumpFrom = 1)
      val c2 = ccC(pairs, jumpFrom = 2)
      val sameB = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      val sameC1 = a.exceptAll(c1).isEmpty && c1.exceptAll(a).isEmpty
      val sameC2 = a.exceptAll(c2).isEmpty && c2.exceptAll(a).isEmpty
      println(s"$nm: A == B: $sameB, A == C(j1): $sameC1, A == C(j2): $sameC2")
    }
    for (i <- 1 to 3) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val erP = graft.operators.Linkage.blockedPairs(cust,
        col("c_custkey"), col("c_name"),
        struct(col("c_nationkey"), col("c_mktsegment")), maxDist = 2)
        .select("a_id", "b_id").materialize()
      time(s"A er $i")(graft.functions.Dedup.connectedComponents(erP).count())
      time(s"B er $i")(ccB(erP).count())
      time(s"C1 er $i")(ccC(erP, jumpFrom = 1).count())
      time(s"C2 er $i")(ccC(erP, jumpFrom = 2).count())
      val dP = graft.functions.Dedup
        .ngramJaccardPairs(docs, w = 3, threshold = 0.5)
        .select("a_id", "b_id").materialize()
      time(s"A doc $i")(graft.functions.Dedup.connectedComponents(dP).count())
      time(s"B doc $i")(ccB(dP).count())
      time(s"C1 doc $i")(ccC(dP, jumpFrom = 1).count())
      time(s"C2 doc $i")(ccC(dP, jumpFrom = 2).count())
    }
    spark.stop()
  }
}
