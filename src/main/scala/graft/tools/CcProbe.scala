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

    // equality check once per graph
    for ((nm, pairs) <- Seq("er" -> erPairs, "doc" -> docPairs)) {
      val a = graft.functions.Dedup.connectedComponents(pairs)
      val b = ccB(pairs)
      val same = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      println(s"$nm: A == B: $same")
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
      val dP = graft.functions.Dedup
        .ngramJaccardPairs(docs, w = 3, threshold = 0.5)
        .select("a_id", "b_id").materialize()
      time(s"A doc $i")(graft.functions.Dedup.connectedComponents(dP).count())
      time(s"B doc $i")(ccB(dP).count())
    }
    spark.stop()
  }
}
