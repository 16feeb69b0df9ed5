package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** Fuzzy entity resolution: blocked matching semantics, transitive
  * collapse, and the documented blocking recall caveat.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1L, "jon smith", "NY"),
    (2L, "john smith", "NY"),   // 1 insert from 1 — same block
    (3L, "john smyth", "NY"),   // 1 sub from 2, 2 edits from 1
    (4L, "mary jones", "NY"),
    (5L, "john smith", "CA"),   // exact name, WRONG block — never compared
    (6L, "maria jones", "CA")
  ).toDF("id", "name", "state")

  test("blockedPairs: edit-distance matches within a block only") {
    val got = Linkage.blockedPairs(people, $"id", $"name", $"state", maxDist = 1)
      .select($"a_id", $"b_id", $"dist").as[(Long, Long, Long)].collect().toSet
    // 1~2 (dist 1), 2~3 (dist 1); 1~3 is dist 2 → out at maxDist=1;
    // 2~5 identical names but blocked apart (the documented caveat)
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("blockedPairs: emitted dist is the exact distance, bound inclusive") {
    val got = Linkage.blockedPairs(people, $"id", $"name", $"state", maxDist = 2)
      .select($"a_id", $"b_id", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L)))
  }

  test("resolveEntities: transitive chain collapses to the min id") {
    // at maxDist=1: 1~2~3 chain (1~3 alone is 2 edits) → one entity {1,2,3}
    val got = Linkage.resolveEntities(people, $"id", $"name", $"state", 1)
      .select($"rec_id", $"entity_id", $"n_recs")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("sortedNeighborPairs matches brute-force windowed compare") {
    val vals = Seq("aaaa", "aaab", "aabb", "abbb", "bbbb", "bbbc", "cccc")
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "name")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.sorted
    val brute = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 3, sorted.size)
      if lev(sorted(i)._1, sorted(j)._1) <= 1
    } yield (sorted(i)._2, sorted(j)._2,
      lev(sorted(i)._1, sorted(j)._1).toLong)).toSet
    val got = Linkage.sortedNeighborPairs(df, $"id", $"name", $"name",
        window = 3, maxDist = 1)
      .select($"a_id", $"b_id", $"dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == brute)
  }

  test("sortedNeighborPairs: compare budget is fixed even on a degenerate cluster") {
    // 20 identical values: blocking would compare all 190 pairs; SNM
    // compares exactly (w−1)·n − (w−1)w/2 = 70 at w=5
    val df = (0L until 20L).map(i => (i, "same")).toDF("id", "name")
    val n = Linkage.sortedNeighborPairs(df, $"id", $"name", $"name", 5, 0)
      .count()
    assert(n == 70L)
  }

  test("complementary block keys compose by union (recall recovery)") {
    // name-block union state-block: 2~5 (same name, different state)
    // is recovered by blocking on the name's first token
    val byState = Linkage.blockedPairs(people, $"id", $"name", $"state", 1)
    val byToken = Linkage.blockedPairs(people, $"id", $"name",
      split($"name", " ").getItem(0), 1)
    val got = byState.union(byToken).select($"a_id", $"b_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 5L)) && got.contains((1L, 2L)))
  }
}
