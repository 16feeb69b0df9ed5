package graft

import graft.operators.Profile

/** Single-pass DQ profiler semantics: null counting, distinct
  * counting (null-excluding, both engines' convention), one row per
  * profiled column.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, and distincts per column in one result") {
    val d = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("b"))).toDF("x", "s")
    val got = Profile.profile(d, Seq("x", "s"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "x" -> ((4L, 1L, 2L)), // countDistinct excludes the null
      "s" -> ((4L, 1L, 2L))))
  }

  test("profile of an empty frame yields zero rows per column, not no rows") {
    val d = Seq.empty[(Option[Int], Option[String])].toDF("x", "s")
    val got = Profile.profile(d, Seq("x", "s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("x", 0L, 0L, 0L), ("s", 0L, 0L, 0L)))
  }
}
