package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.plans.GraftFunctions

/** Native Catalyst expressions: agreement with the HOF formulations,
  * null handling, SQL registration, codegen execution.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("graft_dot / graft_norm_sq agree with the interpreted HOF versions") {
    val q = embs.select($"vec_id", Similarity.quantized($"embedding").as("q"))
    val both = q.select(
      $"vec_id",
      Similarity.intNormSq($"q").as("hof"),
      GraftFunctions.normSq(spark, $"q").as("native"))
    assert(both.filter($"hof" =!= $"native").count() == 0)

    val pairs = q.limit(10).crossJoin(
      q.limit(10).select($"q".as("q2"), $"vec_id".as("v2")))
    val dots = pairs.select(
      Similarity.intDot($"q", $"q2").as("hof"),
      GraftFunctions.dot(spark, $"q", $"q2").as("native"))
    assert(dots.filter($"hof" =!= $"native").count() == 0)
  }

  test("null inputs yield null (nullSafeEval contract)") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(3L, 4L))),
    ).toDF("a", "b")
    val out = df.select(
      GraftFunctions.dot(spark, $"a", $"b").as("d"),
      GraftFunctions.normSq(spark, $"a").as("n"))
    val rows = out.collect()
    assert(rows(0).getLong(0) == 11L && rows(0).getLong(1) == 5L)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("graft_hamming64 counts differing bits") {
    GraftFunctions.register(spark)
    val df = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    val h = df.select(GraftFunctions.hamming64(spark, $"a", $"b").as("h"))
      .as[Long].collect()
    assert(h.sameElements(Array(64L, 1L, 0L)))
  }

  test("functions are SQL-callable after registration (extensions path)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
      "graft_norm_sq(array(3L,4L)) AS n, graft_hamming64(1L, 3L) AS h")
      .head()
    assert(r.getLong(0) == 32L && r.getLong(1) == 25L && r.getLong(2) == 1L)
  }

  test("topk results unchanged after switching to native expressions") {
    val topk = Similarity.bruteForceTopK(embs, Seq(0L, 1L), 5).collect()
    assert(topk.length == 10)
    // deterministic spot value: cosine within [-1,1], ranks 1..5
    assert(topk.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }
}
