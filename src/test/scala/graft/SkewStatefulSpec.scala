package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cooccur, Skew}
import graft.streaming.Streams

/** Skew utilities and stateful streaming dedup. */
class SkewStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("Cooccur.pairCounts: exact pairs, dup-items collapse, cap bounds the hot basket") {
    val rows = Seq(
      (1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L), // basket 1: {10,20,30}
      (2L, 10L), (2L, 20L),                       // basket 2: {10,20}
      (3L, 99L),                                  // loner: no pairs
    ).toDF("b", "item")
    val got = Cooccur.pairCounts(rows, $"b", $"item", cap = 32)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((10L, 20L) -> 2L, (10L, 30L) -> 1L, (20L, 30L) -> 1L))

    // pathological basket: 100 items capped to 5 → C(5,2) = 10 pairs,
    // and the kept prefix is the 5 SMALLEST items (sorted, deterministic)
    val hot = (1 to 100).map(i => (7L, i.toLong)).toDF("b", "item")
    val capped = Cooccur.pairCounts(hot, $"b", $"item", cap = 5)
      .as[(Long, Long, Long)].collect()
    assert(capped.length == 10)
    assert(capped.flatMap(r => Seq(r._1, r._2)).toSet == (1L to 5L).toSet)
  }

  test("saltedJoin equals plain join on skewed data (inner + left)") {
    // hot key: 5k rows on one key, trickle on others
    val fact = spark.range(0, 5000).select(lit(1L).as("k"), $"id".as("v"))
      .union(spark.range(0, 100).select(($"id" % 10 + 2).as("k"), $"id".as("v")))
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k"), "inner")
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 8, "inner")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCountSum equals direct groupBy aggregation") {
    val df = spark.range(0, 10000)
      .select(($"id" % 3).as("k"), ($"id" % 7).cast("double").as("x"))
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"x").as("total"))
    val salted = Skew.saltedCountSum(df, "k", Some("x"), factor = 16)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("saltedJoin rejects dim-duplicating join types") {
    val fact = Seq((1L, 1)).toDF("k", "v")
    val dim = Seq((1L, "a")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", 4, "full_outer")
    }
    // left_anti is fact-preserving and allowed
    assert(Skew.saltedJoin(fact, dim, "k", 4, "left_anti").count() == 0)
  }

  test("partitionByLogRange spreads a dense log over N partitions") {
    val log = spark.range(0, 1000).select($"id".as("log_id"))
    val parts = Skew.partitionByLogRange(log, 8)
    assert(parts.rdd.getNumPartitions == 8)
    val sizes = parts.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(s => s > 50 && s < 250)) // roughly even
  }

  test("withPerGroupIndex: equals the grouped window, and NULL groups are indexed, not dropped") {
    val df = Seq(
      (1L, java.lang.Long.valueOf(10L)), (2L, java.lang.Long.valueOf(10L)),
      (3L, java.lang.Long.valueOf(20L)), (4L, null.asInstanceOf[java.lang.Long]),
      (5L, null.asInstanceOf[java.lang.Long]), (6L, java.lang.Long.valueOf(20L)),
    ).toDF("id", "g")
    val got = Skew.withPerGroupIndex(df, "g", Seq(col("id")), "idx")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))).toSet
    // the null group is a group like any other (the offset join is
    // null-safe); a === join would silently drop ids 4 and 5
    assert(got == Set(
      (1L, 10L, 1L), (2L, 10L, 2L),
      (3L, 20L, 1L), (6L, 20L, 2L),
      (4L, -1L, 1L), (5L, -1L, 2L)), got)
    // the delegated groupless form: exact 1..n over the total order,
    // count returned for free
    val (gidx, n) = Skew.withGlobalIndex(
      spark.range(0, 100).toDF("id"), Seq(col("id").desc), "rk")
    assert(n == 100L)
    val pairs = gidx.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L until 100L).forall(i => pairs(i) == 100L - i))
  }

  test("firstSeenKeys: stateful dedup emits each key once across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-state-ckpt").toString
    Seq((1L, "R1"), (2L, "R2"), (3L, "R1"))
      .toDF("log_id", "rsbsa_no").write.parquet(s"$dir/b1.parquet")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("log_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rsbsa_no",
        org.apache.spark.sql.types.StringType)))
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    def runOnce(): Set[(Long, String)] = {
      emitted.clear()
      val stream = spark.readStream.schema(schema).parquet(s"$dir/*")
      val q = Streams.firstSeenKeys(stream)
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, String)], _: Long) =>
          batch.collect().foreach(emitted.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      import scala.jdk.CollectionConverters._
      emitted.asScala.toSet
    }
    val out1 = runOnce()
    assert(out1 == Set((1L, "R1"), (2L, "R2"))) // R1 emitted once, min log_id
    // second batch: R1 again (suppressed by state) + new R3
    Seq((4L, "R1"), (5L, "R3"))
      .toDF("log_id", "rsbsa_no").write.parquet(s"$dir/b2.parquet")
    val out2 = runOnce()
    assert(out2.contains((5L, "R3")))
    assert(!out2.contains((4L, "R1"))) // state survived the restart
  }
}
