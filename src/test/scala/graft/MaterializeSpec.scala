package graft

import org.apache.spark.sql.functions._
import graft.plans.Materialize

/** Pluggable durable checkpointing (`plans.Materialize`): every
  * iterative/fan-out materialization site routes through one helper
  * that uses reliable `checkpoint()` when the SparkContext has a
  * checkpoint dir (a long-lived cluster job pointing at durable
  * storage — blocks survive executor loss) and `localCheckpoint()`
  * otherwise (local mode / tests / bench — no filesystem round-trip).
  * These tests pin: identical results in both modes for a real
  * iterative operator, actual checkpoint files in durable mode, and
  * no behavior change when the dir is unset.
  */
class MaterializeSpec extends SparkSpec {

  private def withCheckpointDir[A](body: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test harness assumes no ambient checkpoint dir")
    sc.setCheckpointDir(dir.toString)
    try body(dir)
    finally {
      sc.setCheckpointDir(null) // Option(null) => None: restores local mode
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("materialize: local mode persists blocks, durable mode writes checkpoint files") {
    import spark.implicits._
    val df = spark.range(0L, 100L).select(col("id"), (col("id") % 7).as("k"))

    // local mode: a fresh persistent RDD appears, no files anywhere
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val local = Materialize(df)
    assert(local.as[(Long, Long)].collect().sortBy(_._1).length == 100)
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.nonEmpty, "local mode must register a persistent RDD")
    fresh.foreach(id => spark.sparkContext.getPersistentRDDs
      .get(id).foreach(_.unpersist(false)))

    withCheckpointDir { dir =>
      val durable = Materialize(df)
      assert(durable.count() == 100)
      // reliable checkpoint writes part files under the dir
      val files = java.nio.file.Files.walk(dir).iterator()
      var n = 0
      while (files.hasNext) { if (java.nio.file.Files
        .isRegularFile(files.next())) n += 1 }
      assert(n > 0, "durable mode must write checkpoint files")
    }
  }

  test("connectedComponents: identical output with and without a checkpoint dir") {
    import spark.implicits._
    // two chains and a triangle — exercises multiple star rounds
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L),
    ).toDF("a", "b")
    val localMode = graft.functions.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    val durableMode = withCheckpointDir { _ =>
      graft.functions.Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().sorted.toSeq
    }
    assert(localMode == durableMode)
    assert(localMode.nonEmpty &&
      localMode.filter(_._2 == 1L).map(_._1).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("hits: identical scores with and without a checkpoint dir") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val localMode = graft.operators.Graphs.hits(edges, iters = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val durableMode = withCheckpointDir { _ =>
      graft.operators.Graphs.hits(edges, iters = 3)
        .as[(Long, Long, Long)].collect().sorted.toSeq
    }
    assert(localMode == durableMode && localMode.nonEmpty)
  }
}
