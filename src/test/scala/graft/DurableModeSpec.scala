package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Durable-mode END-TO-END evidence (the round-10 gap: MaterializeSpec
  * proves two operators identical under a checkpoint dir, but a
  * 1000-executor job lives in the COMPOSED flagships): the full
  * pretraining-prep flagship and a streaming restart both run with
  * `setCheckpointDir` set — every `Materialize` site inside them takes
  * the reliable-checkpoint path — and must produce output
  * hash-identical to local mode. Whole suite (flagship both modes +
  * the restart stream) runs in ~21 s at sf0.001 on the test harness:
  * the reliable checkpoints add one filesystem round-trip per
  * materialization, the price of executor-loss survival at cluster
  * scale.
  */
class DurableModeSpec extends SparkSpec {

  private def withCheckpointDir[A](body: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dur")
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test harness assumes no ambient checkpoint dir")
    sc.setCheckpointDir(dir.toString)
    try body(dir)
    finally {
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("prepare_pretraining_full: identical output with and without a checkpoint dir") {
    val sf = "/root/testdata/sf0.001"
    def run(): Seq[String] =
      SparkEntry.queries("prepare_pretraining_full")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    val localMode = run()
    assert(localMode.nonEmpty, "flagship must keep documents at sf0.001")
    val durableMode = withCheckpointDir { dir =>
      val out = run()
      // the composed plan really took the reliable-checkpoint path
      val files = java.nio.file.Files.walk(dir).iterator()
      var n = 0
      while (files.hasNext) { if (java.nio.file.Files
        .isRegularFile(files.next())) n += 1 }
      assert(n > 0, "durable mode must write checkpoint files")
      out
    }
    assert(localMode == durableMode)
  }

  test("packStream restart with a durable checkpoint dir: layout still equals batch") {
    import spark.implicits._
    withCheckpointDir { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-dpack").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-dpack-ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-dpack-out").toString
      val rows = (0L until 30L).map(i =>
        (i, Seq(300L, 700L, 1100L, 2500L, 100L)(i.toInt % 5)))
      val toksDf = rows.toDF("doc_id", "n_tokens")
      val buckets = 3
      val width = math.max(1L, rows.map(_._1).max / buckets + 1)
      val schema = toksDf.schema
      def start() = Streams.packStream(
          spark.readStream.schema(schema).parquet(s"$dir/*"),
          seqLen = 2048, width = width)
        .toDF()
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      val q1 = start()
      try {
        rows.take(18).toDF("doc_id", "n_tokens")
          .coalesce(1).write.parquet(s"$dir/b1.parquet")
        q1.processAllAvailable()
      } finally q1.stop()
      rows.drop(18).toDF("doc_id", "n_tokens")
        .coalesce(1).write.parquet(s"$dir/b2.parquet")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .as[graft.functions.Packing.PackedDoc].collect().toSet
      val batch = graft.functions.Packing
        .packNoSplitCounts(toksDf, seqLen = 2048, buckets = buckets)
        .as[graft.functions.Packing.PackedDoc].collect().toSet
      assert(got == batch)
      assert(batch.exists(_.seq_in_bucket >= 2))
    }
  }
}
