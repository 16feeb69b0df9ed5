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

  test("EtlRun.run (file mode): merge targets identical with and without a checkpoint dir") {
    import spark.implicits._
    // the reference-parity lifecycle (extract → normalize → merge →
    // cascade) under setCheckpointDir: every Materialize site inside
    // the run takes the reliable-checkpoint path and the published
    // targets must be row-identical to local mode
    def writeFixtures(dir: String): Unit = {
      Seq(("R1", "juan", "cruz"), ("R2", "maria", "santos"),
          ("R3", "jose", "reyes"))
        .toDF("rsbsa_no", "first_name", "surname")
        .write.parquet(s"$dir/farmers_kyc1.parquet")
      Seq(("R1", "farming"), ("R1", "fishing"), ("R2", "farming"))
        .toDF("rsbsa_no", "livelihood")
        .write.parquet(s"$dir/farmers_livelihood.parquet")
      Seq(("P1", "R1", "owner"), ("P2", "R1", "tenant"),
          ("P3", "R2", "owner"))
        .toDF("parcel_id", "rsbsa_no", "own_status")
        .write.parquet(s"$dir/farmparcelownership.parquet")
      Seq(("P1", "lot a"), ("P2", "lot b"), ("P3", "lot c"),
          ("P4", "lot d"))
        .toDF("parcel_id", "desc_location")
        .write.parquet(s"$dir/farmparcel.parquet")
    }
    val log = Seq(
      (1L, "R1", "farmers_kyc1"),
      (2L, "R1", "farmers_livelihood"),
      (3L, "R1", "farmparcelownership"),
      (4L, "R2", "farmers_kyc1"),
    ).toDF("log_id", "rsbsa_no", "table")
    def runOnce(): (graft.pipeline.RunReport, Map[String, Seq[String]]) = {
      val src = java.nio.file.Files.createTempDirectory("graft-detl-s").toString
      val tgt = java.nio.file.Files.createTempDirectory("graft-detl-t").toString
      writeFixtures(src)
      val report = graft.pipeline.EtlRun.onParquet(spark, src, tgt).run(log)
      val tables = Seq("farmers_kyc1", "farmers_livelihood",
        "farmparcelownership", "farmparcel")
      (report, tables.map(t => t -> spark.read
        .parquet(s"$tgt/$t.parquet")
        .collect().map(_.toString).sorted.toSeq).toMap)
    }
    val (localReport, localTargets) = runOnce()
    assert(localReport.errors == 0)
    // NOTE: unlike the flagship above, the ETL lifecycle contains NO
    // lineage-truncation sites — each table is ONE declarative plan
    // (extract → normalize → merge → atomic publish) recomputable from
    // its parquet leaves, so executor-loss resilience is Spark-native
    // and durable mode writes no checkpoint files. The contract being
    // pinned is behavioral: setting a checkpoint dir must not CHANGE
    // anything the run publishes.
    val (durReport, durTargets) = withCheckpointDir { _ => runOnce() }
    assert(durReport.errors == 0)
    assert(durReport.processed == localReport.processed)
    assert(durReport.tables.map(t => (t.table, t.extracted, t.merged)).toSet
      == localReport.tables.map(t => (t.table, t.extracted, t.merged)).toSet)
    assert(durTargets == localTargets,
      s"merge targets diverged between modes:\n local=$localTargets\n durable=$durTargets")
  }
}
