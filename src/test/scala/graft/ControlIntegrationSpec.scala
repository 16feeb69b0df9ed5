package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.pipeline.{ControlServer, EtlRun, EtlScheduler, RunReport}

/** The reference's full lifecycle over HTTP: a forced run through the
  * control surface executes a REAL Spark ETL (extract → normalize →
  * merge → cascade → atomic publish) and reports its counts in the
  * response — `index.js:114-164` end to end.
  */
class ControlIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("POST /api/start-etl-force drives a real ETL run and reports counts") {
    val src = java.nio.file.Files.createTempDirectory("graft-ci-src").toString
    val tgt = java.nio.file.Files.createTempDirectory("graft-ci-tgt").toString
    Seq(("R1", "juan", "cruz"), ("R2", "maria", "santos"))
      .toDF("rsbsa_no", "first_name", "surname")
      .write.parquet(s"$src/farmers_kyc1.parquet")
    val log = Seq((1L, "R1", "farmers_kyc1"), (2L, null, "farmers_kyc1"))
      .toDF("log_id", "rsbsa_no", "table")

    val run = EtlRun.onParquet(spark, src, tgt)
    @volatile var last: Option[RunReport] = None
    val sched = new EtlScheduler(() => { last = Some(run.run(log)) })
    val logFile = java.nio.file.Files.createTempFile("graft-ci", ".log").toString
    val srv = new ControlServer(sched, logFile, lastReport = () => last).start()
    try {
      val con = URI.create(
        s"http://127.0.0.1:${srv.boundPort}/api/start-etl-force").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      con.setRequestMethod("POST")
      con.setReadTimeout(120000)
      val code = con.getResponseCode
      val body = new String(con.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(code == 200, body)
      assert(body.contains("\"processed\":1") && body.contains("\"skipped\":1"), body)
      // the run actually published the merged target
      val merged = spark.read.parquet(s"$tgt/farmers_kyc1.parquet")
      assert(merged.count() == 1)
      assert(merged.select("first_name").as[String].head() == "JUAN")
    } finally srv.stop()
  }
}
