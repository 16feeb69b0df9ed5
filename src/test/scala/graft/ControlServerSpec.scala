package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sinks
import graft.pipeline.{ControlServer, EtlScheduler}

/** The HTTP control surface end to end over a live ephemeral-port
  * server: lifecycle endpoints (start/stop/force with the reference's
  * 400/409 arms), status/health, log read/truncate, and the SSE tail
  * stream incl. the `clear` broadcast. No SparkSession needed — this
  * is pure control plane.
  */
class ControlServerSpec extends AnyFunSuite {

  private def call(
      port: Int, method: String, path: String, body: Option[String] = None)
      : (Int, String) = {
    val con = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    con.setRequestMethod(method)
    con.setConnectTimeout(5000)
    con.setReadTimeout(10000)
    body.foreach { b =>
      con.setDoOutput(true)
      con.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = con.getResponseCode
    val is = if (code >= 400) con.getErrorStream else con.getInputStream
    val text = if (is == null) "" else new String(is.readAllBytes(), StandardCharsets.UTF_8)
    con.disconnect()
    (code, text)
  }

  test("lifecycle: start/duplicate-start/status/stop/force with reference codes") {
    val log = java.nio.file.Files.createTempFile("graft-ctl", ".log").toString
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sched = new EtlScheduler(() => { val _ = runs.incrementAndGet() })
    val srv = new ControlServer(sched, log).start()
    val p = srv.boundPort
    try {
      val (hc, hb) = call(p, "GET", "/health")
      assert(hc == 200 && hb.contains("\"healthy\"") && hb.contains("stopped"))

      assert(call(p, "GET", "/api/etl-status")._2.contains("\"isRunning\":false"))

      // bad body / bad pattern
      assert(call(p, "POST", "/api/start-etl", Some(""))._1 == 400)
      assert(call(p, "POST", "/api/start-etl",
        Some("""{"schedule":"not a cron"}"""))._1 == 400)

      val (sc, sb) = call(p, "POST", "/api/start-etl",
        Some("""{"schedule":"*/5 * * * *"}"""))
      assert(sc == 200 && sb.contains("Asia/Manila"))
      assert(call(p, "POST", "/api/start-etl",
        Some("""{"schedule":"* * * * *"}"""))._1 == 400) // already running
      val st = call(p, "GET", "/api/etl-status")._2
      assert(st.contains("\"isRunning\":true") && st.contains("*/5 * * * *"))

      // force is refused while the scheduler runs (reference arm)
      assert(call(p, "POST", "/api/start-etl-force")._1 == 400)

      val (stc, stb) = call(p, "POST", "/api/stop-etl")
      assert(stc == 200 && stb.contains("*/5 * * * *"))
      assert(call(p, "POST", "/api/stop-etl")._1 == 400) // not running

      // lifecycle endpoints are POST-only: a GET must not mutate state
      assert(call(p, "GET", "/api/start-etl-force")._1 == 405)
      assert(call(p, "GET", "/api/stop-etl")._1 == 405)
      assert(runs.get() == 0)

      // force now actually runs the wired function
      val (fc, fb) = call(p, "POST", "/api/start-etl-force")
      assert(fc == 200 && fb.contains("completed successfully"))
      assert(runs.get() == 1)
    } finally srv.stop()
  }

  test("force returns 409 when a run is in flight (single-flight, R3)") {
    val log = java.nio.file.Files.createTempFile("graft-ctl2", ".log").toString
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sched = new EtlScheduler(() => { entered.countDown(); gate.await() })
    val srv = new ControlServer(sched, log).start()
    try {
      val t = new Thread(() => { val _ = sched.runOnce() })
      t.start()
      entered.await()
      assert(call(srv.boundPort, "POST", "/api/start-etl-force")._1 == 409)
      gate.countDown(); t.join()
    } finally srv.stop()
  }

  test("logs: read newest-first, truncate, SSE stream with log + clear events") {
    val log = java.nio.file.Files.createTempFile("graft-ctl3", ".log").toString
    val srv = new ControlServer(new EtlScheduler(() => ()), log).start()
    val p = srv.boundPort
    try {
      Sinks.appendLog(log, "first message", nowMs = 1714700000000L)
      Sinks.appendLog(log, "second message", nowMs = 1714700002000L)
      val (lc, lb) = call(p, "GET", "/api/logs")
      assert(lc == 200 && lb.contains("\"count\":2"))
      assert(lb.indexOf("second message") < lb.indexOf("first message")) // newest first
      // logs must be a real JSON ARRAY of objects, not a quoted string
      assert(lb.contains("\"logs\":[{\"timestamp\""), lb)

      // SSE: connect, then append → log event, truncate → clear event
      val con = URI.create(s"http://127.0.0.1:$p/api/logs/stream").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      con.setReadTimeout(15000)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(con.getInputStream, StandardCharsets.UTF_8))
      def readUntil(marker: String): String = {
        val sb = new StringBuilder
        var line = reader.readLine()
        while (line != null && !sb.toString.contains(marker)) {
          sb.append(line).append('\n')
          if (sb.toString.contains(marker)) () else line = reader.readLine()
        }
        sb.toString
      }
      assert(readUntil("event: connected").nonEmpty)
      Sinks.appendLog(log, "streamed line", nowMs = 1714700004000L)
      val got = readUntil("streamed line")
      assert(got.contains("event: log"))

      assert(call(p, "DELETE", "/api/logs")._1 == 200)
      assert(readUntil("event: clear").nonEmpty)
      assert(call(p, "GET", "/api/logs")._2.contains("\"count\":0"))
      con.disconnect()
    } finally srv.stop()
  }
}
