package graft

import graft.operators.Sinks
import graft.pipeline.{Cron, EtlScheduler}

/** Control-plane semantics (R1/R3/R6/R7/F11) and sink surfaces (K1/K4/K5). */
class SchedulerSinksSpec extends SparkSpec {
  import spark.implicits._

  test("cron validation accepts the reference's patterns, rejects junk (F11)") {
    assert(Cron.isValid("* * * * *"))
    assert(Cron.isValid("*/5 * * * *"))
    assert(Cron.isValid("0 3 * * 1"))
    assert(Cron.isValid("0,30 1-5 * * *"))
    assert(!Cron.isValid("not a cron"))
    assert(!Cron.isValid("* * * *"))       // 4 fields
    assert(!Cron.isValid("61x * * * *"))
  }

  test("single-flight: overlapping runOnce is refused (R3)") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sched = new EtlScheduler(() => { entered.countDown(); gate.await() })
    val t = new Thread(() => sched.runOnce())
    t.start()
    entered.await()
    assert(!sched.runOnce()) // refused while in flight
    assert(sched.status.running)
    gate.countDown(); t.join()
    assert(!sched.status.running)
    assert(sched.status.runsCompleted == 1)
    assert(sched.runOnce()) // accepted after completion
  }

  test("cron matching honors minute/hour fields (fires on cadence, not every minute)") {
    def ms(h: Int, m: Int): Long =
      java.time.LocalDateTime.of(2026, 8, 12, h, m)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    assert(Cron.matches("*/5 * * * *", ms(3, 10)))
    assert(!Cron.matches("*/5 * * * *", ms(3, 11)))
    assert(Cron.matches("0 3 * * 1", ms(3, 0)))
    assert(!Cron.matches("0 3 * * 1", ms(4, 0)))
    assert(!Cron.matches("0 3 * * 1", ms(3, 1)))
    assert(Cron.matches("0,30 1-5 * * *", ms(2, 30)))
    assert(!Cron.matches("0,30 1-5 * * *", ms(6, 30)))
    assert(Cron.matches("* * * * *", ms(23, 59)))
  }

  test("status bookkeeping + graceful stop (R6/R7)") {
    val sched = new EtlScheduler(() => ())
    val s0 = sched.status
    assert(!s0.scheduled && s0.lastRunMs.isEmpty && s0.runsCompleted == 0)
    sched.runOnce()
    assert(sched.status.lastRunMs.isDefined)
    sched.start("*/5 * * * *")
    assert(sched.status.scheduled && sched.status.startTimeMs.isDefined)
    val after = sched.stop()
    assert(!after.scheduled && !after.running)
  }

  test("ensureTable creates declared-schema targets once (K4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ddl").toString
    Sinks.ensureCatalogTable(spark, dir, "farmparcel")
    val df = spark.read.parquet(s"$dir/farmparcel.parquet")
    // parquet read-back is always nullable — compare names + types
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == graft.schema.Catalog.farmparcelSchema.fields
        .map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() == 0)
    Sinks.ensureCatalogTable(spark, dir, "farmparcel") // idempotent
    // reserved-word column name round-trips (bulk-insert quoting, K1/P9)
    assert(df.columns.contains("long"))
  }

  test("append sink + append log (K1/K5) feed the log-analytics parse (S9)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    Sinks.append(Seq((1, "a")).toDF("id", "v"), s"$dir/t.parquet")
    Sinks.append(Seq((2, "b")).toDF("id", "v"), s"$dir/t.parquet")
    assert(spark.read.parquet(s"$dir/t.parquet").count() == 2)

    val log = s"$dir/run.log"
    Sinks.appendLog(log, "Starting ETL process. Total records: 8",
      nowMs = 1714700000000L)
    Sinks.appendLog(log, "ETL process completed. Processed: 17, Skipped: 0",
      nowMs = 1714700002000L)
    val parsed = sources.Readers.logLines(spark, log).collect()
    assert(parsed.length == 2)
    assert(parsed(0).getString(0).endsWith("+08:00")) // Manila offset (F5)
    assert(parsed(1).getString(1).contains("Processed: 17"))
  }
}
