package graft.pipeline

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

/** Run scheduling + bookkeeping (SURVEY.md §2.8 R1, R3, R6, R7; §2.7
  * F11; §3 E2).
  *
  * The reference schedules ETL runs with node-cron, guards against
  * overlapping runs with a single-flight flag, tracks
  * start/last-run/uptime/status, and stops gracefully
  * (`index.js:25-206`). Engine equivalent for batch mode: a driver-side
  * scheduler with the same semantics (streaming mode gets these for
  * free from Structured Streaming's single query + listener — see
  * [[graft.streaming.Streams]]).
  */
object Cron {

  /** F11 — validate a 5-field cron pattern (minute hour dom month dow;
    * numbers, star, step, lists, ranges — the subset node-cron accepts
    * for the reference's use).
    */
  private val field = """(\*(/\d+)?|\d+(-\d+)?(/\d+)?(,\d+(-\d+)?)*)"""
  private val cronRe = s"^$field $field $field $field $field$$".r

  def isValid(pattern: String): Boolean =
    cronRe.pattern.matcher(pattern.trim).matches()

  /** Minimal next-fire computation for step-minute and fixed-minute
    * patterns (the cadences the reference is run at). Returns a delay
    * in milliseconds from `nowMs`.
    */
  def nextDelayMs(pattern: String, nowMs: Long): Long = {
    require(isValid(pattern), s"invalid cron pattern: $pattern")
    val minuteField = pattern.trim.split("\\s+")(0)
    val nowMin = (nowMs / 60000L) % 60
    val next: Long = minuteField match {
      case "*" => 1L
      case s if s.startsWith("*/") =>
        val n = s.drop(2).toLong
        n - (nowMin % n)
      case s if s.forall(_.isDigit) =>
        val m = s.toLong
        val d = (m - nowMin + 60) % 60
        if (d == 0) 60 else d
      case _ => 1L
    }
    next * 60000L - (nowMs % 60000L)
  }
}

/** Status snapshot (R6: `GET /api/etl-status`, `index.js:329-342`). */
final case class SchedulerStatus(
    running: Boolean,
    scheduled: Boolean,
    startTimeMs: Option[Long],
    lastRunMs: Option[Long],
    runsCompleted: Long,
    uptimeMs: Long,
)

/** Single-flight scheduled runner: at each tick, skip if the previous
  * run is still in flight (R3), record last-run time (R6), and stop
  * gracefully — let an in-flight run finish, with a force-kill timeout
  * (R7, `index.js:166-206`).
  */
final class EtlScheduler(run: () => Unit) {
  private val exec = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-etl-scheduler"); t.setDaemon(true); t
  })
  private val running = new AtomicBoolean(false)
  private val scheduled = new AtomicReference[Option[ScheduledFuture[_]]](None)
  private val startTime = new AtomicReference[Option[Long]](None)
  private val lastRun = new AtomicReference[Option[Long]](None)
  private val runs = new AtomicLong(0)

  private def tick(): Unit = {
    if (running.compareAndSet(false, true)) { // single-flight guard (R3)
      try {
        lastRun.set(Some(System.currentTimeMillis()))
        run()
        runs.incrementAndGet()
      } finally running.set(false)
    }
  }

  /** E2 — start recurring runs on a validated cron cadence
    * (`runOnInit:false` semantics: first run happens at the first
    * tick, not at schedule time).
    */
  def start(cronPattern: String): Unit = synchronized {
    require(Cron.isValid(cronPattern), s"invalid cron pattern: $cronPattern")
    require(scheduled.get().isEmpty, "already scheduled")
    startTime.set(Some(System.currentTimeMillis()))
    val periodMs = math.max(60000L,
      Cron.nextDelayMs(cronPattern, System.currentTimeMillis()))
    scheduled.set(Some(exec.scheduleAtFixedRate(
      () => tick(), periodMs, 60000L, TimeUnit.MILLISECONDS)))
  }

  /** Immediate one-shot run (the `/api/start-etl-force` path, E1). */
  def runOnce(): Boolean = {
    if (running.get()) false // 409: already running
    else { tick(); true }
  }

  /** R7 — graceful stop: cancel the schedule, wait for the in-flight
    * run up to `graceMs`, then force-terminate the executor.
    */
  def stop(graceMs: Long = 10000L): SchedulerStatus = synchronized {
    scheduled.get().foreach(_.cancel(false))
    scheduled.set(None)
    val deadline = System.currentTimeMillis() + graceMs
    while (running.get() && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    if (running.get()) exec.shutdownNow()
    status
  }

  def status: SchedulerStatus = SchedulerStatus(
    running = running.get(),
    scheduled = scheduled.get().isDefined,
    startTimeMs = startTime.get(),
    lastRunMs = lastRun.get(),
    runsCompleted = runs.get(),
    uptimeMs = startTime.get()
      .map(System.currentTimeMillis() - _).getOrElse(0L),
  )
}
