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

  /** Does a single cron field match a value? Supports star, step
    * (*&#47;n), fixed numbers, ranges, and comma lists.
    */
  private def fieldMatches(field: String, value: Long): Boolean =
    field.split(",").exists {
      case "*" => true
      case st if st.startsWith("*/") => value % st.drop(2).toLong == 0
      case r if r.contains("-") =>
        val Array(a, b) = r.split("-", 2)
        val (lo, hi) = (a.takeWhile(_.isDigit).toLong, b.takeWhile(_.isDigit).toLong)
        value >= lo && value <= hi
      case n if n.forall(_.isDigit) => n.toLong == value
      case _ => false
    }

  /** Does the pattern fire at the given instant (minute + hour fields;
    * day-of-month/month/day-of-week are treated as `*`, matching the
    * reference's observed cadences)?
    */
  def matches(pattern: String, atMs: Long): Boolean = {
    require(isValid(pattern), s"invalid cron pattern: $pattern")
    val fields = pattern.trim.split("\\s+")
    val t = java.time.Instant.ofEpochMilli(atMs)
      .atZone(java.time.ZoneOffset.UTC)
    fieldMatches(fields(0), t.getMinute.toLong) &&
      fieldMatches(fields(1), t.getHour.toLong)
  }

  /** Delay in milliseconds from `nowMs` to the next minute boundary
    * (the scheduler ticks per minute and fires when [[matches]]).
    */
  def nextMinuteDelayMs(nowMs: Long): Long = 60000L - (nowMs % 60000L)
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

  /** Single-flight guarded execution (R3): returns false when a run is
    * already in flight (the 409 path) — the claim itself is the CAS, so
    * there is no check-then-act window.
    */
  private def runGuarded(): Boolean = {
    if (running.compareAndSet(false, true)) {
      try {
        lastRun.set(Some(System.currentTimeMillis()))
        run()
        runs.incrementAndGet()
      } finally running.set(false)
      true
    } else false
  }

  /** E2 — start recurring runs on a validated cron cadence
    * (`runOnInit:false` semantics: first run happens at the first
    * matching tick, not at schedule time). The executor ticks at each
    * minute boundary and fires only when the pattern matches that
    * minute — node-cron's model.
    */
  def start(cronPattern: String): Unit = synchronized {
    require(Cron.isValid(cronPattern), s"invalid cron pattern: $cronPattern")
    require(scheduled.get().isEmpty, "already scheduled")
    startTime.set(Some(System.currentTimeMillis()))
    scheduled.set(Some(exec.scheduleAtFixedRate(
      () => if (Cron.matches(cronPattern, System.currentTimeMillis())) {
        val _ = runGuarded()
      },
      Cron.nextMinuteDelayMs(System.currentTimeMillis()),
      60000L, TimeUnit.MILLISECONDS)))
  }

  /** Immediate one-shot run (the `/api/start-etl-force` path, E1).
    * Returns false — without running — when a run is already in
    * flight (the reference's 409 response, `index.js:115`).
    */
  def runOnce(): Boolean = runGuarded()

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
