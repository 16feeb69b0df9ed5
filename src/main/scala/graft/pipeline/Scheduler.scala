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

  /** The reference runs node-cron with `timezone: "Asia/Manila"`
    * (`index.js:75-86`) — matching is evaluated in that zone unless a
    * caller overrides it.
    */
  val DefaultZone: java.time.ZoneId = java.time.ZoneId.of("Asia/Manila")

  /** F11 — validate a 5-field cron pattern (minute hour dom month dow;
    * numbers, star, step, lists, ranges — the subset node-cron accepts
    * for the reference's use).
    */
  private val field = """(\*(/\d+)?|\d+(-\d+)?(/\d+)?(,\d+(-\d+)?)*)"""
  private val cronRe = s"^$field $field $field $field $field$$".r

  def isValid(pattern: String): Boolean =
    cronRe.pattern.matcher(pattern.trim).matches() &&
      !pattern.contains("/0") // a zero step can never fire (division guard)

  /** Does a single cron field match a value? Supports star, steps
    * (`*&#47;n`, `a-b/n`, `n/m` = n..max/m, Vixie-style), fixed
    * numbers, ranges, and comma lists. Step expansion starts at the
    * field's range minimum (so `*&#47;5` on day-of-month fires on the
    * 1st, 6th, …, like node-cron's range expansion — not on multiples
    * of 5).
    */
  private def fieldMatches(
      field: String, value: Int, rangeMin: Int, rangeMax: Int): Boolean =
    field.split(",").exists { part =>
      val hasStep = part.contains("/")
      val (body, step) = part.split("/", 2) match {
        case Array(b, s) => (b, s.toInt)
        case Array(b) => (b, 1)
      }
      val (lo, hi) = body match {
        case "*" => (rangeMin, rangeMax)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-", 2); (a.toInt, b.toInt)
        // Vixie: ANY "n/step" (incl. step 1) means n..max by step —
        // only a bare "n" is the single value n
        case n if hasStep => (n.toInt, rangeMax)
        case n => (n.toInt, n.toInt)
      }
      step > 0 && value >= lo && value <= hi && (value - lo) % step == 0
    }

  /** Does the pattern fire at the given instant? All five fields are
    * honored (`0 0 1 * *` fires monthly, not daily), matched in `zone`
    * (reference: Asia/Manila). Like node-cron — and unlike Vixie cron's
    * dom-OR-dow rule — restricted day-of-month AND day-of-week must
    * both match. Day-of-week accepts 0-7 with both 0 and 7 = Sunday.
    */
  def matches(
      pattern: String, atMs: Long,
      zone: java.time.ZoneId = DefaultZone): Boolean = {
    require(isValid(pattern), s"invalid cron pattern: $pattern")
    val f = pattern.trim.split("\\s+")
    val t = java.time.Instant.ofEpochMilli(atMs).atZone(zone)
    val dow = t.getDayOfWeek.getValue % 7 // java: Mon=1..Sun=7 → cron Sun=0
    fieldMatches(f(0), t.getMinute, 0, 59) &&
      fieldMatches(f(1), t.getHour, 0, 23) &&
      fieldMatches(f(2), t.getDayOfMonth, 1, 31) &&
      fieldMatches(f(3), t.getMonthValue, 1, 12) &&
      (fieldMatches(f(4), dow, 0, 7) ||
        (dow == 0 && fieldMatches(f(4), 7, 0, 7)))
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
    lastError: Option[String] = None,
)

/** Single-flight scheduled runner: at each tick, skip if the previous
  * run is still in flight (R3), record last-run time (R6), and stop
  * gracefully — let an in-flight run finish, with a force-kill timeout
  * (R7, `index.js:166-206`).
  */
final class EtlScheduler(run: () => Unit) {
  private def newExec() = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-etl-scheduler"); t.setDaemon(true); t
  })
  // recreated on start() if a force-stop ever shutdownNow'd it — a
  // stopped scheduler must stay restartable (the reference creates a
  // fresh node-cron task per start, `index.js:75`)
  private var exec = newExec()
  private val running = new AtomicBoolean(false)
  private val scheduled = new AtomicReference[Option[ScheduledFuture[_]]](None)
  private val startTime = new AtomicReference[Option[Long]](None)
  private val lastRun = new AtomicReference[Option[Long]](None)
  private val runs = new AtomicLong(0)
  private val lastError = new AtomicReference[Option[String]](None)

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
    if (exec.isShutdown) exec = newExec()
    startTime.set(Some(System.currentTimeMillis()))
    scheduled.set(Some(exec.scheduleAtFixedRate(
      () => tickOnce(cronPattern),
      Cron.nextMinuteDelayMs(System.currentTimeMillis()),
      60000L, TimeUnit.MILLISECONDS)))
  }

  /** One scheduler tick: fire when the pattern matches this minute.
    * MUST NOT throw — `scheduleAtFixedRate` permanently cancels the
    * schedule on an escaped exception while `status` would keep
    * reporting `scheduled=true`; a failing run is instead recorded in
    * [[SchedulerStatus.lastError]] and the cadence continues (the
    * reference's node-cron task survives a failed `runETLProcess` the
    * same way). Package-visible so the no-throw contract is testable
    * without waiting for a minute boundary.
    */
  private[graft] def tickOnce(cronPattern: String): Unit =
    try {
      if (Cron.matches(cronPattern, System.currentTimeMillis())) {
        val _ = runGuarded()
      }
    } catch {
      case e: Throwable => lastError.set(Some(e.toString))
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
    lastError = lastError.get(),
  )
}
