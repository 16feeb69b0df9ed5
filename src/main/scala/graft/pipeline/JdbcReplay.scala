package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offset-tracked incremental replay over a JDBC change-log TABLE —
  * the reference's actual cron+replay loop (`services/etlService.js:
  * 694-735` reading the MySQL `etl_changelog`, `models/EtlLogger.js:
  * 8-13`), where the file-based [[graft.streaming.Streams.changeLogStream]]
  * covers the directory-of-parquet shape.
  *
  * Each [[tick]] is one micro-batch:
  *   1. read the durable high-water mark (a tiny atomic file — the
  *      engine-side equivalent of the reference keeping its offset in
  *      the log table itself);
  *   2. scan the remote change-log WHERE `log_id > mark` — a range
  *      predicate the JDBC source pushes into the remote SQL, so a
  *      tick's cost is O(new rows), never O(log);
  *   3. snapshot the batch's upper bound (max log_id) and re-bound the
  *      scan with `log_id <= hi`: [[EtlRun.run]] executes several jobs
  *      over the batch (count, table list, per-table extracts), and
  *      rows INSERTED CONCURRENTLY by the source application must not
  *      straddle them half-processed — they belong to the next tick;
  *   4. run the full per-table merge lifecycle on the bounded batch;
  *   5. advance the mark only when every table merged cleanly —
  *      otherwise the whole batch replays next tick. At-least-once is
  *      safe here BY CONSTRUCTION: the merge is a keyed
  *      delete-then-insert ([[graft.sources.Jdbc.refresh]]), so
  *      replaying a batch is idempotent (same keys, same final rows).
  *
  * Single-flight/cron composition: schedule `tick(...)` with
  * [[Scheduler]] (R1/R3) exactly like any other job — the tick itself
  * is synchronous and stateless apart from the offset file.
  */
object JdbcReplay {

  /** One tick's outcome: the offset window it covered and the run
    * report (None = nothing new).
    */
  final case class Tick(fromOffset: Long, toOffset: Long, report: Option[RunReport]) {
    def advanced: Boolean = toOffset > fromOffset
  }

  /** The durable high-water mark; 0 before the first tick. */
  def readOffset(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def writeOffset(path: String, v: Long): Unit = {
    val p = java.nio.file.Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Process every change-log row that arrived since the last tick.
    *
    * @param logUrl     JDBC url of the database holding the change-log
    * @param logTable   change-log table (log_id BIGINT, rsbsa_no, table, …)
    * @param etl        the runner the batch drives (e.g. [[EtlRun.onJdbc]])
    * @param offsetPath durable high-water-mark file
    */
  def tick(
      spark: SparkSession, logUrl: String, logTable: String,
      etl: EtlRun, offsetPath: String,
      options: Map[String, String] = Map.empty): Tick = {
    val last = readOffset(offsetPath)
    val fresh = graft.sources.Jdbc.table(spark, logUrl, logTable, options)
      .filter(col("log_id") > last)
    val mx = fresh.agg(max(col("log_id"))).head()
    if (mx.isNullAt(0)) Tick(last, last, None)
    else {
      val hi = mx.getLong(0)
      val report = etl.run(fresh.filter(col("log_id") <= hi))
      if (report.errors == 0) writeOffset(offsetPath, hi)
      Tick(last, hi, Some(report))
    }
  }
}
