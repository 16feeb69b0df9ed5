package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Trustworthiness (this is a measurement tool, its numbers must be
  * reproducible run-to-run):
  *  - each query gets one untimed warm-up execution (whole-stage-codegen
  *    compilation + JVM JIT are ~seconds per plan regardless of data
  *    size and would swamp the engine cost being compared);
  *  - queries are isolated from each other with a System.gc() between
  *    them, so one allocation-heavy query's collection debt isn't
  *    billed to its alphabetical neighbors (a 140 s phantom was once
  *    recorded for a query that reruns standalone in 3 s);
  *  - leftover persistent RDDs are unpersisted between queries:
  *    iterative operators (connected components) localCheckpoint per
  *    round, and the FINAL round's blocks are freed only by the async
  *    ContextCleaner after a driver GC — without the explicit sweep
  *    those blocks pile up across the suite and tax later queries'
  *    executor memory (the suspected cause of a 2x phantom on
  *    prepare_pretraining in round 4 that never reproduced standalone);
  *  - coverage is asserted: a registered query that somehow produced
  *    no timing entry is reported in "errors" instead of silently
  *    shrinking the suite;
  *  - each query is timed at least twice and the BEST time is reported;
  *    if the two samples disagree by more than 2x a third is taken.
  *    Min-of-N is the stable estimator on a noisy shared host — the
  *    minimum is the run least perturbed by external interference;
  *  - failures are never folded into timings: a failing query reports
  *    -1 with the exception recorded in an "errors" JSON field instead
  *    of being silently swallowed.
  *
  * Residual noise floor (measured, round 6): this VM shares a host,
  * and multi-minute host-side events can inflate EVERY sample of the
  * queries that fall inside the window by 2-6x — min-of-N cannot
  * defend when the whole window is slow (a 16.9 s full-suite reading
  * for dedup_cosine_components re-ran at 3.3 s standalone minutes
  * later, with identical code and heap). Cross-round comparisons
  * should therefore bisect suspicious per-query jumps with
  * [[BenchOne]] (same isolation sweep, standalone JVM) before
  * treating them as regressions.
  */
object Bench {

  /** Registered queries that lack a timing entry — must be empty; the
    * only guard against a refactor silently dropping suite coverage.
    */
  def missingCoverage(timedNames: Set[String]): Set[String] =
    SparkEntry.queries.keySet -- timedNames

  /** Constant-work noise canary: a fixed CPU-bound in-memory probe (no
    * I/O, no data shuffle — 2B xxhash64 rows folded to one bit_xor)
    * timed FIRST and LAST around the suite with the same warm-up +
    * min-of-N protocol as the queries. Its cost depends only on host
    * CPU availability, so a round-over-round inflation of the canary
    * is host noise, not a code regression — per-query times are also
    * reported normalized (raw / mean canary), making cross-round
    * totals comparable without a standalone BenchOne bisect (the r6
    * artifact inflated 1.36x uniformly and needed manual adjudication).
    */
  def canary(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
    def work(): Unit = {
      spark.range(0L, 2000000000L, 1L, 64)
        .select(xxhash64(col("id")).as("h"))
        .agg(bit_xor(col("h"))).collect(); ()
    }
    // deeper warm-up than the queries get: the canary's generated code
    // must reach C2 steady state or the FIRST reading bakes JIT tiering
    // into what should be a pure host-contention signal (a cold first
    // canary measured 2.1x its post-suite twin with identical host load)
    work(); work()
    val samples = scala.collection.mutable.ArrayBuffer[Double]()
    while (samples.size < 4) {
      val t0 = System.nanoTime()
      work()
      samples += (System.nanoTime() - t0) / 1e9
    }
    samples.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    val canaryFirst = canary(spark)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // deterministic isolation: free the previous query's leftover
      // checkpoint blocks NOW, not whenever the async cleaner runs
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      def run(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left((e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(300)) }
      }
      val timed: Double = run() match { // warm-up: codegen + JIT, untimed
        case Left(err) => errors(name) = err; -1.0
        case Right(_) =>
          val samples = scala.collection.mutable.ArrayBuffer[Double]()
          var failed: Option[String] = None
          while (failed.isEmpty && samples.size < 3 &&
              (samples.size < 2 || samples.max > samples.min * 2)) {
            run() match {
              case Left(err) => failed = Some(err)
              case Right(t) => samples += t
            }
          }
          failed match {
            case Some(err) => errors(name) = err; -1.0
            case None => samples.min
          }
      }
      name -> timed
    }

    val canaryLast = canary(spark)

    for (name <- missingCoverage(results.map(_._1).toSet).toSeq.sorted)
      errors(name) = "no timing entry recorded for registered query"

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString(",\"errors\":{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // normalized view: raw seconds / mean canary seconds — per-query
    // cost in CANARY UNITS, comparable across rounds regardless of
    // host-side contention windows (canary fields ride EARLY in the
    // line so they survive the driver's tail truncation)
    val canaryMean = (canaryFirst + canaryLast) / 2.0
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val qsNorm = results.map { case (k, v) =>
      jstr(k) + ":" + (if (v >= 0) r3(v / canaryMean) else -1.0)
    }.mkString("{", ",", "}")
    // Field order is part of the artifact contract (README "Bench
    // artifact convention"): `value`/`queries` are RAW SECONDS,
    // `value_norm`/`queries_norm` are canary-normalized (raw ÷ mean
    // canary). The driver snapshots the TAIL of this line, so the raw
    // `queries` map rides LAST — a cross-round reader of the driver
    // artifact always sees raw seconds, and the r7 units trap (tail
    // caught the normalized map, faking 2–3× regressions) can't recur.
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""canary_s":{"first":${r3(canaryFirst)},"last":${r3(canaryLast)}},""" +
      s""""value_norm":${r3(total / canaryMean)},"sf":"$sfDir"$errJson,""" +
      s""""queries_norm":$qsNorm,"queries":$qs}"""
    println(line)
    // stdout capture can truncate long lines; persist the full record so
    // the headline number survives independent of the console channel.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // file write is best-effort
    spark.stop()
  }
}
