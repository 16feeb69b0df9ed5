package graft

/** The bench's noise instruments are measurement tools whose OWN
  * hygiene matters: a probe that leaks blocks or temp files taxes the
  * very suite it adjudicates. Smoke-pins the one-sample io probe the
  * phantom pass brackets re-runs with.
  */
class BenchProbeSpec extends SparkSpec {

  private def probeDirs(): Long = {
    val s = java.nio.file.Files.list(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    try s.filter(_.getFileName.toString.startsWith("graft-io-probe")).count()
    finally s.close()
  }

  test("canaryIoOnce: returns a positive reading, leaks no checkpoint " +
      "blocks, removes its temp dir") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tmpBefore = probeDirs()
    val sec = Bench.canaryIoOnce(spark)
    assert(sec > 0.0)
    // blocking unpersist inside the probe: no new persistent RDDs stay
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"probe leaked blocks: ${after -- before}")
    val tmpAfter = probeDirs()
    assert(tmpAfter <= tmpBefore, s"probe left temp dirs ($tmpBefore -> $tmpAfter)")
  }

  test("canaryCpuOnce: returns a positive reading and leaves no " +
      "persistent state") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val sec = Bench.canaryCpuOnce(spark)
    assert(sec > 0.0)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"probe leaked blocks: ${after -- before}")
  }
}
