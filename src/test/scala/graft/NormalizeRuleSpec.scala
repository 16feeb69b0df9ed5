package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.plans.TextKernels
import org.apache.spark.unsafe.types.UTF8String

/** The normalization-chain optimizer rule
  * ([[graft.plans.NormalizeChainSimplification]]): each algebraic
  * identity is first proven value-for-value at the kernel level (the
  * rule is sound only if the kernels actually satisfy the algebra),
  * then the rewrite itself is asserted on optimized plans.
  */
class NormalizeRuleSpec extends SparkSpec {
  import spark.implicits._

  private val probes = Seq(
    "plain ascii", "", "café naive", "café naïve",
    "Ångström Ångström", "øß mixed éé")

  private def k(s: String) = UTF8String.fromString(s)

  test("kernel algebra: the three identities hold value-for-value") {
    for (p <- probes) {
      val u = k(p)
      // nfc idempotent
      assert(TextKernels.nfc(TextKernels.nfc(u)).toString ==
        TextKernels.nfc(u).toString, p)
      // strip ∘ nfc = strip
      assert(TextKernels.stripAccents(TextKernels.nfc(u)).toString ==
        TextKernels.stripAccents(u).toString, p)
      // nfc ∘ strip = strip (strip output is already NFC)
      assert(TextKernels.nfc(TextKernels.stripAccents(u)).toString ==
        TextKernels.stripAccents(u).toString, p)
    }
  }

  test("rule rewrites composed chains out of the optimized plan; values unchanged") {
    // repartition keeps the projection from constant-folding into a
    // LocalRelation (the probes are literals), so the optimized plan
    // still SHOWS the expressions the rule rewrote
    val d = probes.toDF("t").repartition(2)
    // strip(nfc(x)) → strip(x): the inner nfc pass must disappear
    val chained = d.select(
      Normalize.stripAccents(Normalize.nfc(col("t"))).as("s"))
    val plan = chained.queryExecution.optimizedPlan.toString
    assert(!plan.contains("stripaccentsexpr(nfcexpr"), plan)
    assert(plan.contains("stripaccentsexpr("), plan)
    // nfc(nfc(x)) → nfc(x)
    val dbl = d.select(Normalize.nfc(Normalize.nfc(col("t"))).as("n"))
    val p2 = dbl.queryExecution.optimizedPlan.toString
    assert(!p2.contains("nfcexpr(nfcexpr"), p2)
    // nfc(strip(x)) → strip(x)
    val ns = d.select(Normalize.nfc(Normalize.stripAccents(col("t"))).as("n"))
    val p3 = ns.queryExecution.optimizedPlan.toString
    assert(!p3.contains("nfcexpr("), p3)
    // rewritten plans still produce the exact kernel-composed values
    val got = chained.as[String].collect()
    val want = probes.map(p =>
      TextKernels.stripAccents(TextKernels.nfc(k(p))).toString)
    assert(got.toSeq.sorted == want.sorted) // repartition scrambles order
  }

  test("registration is idempotent: repeated register() adds the rule once") {
    graft.plans.GraftFunctions.register(spark)
    graft.plans.GraftFunctions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq graft.plans.NormalizeChainSimplification) == 1)
  }
}
