package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-pruned semi-join: no false negatives ever, bounded false
  * positives, and exact equivalence to the plain semi-join.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap admits every inserted key (no false negatives)") {
    val keys = (0L until 1000L).map(_ * 7919L)
    val df = keys.toDF("k")
    val bm = BloomJoin.buildBitmap(df, $"k", bits = 1 << 14, hashes = 5)
    val missed = df.filter(!BloomJoin.mightContain($"k", bm, hashes = 5)).count()
    assert(missed == 0L)
  }

  test("false-positive rate stays near the theoretical bound") {
    val n = 1000
    val bits = 1 << 14
    val k = 5
    val bm = BloomJoin.buildBitmap(
      (0L until n.toLong).toDF("k"), $"k", bits, k)
    val probes = (1000000L until 1010000L).toDF("k")
    val fp = probes.filter(BloomJoin.mightContain($"k", bm, k)).count()
    // theoretical fp ≈ (1 - e^(-kn/m))^k ≈ 0.6% at these parameters;
    // allow generous slack for hash clustering
    assert(fp < 300, s"false-positive count $fp out of 10000 probes")
  }

  test("bloomSemiJoin result equals the plain left-semi join") {
    val big = (0L until 20000L).map(i => (i, i % 997)).toDF("id", "key")
    val small = Seq(3L, 997L, 500L, 42L, 996L).toDF("k")
    val got = BloomJoin.bloomSemiJoin(big, small, $"key", $"k",
      bits = 1 << 12, hashes = 4)
      .select($"id").as[Long].collect().toSet
    val want = big.join(small, $"key" === $"k", "left_semi")
      .select($"id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("driver state is the bitmap itself, bounded by the bits parameter") {
    val bm = BloomJoin.buildBitmap(
      (0L until 100000L).toDF("k"), $"k", bits = 1 << 10, hashes = 3)
    assert(bm.length == (1 << 10) / 64) // 16 words no matter the key count
  }
}
