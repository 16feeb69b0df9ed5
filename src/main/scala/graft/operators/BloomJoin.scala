package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join: prune the BIG side of a
  * semi-join map-side, BEFORE its shuffle, with a Bloom filter built
  * from the small side's keys — the classic runtime-filter technique
  * (Bloom 1970; Spark's own AQE can inject these under
  * `spark.sql.optimizer.runtime.bloomFilter.*`, but only for joins it
  * can see through — this operator puts the same lever under explicit
  * user control, e.g. ahead of a multi-stage pipeline the optimizer
  * won't reorder).
  *
  * Scale shape — the whole point is shuffle-volume economics at
  * 100 TB: a semi-join shuffles the big side in full even when only a
  * sliver survives. Here the big side is filtered to
  * (true matches + false positives) while still map-side, so only
  * ~selectivity·N rows enter the exchange. The filter build is fully
  * distributive: each small-side key emits its k bit positions, the
  * positions reduce via `groupBy(word) → bit_or` with map-side
  * combine (≤ m/64 rows shuffle), and the assembled bitmap — driver
  * state bounded by the FILTER SIZE m/8 bytes, by construction, never
  * by the key count — broadcasts back inside a literal predicate of k
  * codegen'd word tests. The final exact semi-join removes false
  * positives, so results are IDENTICAL to the plain semi-join (the
  * DuckDB oracle is exactly that), and the Bloom parameters trade
  * only shuffle volume, never correctness.
  */
object BloomJoin {

  /** Bitmap of a Bloom filter over `key`, built distributively:
    * k = `hashes` positions per key (`xxhash64(key, i) mod bits`),
    * OR-reduced per 64-bit word. The returned array has `bits / 64`
    * words (driver-tiny: 128 KiB at bits = 2^20).
    */
  def buildBitmap(df: DataFrame, key: Column, bits: Int,
      hashes: Int): Array[Long] = {
    require(bits > 0 && bits % 64 == 0, "bits must be a positive multiple of 64")
    require(hashes >= 1, "need at least one hash")
    val pos = df.select(explode(array((0 until hashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(bits.toLong))): _*)).as("p"))
    val words = pos
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("p") % 64).cast("int"))).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(bits / 64)(w => words.getOrElse(w, 0L))
  }

  /** Membership predicate against a built bitmap: k word tests, all
    * codegen'd scalar ops against one literal array column.
    */
  def mightContain(key: Column, bitmap: Array[Long], hashes: Int): Column = {
    val words = lit(bitmap)
    val bits = bitmap.length.toLong * 64
    (0 until hashes).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(bits))
      element_at(words, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Semi-join `big` ⋉ `small` with the Bloom pre-filter applied to
    * `big` before its exchange. Result is identical to
    * `big.join(small, bigKey === smallKey, "left_semi")`.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, bits: Int = 1 << 20, hashes: Int = 5): DataFrame = {
    val bitmap = buildBitmap(small, smallKey, bits, hashes)
    big.filter(mightContain(bigKey, bitmap, hashes))
      .join(small.select(smallKey.as("__bloom_k")).distinct(),
        bigKey === col("__bloom_k"), "left_semi")
  }
}
