package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of two quantized key columns makes rows that are close in
  * BOTH dimensions land in the same target file, so per-file min/max
  * column statistics become tight on every z-ordered dimension and a
  * predicate on ANY of them prunes files at the scan. (A layout sorted
  * by one key prunes only that key; the other dimension's per-file
  * range stays full-width — `LayoutSpec` measures exactly this.)
  *
  * Everything is exact integer arithmetic so the layout is
  * oracle-reproducible: quantization is `(v − min)·2^bits div
  * (max − min + 1)` (integer div, never a double), the Morton code is
  * a fold of shift/mask/or terms inside one codegen'd projection, and
  * file assignment divides the FIXED z-space `4^bits` into equal
  * slabs — no global sort, no window, no pass over the data beyond
  * one 1-row min/max aggregate broadcast back. At scale the actual
  * rewrite is `repartitionByRange($"zorder")` + write; the stats
  * query here is the planning/verification face of that rewrite.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of x (even positions) and
    * y (odd positions): bit i of x lands at 2i via `(x & 2^i) << i`,
    * bit i of y at 2i+1 — one OR-fold, no loop at runtime.
    */
  def interleaveBits(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Per-target-file layout statistics of z-ordering `df` on
    * (`xCol`, `yCol`): each row's Morton code over `bits`-bit
    * quantized keys, files as `nfiles` equal slabs of the fixed
    * z-space, and per-file row counts + min/max of BOTH keys — the
    * numbers a scan planner prunes with.
    */
  def zOrderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 12,
      nfiles: Int = 64): DataFrame = {
    require(nfiles >= 1, "nfiles must be >= 1")
    val keyed = df.select(
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val mm = keyed.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    val slab = math.max(1L, (1L << (2 * bits)) / nfiles)
    keyed.crossJoin(broadcast(mm))
      .withColumn("qx", expr(s"((x - xmin) * ${1L << bits}L) div (xmax - xmin + 1L)"))
      .withColumn("qy", expr(s"((y - ymin) * ${1L << bits}L) div (ymax - ymin + 1L)"))
      .withColumn("zorder", interleaveBits(col("qx"), col("qy"), bits))
      .withColumn("file_id", expr(s"zorder div ${slab}L"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }
}
