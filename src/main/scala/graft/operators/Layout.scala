package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of N quantized key columns makes rows that are close in
  * EVERY dimension land in the same target file, so per-file min/max
  * column statistics become tight on every z-ordered dimension and a
  * predicate on ANY of them prunes files at the scan. (A layout sorted
  * by one key prunes only that key; the other dimensions' per-file
  * ranges stay full-width — `LayoutSpec` measures exactly this, for
  * both the 2- and 3-column forms.)
  *
  * Everything is exact integer arithmetic so the layout is
  * oracle-reproducible: quantization is `(v − min)·2^bits div
  * (max − min + 1)` (integer div, never a double), the Morton code is
  * a fold of shift/mask/or terms inside one codegen'd projection, and
  * file assignment divides the FIXED z-space `2^(N·bits)` into equal
  * slabs — no global sort, no window, no pass over the data beyond
  * one 1-row min/max aggregate broadcast back. At scale the actual
  * rewrite is `repartitionByRange($"zorder")` + write
  * ([[Sinks.writeZOrdered]], which shares THIS Morton implementation);
  * the stats query here is the planning/verification face of that
  * rewrite.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of N columns, round-robin:
    * bit i of column j lands at position i·N + j — for N = 2 exactly
    * the classic x-even / y-odd interleave. One OR-fold of shift/mask
    * terms, no loop at runtime; the z-value spans N·bits bits, capped
    * at 63 so it stays a non-negative long.
    */
  def interleaveBitsN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1, "need at least one column to interleave")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63], got $n cols x $bits bits")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        // bit i of col j → position i*n + j, via one shift of the
        // pre-masked bit: (c & 2^i) << (i*(n-1) + j)
        a.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (n - 1) + j))
      }
    }
  }

  /** Two-column form (source-compatible API): bit i of x at 2i, y at
    * 2i + 1 — a delegation to [[interleaveBitsN]], kept because the
    * (x, y) case is the overwhelmingly common one.
    */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    interleaveBitsN(Seq(x, y), bits)

  /** Per-target-file layout statistics of z-ordering `df` on `cols`:
    * each row's Morton code over `bits`-bit quantized keys, files as
    * `nfiles` equal slabs of the fixed z-space, and per-file row
    * counts + min/max of EVERY key (`<col>_min` / `<col>_max`) — the
    * numbers a scan planner prunes with.
    */
  def zOrderStatsN(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 12,
      nfiles: Int = 64): DataFrame = {
    require(nfiles >= 1, "nfiles must be >= 1")
    val n = cols.length
    require(n >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63], got $n cols x $bits bits")
    val keyed = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    val mm = keyed.agg(
      min(col(cols.head)).as(s"__min_${cols.head}"),
      (max(col(cols.head)).as(s"__max_${cols.head}") +:
        cols.tail.flatMap(c => Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))): _*)
    val slab = math.max(1L, (1L << (n * bits)) / nfiles)
    val quantized = keyed.crossJoin(broadcast(mm))
      .select((cols.map(c =>
        expr(s"((`$c` - `__min_$c`) * ${1L << bits}L) " +
          s"div (`__max_$c` - `__min_$c` + 1L)").as(s"__q_$c")) ++
        cols.map(col)): _*)
    quantized
      .withColumn("zorder",
        interleaveBitsN(cols.map(c => col(s"__q_$c")), bits))
      .withColumn("file_id", expr(s"zorder div ${slab}L"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** Two-column stats form with the historical `x_min`/`y_max` output
    * names (the `layout_zorder` oracle contract).
    */
  def zOrderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 12,
      nfiles: Int = 64): DataFrame =
    zOrderStatsN(df, Seq(xCol, yCol), bits, nfiles)
      .withColumnsRenamed(Map(
        s"${xCol}_min" -> "x_min", s"${xCol}_max" -> "x_max",
        s"${yCol}_min" -> "y_min", s"${yCol}_max" -> "y_max"))
      .select("file_id", "n_rows", "x_min", "x_max", "y_min", "y_max")
}
