package graft.operators
import graft.plans.Materialize.MaterializeOps

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

  /** Zone-map pruning audit: for each probe range, how many target
    * files a min/max-statistics scan planner would READ under (a) the
    * z-order layout and (b) a linear layout sorted on `cols.head` —
    * the measurement that justifies z-ordering at 100 TB, as data
    * instead of a claim. Emits one row per (layout, probe):
    * `files_total`, `files_read` (zone overlap), `rows_read` (their
    * row counts — the actual I/O), and `rows_sel` (rows truly
    * matching — the lower bound), so read amplification is
    * `rows_read / rows_sel` and the z-order win on non-leading
    * dimensions is directly visible (the linear layout's non-leading
    * zones are full-width → zero skipping).
    *
    * Probes are SCALE-FREE eighths of each column's observed domain:
    * `lo = min + (range·lo8) div 8`, `hi = min + (range·hi8) div 8 −
    * 1` — integer arithmetic off the same 1-row min/max aggregate the
    * quantizer uses, so the same query text audits any SF. Everything
    * stays exact integers end-to-end (file ids, zone bounds, counts):
    * the report hashes identically in the oracle.
    *
    * Shape at scale: one projection derives both layouts' file
    * assignments and every probe's hit flag; both zone maps build in
    * ONE grouping (the (layout, file) pair is exploded, one shuffle)
    * and true selectivity is a map-side-combined 1-row conditional
    * aggregate — no data×probe join anywhere; the audit join is
    * (≤2·nfiles stats rows) × (probe literals) × (1-row min/max),
    * all broadcast.
    */
  def skippingReport(
      df: DataFrame,
      cols: Seq[String],
      probes: Seq[(String, Int, Int)],
      bits: Int = 12,
      nfiles: Int = 64): DataFrame = {
    val n = cols.length
    require(n >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63], got $n cols x $bits bits")
    require(probes.nonEmpty, "need at least one probe")
    require(probes.forall { case (c, lo8, hi8) =>
      cols.contains(c) && 0 <= lo8 && lo8 < hi8 && hi8 <= 8 },
      "each probe must name a layout column with 0 <= lo8 < hi8 <= 8")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    val mm = keyed.agg(
      min(col(cols.head)).as(s"__min_${cols.head}"),
      (max(col(cols.head)).as(s"__max_${cols.head}") +:
        cols.tail.flatMap(c => Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))): _*)
    val slab = math.max(1L, (1L << (n * bits)) / nfiles)
    val lslab = math.max(1L, (1L << bits) / nfiles)
    def loOf(c: String, lo8: Int) =
      expr(s"`__min_$c` + ((`__max_$c` - `__min_$c` + 1L) * $lo8) div 8")
    def hiOf(c: String, hi8: Int) =
      expr(s"`__min_$c` + ((`__max_$c` - `__min_$c` + 1L) * $hi8) div 8 - 1L")
    val base = keyed.crossJoin(broadcast(mm))
    // one data pass: both file assignments + per-probe true selectivity
    val assigned = base.select((cols.map(c =>
      expr(s"((`$c` - `__min_$c`) * ${1L << bits}L) " +
        s"div (`__max_$c` - `__min_$c` + 1L)").as(s"__q_$c")) ++
      cols.map(col) ++ probes.zipWithIndex.map { case ((c, lo8, hi8), i) =>
        (col(c) >= loOf(c, lo8) && col(c) <= hiOf(c, hi8))
          .cast("long").as(s"__hit_$i")
      }): _*)
      .withColumn("__z",
        interleaveBitsN(cols.map(c => col(s"__q_$c")), bits))
      .withColumn("__zf", expr(s"`__z` div ${slab}L"))
      .withColumn("__lf", expr(s"`__q_${cols.head}` div ${lslab}L"))
      // the single projected data pass the doc promises: `assigned`
      // feeds the selectivity aggregate AND the exploded zone-map
      // grouping — materialize so the scan+quantize runs once
      .materialize()
    val sel = assigned.agg(
      sum(col("__hit_0")).as("__sel_0"),
      probes.indices.tail.map(i =>
        sum(col(s"__hit_$i")).as(s"__sel_$i")): _*)
    // both layouts' zone maps in ONE grouping: explode the (layout,
    // file) assignment pair, shuffle once on the combined key
    val stats = assigned
      .withColumn("__lfid", explode(array(
        struct(lit("zorder").as("layout"), col("__zf").as("file_id")),
        struct(lit("linear").as("layout"), col("__lf").as("file_id")))))
      .groupBy(col("__lfid.layout").as("layout"),
        col("__lfid.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
    val probeDf = probes.zipWithIndex
      .map { case ((c, lo8, hi8), i) => (s"$c:$lo8-$hi8", c, lo8, hi8, i) }
      .toDF("probe", "__pc", "__lo8", "__hi8", "__pi")
    def caseOf(suffix: String) = cols.tail.foldLeft(
      when(col("__pc") === cols.head, col(s"${cols.head}$suffix"))) {
        (acc, c) => acc.when(col("__pc") === c, col(s"$c$suffix")) }
    val audited = stats.crossJoin(broadcast(probeDf))
      .crossJoin(broadcast(mm))
      .withColumn("__zmin", caseOf("_min"))
      .withColumn("__zmax", caseOf("_max"))
      .withColumn("__plo", probes.zipWithIndex.foldLeft(lit(null)
          .cast("long")) { case (acc, ((c, lo8, _), i)) =>
        when(col("__pi") === i, loOf(c, lo8)).otherwise(acc) })
      .withColumn("__phi", probes.zipWithIndex.foldLeft(lit(null)
          .cast("long")) { case (acc, ((c, _, hi8), i)) =>
        when(col("__pi") === i, hiOf(c, hi8)).otherwise(acc) })
      .withColumn("__read",
        (col("__plo") <= col("__zmax") && col("__phi") >= col("__zmin"))
          .cast("long"))
      .groupBy("layout", "probe", "__pi")
      .agg(count(lit(1)).as("files_total"),
        sum(col("__read")).as("files_read"),
        sum(col("__read") * col("n_rows")).as("rows_read"))
    audited.crossJoin(broadcast(sel))
      .withColumn("rows_sel", probes.indices.foldLeft(lit(null)
          .cast("long")) { (acc, i) =>
        when(col("__pi") === i, col(s"__sel_$i")).otherwise(acc) })
      .select("layout", "probe", "files_total", "files_read",
        "rows_read", "rows_sel")
  }

  /** Hilbert-curve layout statistics over two quantized keys — the
    * locality-tighter sibling of [[zOrderStats]] (same quantizer,
    * same fixed-space slab file assignment, same output contract),
    * with the Morton interleave swapped for the codegen'd Hilbert
    * xy→d kernel ([[graft.plans.Hilbert2Expr]]). Consecutive Hilbert
    * cells are always grid-adjacent while Morton takes long diagonal
    * jumps at quadrant boundaries, so per-file min/max zones come out
    * narrower — `LayoutSpec` measures that claim against the Morton
    * layout on the same keys, and `layout_hilbert`'s oracle replays
    * the rotate/flip loop as unrolled per-level CTEs, so the curve
    * arithmetic is bit-exact across engines.
    */
  def hilbertStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 12,
      nfiles: Int = 64): DataFrame = {
    require(nfiles >= 1, "nfiles must be >= 1")
    require(bits >= 1 && 2 * bits <= 63,
      s"2*bits must be in [1,63], got $bits bits")
    val spark = df.sparkSession
    val keyed = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val mm = keyed.agg(min(col("x")).as("__min_x"), max(col("x")).as("__max_x"),
      min(col("y")).as("__min_y"), max(col("y")).as("__max_y"))
    val slab = math.max(1L, (1L << (2 * bits)) / nfiles)
    keyed.crossJoin(broadcast(mm))
      .select(col("x"), col("y"),
        expr(s"((x - `__min_x`) * ${1L << bits}L) " +
          s"div (`__max_x` - `__min_x` + 1L)").as("__qx"),
        expr(s"((y - `__min_y`) * ${1L << bits}L) " +
          s"div (`__max_y` - `__min_y` + 1L)").as("__qy"))
      .withColumn("hilbert", graft.plans.GraftFunctions.hilbert2(
        spark, col("__qx"), col("__qy"), bits))
      .withColumn("file_id", expr(s"hilbert div ${slab}L"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
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
