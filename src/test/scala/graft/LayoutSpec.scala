package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: Morton interleave vs an in-memory reference, and
  * the claim the operator exists for — under a z-order layout every
  * target file covers a NARROW range of BOTH keys, where a
  * single-key-sorted layout leaves the other key's per-file range at
  * full width (no pruning on that dimension).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleaveBits equals the reference Morton code on random keys") {
    val rnd = new scala.util.Random(11)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 12) - 1, (1L << 12) - 1)) ++
      Seq.fill(200)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.interleaveBits(col("x"), col("y"), 12).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- got)
      assert(z == refMorton(x, y, 12), s"($x,$y)")
  }

  private def refMortonN(ks: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = ks.length
    for (j <- 0 until n; i <- 0 until bits)
      z |= ((ks(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("interleaveBitsN: round-robin placement matches the reference for N = 1, 2, 3") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(150)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        Layout.interleaveBitsN(Seq(col("x")), 10).as("z1"),
        Layout.interleaveBitsN(Seq(col("x"), col("y")), 10).as("z2"),
        Layout.interleaveBitsN(Seq(col("x"), col("y"), col("w")), 10).as("z3"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    for ((x, y, w, z1, z2, z3) <- got) {
      assert(z1 == x, s"N=1 must be the identity, got $z1 for $x")
      assert(z2 == refMorton(x, y, 10), s"N=2 ($x,$y)")
      assert(z3 == refMortonN(Seq(x, y, w), 10), s"N=3 ($x,$y,$w)")
    }
  }

  test("3-column z-order: every file covers a narrow slice of ALL THREE keys") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val stats = Layout.zOrderStatsN(li, cols, bits = 7, nfiles = 64).collect()
    assert(stats.map(_.getLong(1)).sum == li.count(), "files must partition the rows")
    val keys = li.select(cols.map(c => col(c).cast("long")): _*)
      .as[(Long, Long, Long)].collect()
    val doms = Seq(keys.map(_._1), keys.map(_._2), keys.map(_._3))
      .map(v => (v.max - v.min).toDouble)
    // per-file avg range of each dimension ≤ 40% of its domain — a
    // single-key sort leaves the two non-leading dims at ~full width
    for ((c, j) <- cols.zipWithIndex) {
      val avgRange = stats.map(r =>
        (r.getLong(2 * j + 3) - r.getLong(2 * j + 2)).toDouble).sum / stats.length
      assert(avgRange < 0.4 * doms(j),
        s"$c avg per-file range $avgRange vs domain ${doms(j)} — not prunable")
    }
  }

  test("z-order files cover narrow ranges of BOTH keys; x-sorted leaves y full-width") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val stats = Layout.zOrderStats(li, "l_orderkey", "l_partkey",
        bits = 12, nfiles = 64)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == li.count(), "files must partition the rows")

    val keys = li.select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect()
    val (yLo, yHi) = (keys.map(_._2).min, keys.map(_._2).max)
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val zYRange = avg(stats.toSeq.map(s => s._6 - s._5))

    // baseline: the same rows x-SORTED into 64 equal files
    val sorted = keys.sortBy(_._1).grouped(math.ceil(keys.length / 64.0).toInt).toSeq
    val sortedYRange = avg(sorted.map(f => f.map(_._2).max - f.map(_._2).min))

    // x-sorted files see essentially the whole y domain; z-order files
    // must see a small fraction of it — the pruning benefit
    assert(sortedYRange > 0.8 * (yHi - yLo), s"baseline degenerate: $sortedYRange")
    assert(zYRange < 0.25 * sortedYRange,
      s"z-order y-range $zYRange not narrow vs x-sorted $sortedYRange")
    // and x stays prunable too (each file ≤ ~1/4 of the x domain)
    val (xLo, xHi) = (keys.map(_._1).min, keys.map(_._1).max)
    val zXRange = avg(stats.toSeq.map(s => s._4 - s._3))
    assert(zXRange < 0.25 * (xHi - xLo), s"x-range $zXRange not narrow")
  }

  test("hilbert xy2d: bijective on the grid and unit-step adjacent (the curve property)") {
    // bits=5 → 1024 cells: every cell must get a distinct d in
    // [0, 1024), and consecutive d values must be GRID-ADJACENT
    // (manhattan distance exactly 1) — the property Morton lacks at
    // quadrant boundaries and the reason hilbert zones come out
    // narrower. Exhaustive, driver-side, on the shared kernel.
    val bits = 5
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x, y, graft.plans.HilbertKernel.xy2d(bits, x.toLong, y.toLong))
    val ds = cells.map(_._3)
    assert(ds.distinct.size == n * n && ds.min == 0L && ds.max == (n * n - 1).toLong)
    val byD = cells.map(c => c._3 -> ((c._1, c._2))).toMap
    for (d <- 0L until (n * n - 1).toLong) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"cells at d=$d and ${d + 1} not adjacent: ($x1,$y1) → ($x2,$y2)")
    }
  }

  test("hilbert layout: narrower per-file zones than Morton on non-aligned slabs") {
    // The Hilbert2Expr doc claims better zone locality than Morton.
    // Power-of-4-aligned slabs are exact subsquares under BOTH curves
    // (the fixture's 64-file case ties exactly), so the claim is
    // proven where it actually bites: a full uniform grid cut into a
    // file count that is NOT a power of 4 — slabs then straddle
    // quadrant boundaries, where Morton takes its diagonal jumps
    // (full-width zones) while every Hilbert slab stays a contiguous
    // O(√slab) walk.
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).cast("long").as("y"))
    val h = Layout.hilbertStats(grid, "x", "y", bits = 8, nfiles = 17)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val z = Layout.zOrderStatsN(grid, Seq("x", "y"), bits = 8, nfiles = 17)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(h.map(_._2).sum == 256L * 256L, "hilbert files must partition the rows")
    assert(z.map(_._2).sum == 256L * 256L, "morton files must partition the rows")
    def meanArea(s: Seq[(Long, Long, Long, Long, Long, Long)]): Double =
      s.map(f => (f._4 - f._3 + 1).toDouble * (f._6 - f._5 + 1)).sum / s.size
    // zone-map quality = bounding-box area a scan planner cannot prune
    val (hA, zA) = (meanArea(h.toSeq), meanArea(z.toSeq))
    assert(hA < 0.7 * zA,
      s"hilbert mean zone area $hA not clearly below morton $zA")
  }

  test("skippingReport: sound (rows_read ≥ rows_sel), complete, and z-order prunes the non-leading dim") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rep = Layout.skippingReport(li, Seq("l_orderkey", "l_partkey"),
        probes = Seq(("l_orderkey", 1, 2), ("l_partkey", 3, 4), ("l_partkey", 0, 8)),
        bits = 12, nfiles = 64)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rep.length == 6) // 2 layouts × 3 probes
    val n = li.count()
    for ((layout, probe, ft, fr, rr, rs) <- rep) {
      // zone maps are sound: never read fewer rows than actually match
      assert(rr >= rs, s"$layout/$probe reads $rr < selects $rs")
      assert(fr <= ft && rr <= n, s"$layout/$probe inconsistent")
      // the full-range control probe must read everything
      if (probe == "l_partkey:0-8") assert(fr == ft && rr == n && rs == n)
    }
    def rowsRead(l: String, p: String) =
      rep.find(r => r._1 == l && r._2 == p).get._5
    // leading dim: both layouts prune
    assert(rowsRead("linear", "l_orderkey:1-2") < n / 2)
    assert(rowsRead("zorder", "l_orderkey:1-2") < n / 2)
    // non-leading dim: the z-order point — linear reads ~everything,
    // z-order skips most of it
    assert(rowsRead("linear", "l_partkey:3-4") > (n * 9) / 10)
    assert(rowsRead("zorder", "l_partkey:3-4") < n / 4)
  }
}
