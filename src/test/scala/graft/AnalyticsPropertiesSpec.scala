package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.functions.Dedup
import graft.operators.TimeSeries

/** Property-based invariants for the analytics/time-series family and
  * the containment dedup, each cross-checked against an independent
  * in-memory reference implementation on random inputs (same
  * fixed-seed sampling convention as SpanPropertiesSpec).
  */
class AnalyticsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7331L + i)))

  // (id, key, minuteOffset, cents) — duplicate minutes exercise the
  // (ts, id) tie-break; cents keep values exactly 2-decimal like the
  // fixture's `value`.
  private def seriesGen: Gen[Seq[(Long, Long, Int, Long)]] =
    Gen.sequence[Seq[(Long, Long, Int, Long)], (Long, Long, Int, Long)](
      (0 until 60).map { i =>
        for {
          key <- Gen.choose(1L, 3L)
          m <- Gen.choose(0, 25)
          cents <- Gen.choose(0L, 5000L)
        } yield (i.toLong, key, m, cents)
      })

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 01:$m%02d:00")

  test("∀ random series: rollingZScore equals an O(n·lookback) reference") {
    val (lookback, minBase) = (8, 4)
    for (rows <- samples(seriesGen, 4)) {
      val df = rows.map { case (id, k, m, c) => (id, k, ts(m), c / 100.0) }
        .toDF("id", "k", "t", "value")
      val got = TimeSeries.rollingZScore(df, "k", "t", "id", "value",
          lookback = lookback, minBaseline = minBase)
        .select("id", "n_base", "z", "is_anomaly")
        .as[(Long, Long, Double, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap

      // reference: per key in (ts, id) order, score vs previous ≤
      // lookback cents; exact-cents sums ÷ 100 reproduce the
      // DECIMAL→DOUBLE cast (proven equivalent in StreamingSpec)
      val want = rows.groupBy(_._2).values.flatMap { g =>
        val ordered = g.sortBy(r => (r._3, r._1))
        ordered.zipWithIndex.flatMap { case ((id, _, _, c), i) =>
          val base = ordered.slice(math.max(0, i - lookback), i).map(_._4)
          val n = base.size
          if (n < minBase) None
          else {
            val s = base.sum.toDouble / 100.0
            val ss = base.map(x => x * x).sum.toDouble / 10000.0
            val nd = n.toDouble
            val mean = s / nd
            val vr = (ss - s * s / nd) / (nd - 1.0)
            if (vr > 0.0) {
              val z = (c / 100.0 - mean) / math.sqrt(vr)
              Some(id -> ((n.toLong,
                BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble,
                math.abs(z) > 3.0)))
            } else None
          }
        }
      }.toMap
      assert(got == want)
    }
  }

  test("∀ random series: ohlcHourly equals a per-bucket reference") {
    for (rows <- samples(seriesGen, 4)) {
      // spread minutes over two hours so buckets split
      val df = rows.map { case (id, k, m, c) =>
        (id, k, Timestamp.valueOf(f"2026-01-01 ${1 + m % 2}%02d:${m / 2}%02d:00"),
          c / 100.0)
      }.toDF("id", "k", "t", "value")
      val got = TimeSeries.ohlcHourly(df, "k", "t", "id", "value")
        .select("k", "bucket", "open", "high", "low", "close", "n_events")
        .as[(Long, Timestamp, Double, Double, Double, Double, Long)]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
      val want = rows.map { case (id, k, m, c) =>
        (id, k, 1 + m % 2, m / 2, c / 100.0)
      }.groupBy { case (_, k, h, _, _) => (k, h) }.map { case ((k, h), g) =>
        val ordered = g.sortBy { case (id, _, _, mi, _) => (mi, id) }
        val vs = g.map(_._5)
        (k, Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")) ->
          ((ordered.head._5, vs.max, vs.min, ordered.last._5, g.size.toLong))
      }
      assert(got == want)
    }
  }

  // Random corpora of per-doc-unique fillers with quote docs that are
  // contiguous slices of a host doc: containment must find exactly the
  // planted (quote → host) pairs — fillers are globally unique, so no
  // other doc pair shares a shingle, and the host never reaches the
  // threshold in the reverse direction (hosts are ≥ 3× longer).
  private def quoteCorpusGen: Gen[Seq[(Long, String, Option[Long])]] =
    Gen.sequence[Seq[(Long, String, Option[String])], (Long, String, Option[String])](
      (0L until 6L).map { hostId =>
        for {
          n <- Gen.choose(24, 40)
          quote <- Gen.oneOf(true, false)
          start <- Gen.choose(0, 16)
          len <- Gen.choose(5, 8)
        } yield {
          val toks = (0 until n).map(i => s"h${hostId}_$i")
          val q = if (quote) Some(toks.slice(start, start + len)) else None
          (hostId, toks.mkString(" "), q.map(_.mkString(" ")))
        }
      }).map { hosts =>
      // hosts keep their full text; each quoted host also spawns a
      // quote doc (id 100+host) whose text IS the slice, tagged with
      // its source for the expected-pairs set
      hosts.map { case (id, text, _) => (id, text, None: Option[Long]) } ++
        hosts.collect { case (id, _, Some(q)) =>
          (100L + id, q, Some(id): Option[Long])
        }
    }

  // (id, key, minute, stage) random event streams for the funnel
  private def funnelGen: Gen[Seq[(Long, Long, Int, String)]] =
    Gen.sequence[Seq[(Long, Long, Int, String)], (Long, Long, Int, String)](
      (0 until 80).map { i =>
        for {
          key <- Gen.choose(1L, 8L)
          m <- Gen.choose(0, 50)
          stage <- Gen.oneOf("view", "click", "purchase", "error")
        } yield (i.toLong, key, m, stage)
      })

  test("∀ random event streams: funnel stage counts match an ordered reference") {
    for (events <- samples(funnelGen, 4)) {
      val df = events.map { case (id, k, m, st) => (id, k, st, ts(m), 1.0) }
        .toDF("log_id", "rsbsa_no", "table", "ts", "value")
      // the same three-aggregate plan shape as Queries.funnelConversion
      // (which the oracle pins on the fixture); the property checks
      // that this SHAPE implements the ordered-stage state machine
      val v = df.filter($"table" === "view").groupBy("rsbsa_no")
        .agg(min($"ts").as("v_ts"))
      val c = df.filter($"table" === "click").join(v, Seq("rsbsa_no"))
        .filter($"ts" > $"v_ts").groupBy("rsbsa_no").agg(min($"ts").as("c_ts"))
      val p = df.filter($"table" === "purchase").join(c, Seq("rsbsa_no"))
        .filter($"ts" > $"c_ts").groupBy("rsbsa_no").agg(min($"ts").as("p_ts"))
      val got = (v.count(), c.count(), p.count())

      // reference: per key, scan the (minute, id)-sorted stream with a
      // 3-stage state machine anchored on strictly-later timestamps
      val want = events.groupBy(_._2).values.map { g =>
        val ordered = g.sortBy(r => (r._3, r._1))
        val vT = ordered.collectFirst { case (_, _, m, "view") => m }
        val cT = vT.flatMap(t0 =>
          ordered.collectFirst { case (_, _, m, "click") if m > t0 => m })
        val pT = cT.flatMap(t1 =>
          ordered.collectFirst { case (_, _, m, "purchase") if m > t1 => m })
        (vT.isDefined, cT.isDefined, pT.isDefined)
      }.toSeq
      assert(got == ((want.count(_._1).toLong, want.count(_._2).toLong,
        want.count(_._3).toLong)))
    }
  }

  test("∀ corpora with planted quotes: containment finds exactly the planted pairs") {
    for (corpus <- samples(quoteCorpusGen, 4)) {
      val docs = corpus.map { case (id, text, _) => (id, text) }
        .toDF("doc_id", "text")
      val want = corpus.collect { case (id, _, Some(host)) => (id, host) }.toSet
      val got = Dedup.containmentPairs(docs, w = 3, threshold = 0.8)
        .select("inner_id", "outer_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"want=$want got=$got")
    }
  }

  // random (doc_id, text) corpora: sparse ids, variable-length word
  // texts — the shapes that would expose order- or layout-dependent
  // state in the manifest aggregation
  private def manifestCorpusGen: Gen[Seq[(Long, String)]] =
    Gen.sequence[Seq[(Long, String)], (Long, String)](
      (0 until 80).map { i =>
        for {
          idGap <- Gen.choose(1L, 1000L)
          nWords <- Gen.choose(1, 30)
          words <- Gen.listOfN(nWords, Gen.identifier.map(_.take(8)))
        } yield (i.toLong * 1000L + idGap, words.mkString(" "))
      })

  test("∀ random corpora: shardManifest is a pure function of content — " +
      "identical under repartition(1)/repartition(64)/sorted input, and " +
      "equal to a driver-side reference") {
    // the operator a trainer trusts for data integrity: its checksum
    // must be a LAW of the corpus content, never of physical layout,
    // partition count, or arrival order
    import graft.functions.Packing
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    for ((corpus, i) <- samples(manifestCorpusGen, 3).zipWithIndex) {
      val nshards = 8
      // independent driver-side reference: salted-md5 shard, token
      // count, xor-folded 60-bit content digests
      val want = corpus.groupBy { case (id, _) => h60(s"shard:$id") % nshards }
        .map { case (shard, ds) =>
          (shard,
           ds.size.toLong,
           ds.map(_._2.split("\\s+").length.toLong).sum,
           ds.map(d => h60(d._2)).reduce(_ ^ _))
        }.toSet
      val base = corpus.toDF("doc_id", "text")
      val layouts = Seq(
        base.repartition(1),
        base.repartition(64),
        base.orderBy($"doc_id"),
        base.orderBy($"doc_id".desc))
      for (df <- layouts) {
        val got = Packing.shardManifest(df, nshards).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == want, s"sample $i: manifest diverged from reference")
      }
    }
  }

  test("stride interleave: matches the in-memory schedule; every prefix within 1 of entitlement") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
    val weight: String => Double = s => (s.drop(3).toInt % 4 + 1).toDouble
    val n = docs.count().toInt
    val got = graft.functions.TextAnalysis.strideInterleave(
        docs, src => (substring(src, 4, 10).cast("int") % 4 + 1).cast("double"),
        topN = n, buckets = 7) // buckets ≪ sources: numbering really is two-phase
      .select("pos", "doc_id", "source", "n")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    // independent reference: per-source ordinals + virtual-time sort
    val ref = docs.as[(Long, String)].collect()
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
          (id, src, i + 1L, (i + 1 - 0.5) / weight(src))
        }
      }
      .sortBy { case (id, _, _, key) => (key, id) }
      .zipWithIndex.map { case ((id, src, ord, _), p) => (p + 1L, id, src, ord) }
    assert(got.toSeq == ref, "engine schedule diverged from in-memory stride reference")
    // stride guarantee: at any prefix boundary of virtual time t, a
    // weight-w source holds its entitlement t·w to within one item
    // plus the tie run it may be sitting in (sources of equal weight
    // emit identical keys; doc_id breaks the tie inside the run)
    val sourcesPerClass = docs.select("source").distinct()
      .as[String].collect().groupBy(weight).view.mapValues(_.length).toMap
    for (t <- Seq(n / 10, n / 3, n / 2)) {
      val prefix = ref.take(t)
      val (_, lastId, lastSrc, lastOrd) = prefix.last
      val vt = (lastOrd - 0.5) / weight(lastSrc)
      val bySrc = prefix.groupBy(_._3).view.mapValues(_.length).toMap
      val _ = lastId
      for ((src, cnt) <- bySrc) {
        val slack = 1.0 + sourcesPerClass(weight(src))
        assert(math.abs(cnt - vt * weight(src)) <= slack,
          s"prefix $t: $src has $cnt vs entitlement ${vt * weight(src)} (slack $slack)")
      }
    }
  }

  test("one-pass sketch heavy hitters recover the exact top-20 on the fixture corpus") {
    // the scale twin has no exact arm; its quality claim — sampled
    // candidates catch every true hitter, CMS estimates rank them
    // right — is checked against the 3-scan exact baseline here
    val exact = SparkEntry.queries("agg_heavy_hitters")(spark, sfDir)
      .select("token", "n_exact").as[(String, Long)].collect().toMap
    val sketch = SparkEntry.queries("agg_heavy_hitters_sketch")(spark, sfDir)
      .as[(String, Long)].collect()
    assert(sketch.map(_._1).toSet == exact.keySet,
      "sketch top-20 token set diverged from exact top-20")
    // CMS one-sided error: est >= exact always
    for ((tok, est) <- sketch)
      assert(est >= exact(tok), s"CMS underestimated $tok: $est < ${exact(tok)}")
  }

  test("∀ random tables: reservoirSample draws exactly min(k, |group|), " +
      "deterministically, and adding rows only displaces survivors") {
    import graft.functions.Selection
    val rowsGen: Gen[Seq[(String, Long)]] =
      Gen.sequence[Seq[(String, Long)], (String, Long)](
        (0 until 60).map { i =>
          for (g <- Gen.oneOf("a", "b", "c"); gap <- Gen.choose(1L, 50L))
            yield (g, i.toLong * 50L + gap)
        })
    for (rows <- samples(rowsGen, 4)) {
      val df = rows.toDF("g", "id")
      val got = Selection.reservoirSample(df, col("g"), col("id"), k = 7)
        .as[(String, Long, Long)].collect()
      val sizes = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      // exact-k law (ids can repeat across gen slots → count distinct
      // survivors per group against distinct ids per group)
      val bySize = got.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      for ((g, n) <- sizes)
        assert(bySize.getOrElse(g, 0) == math.min(7, n), s"group $g")
      // determinism
      val again = Selection.reservoirSample(df, col("g"), col("id"), k = 7)
        .as[(String, Long, Long)].collect()
      assert(got.sortBy(r => (r._1, r._3)).toSeq ==
        again.sortBy(r => (r._1, r._3)).toSeq)
      // monotone displacement: survivors of a superset, restricted to
      // the original rows, are a subset of the original survivors
      // (rank only grows when rows are added — the reservoir law)
      val extra = rows.map { case (g, id) => (g, id + 1000000L) }
      val sup = Selection.reservoirSample((rows ++ extra).toDF("g", "id"),
        col("g"), col("id"), k = 7).as[(String, Long, Long)].collect()
      val oldIds = rows.map(_._2).toSet
      val oldSurvivors = got.map(r => (r._1, r._2)).toSet
      for (r <- sup if oldIds(r._2))
        assert(oldSurvivors((r._1, r._2)),
          s"superset promoted a non-survivor ${(r._1, r._2)}")
    }
  }

  test("∀ random corpora: curriculumSchedule partitions the corpus into " +
      "quality-monotone stages with per-stage permutation positions") {
    import graft.functions.Selection
    val scoreGen: Gen[Seq[(Long, Double)]] =
      Gen.sequence[Seq[(Long, Double)], (Long, Double)](
        (0 until 48).map { i =>
          for (q <- Gen.choose(0, 10000)) yield (i.toLong, q / 10000.0)
        })
    for (rows <- samples(scoreGen, 4); stages <- Seq(2, 4)) {
      val df = rows.toDF("doc_id", "q")
      val got = Selection.curriculumSchedule(df, col("q"), stages)
        .as[(Long, Long, Long, Double)].collect()
      // partition: every doc appears exactly once, stage in range
      assert(got.map(_._1).sorted.toSeq == rows.map(_._1).sorted)
      assert(got.forall(r => r._2 >= 1 && r._2 <= stages))
      // monotone: a higher-quality doc never lands in a later stage
      val byQ = got.sortBy(-_._4)
      for (Array(a, b) <- byQ.sliding(2).map(_.toArray) if a._4 > b._4)
        assert(a._2 <= b._2, s"quality ${a._4} in stage ${a._2} after ${b._4} in ${b._2}")
      // positions are a 1..|stage| permutation inside each stage
      for ((s, g) <- got.groupBy(_._2))
        assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq, s"stage $s")
      // deterministic
      val again = Selection.curriculumSchedule(df, col("q"), stages)
        .as[(Long, Long, Long, Double)].collect()
      assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
      // all stages are populated on a 48-doc spread
      assert(got.map(_._2).distinct.length == stages)
    }
  }
}
