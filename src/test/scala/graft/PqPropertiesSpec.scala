package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Property-based invariants for the PQ/ADC family: ∀ random embedding
  * corpora —
  *
  *  (a) kernel ≡ independent driver-side reference: `pqTopK`'s full
  *      output (codes → distance tables → ADC sums → ranked top-k)
  *      equals a plain-Scala recomputation from the same quantized
  *      vectors and seed codebooks (a third implementation path,
  *      independent of both the kernels and the Column baseline the
  *      KernelEquivalenceSpec uses);
  *  (b) exactness escape hatch: with m = 1 and ksub ≥ N every vector
  *      is its own nearest codeword, so adist IS the exact squared L2
  *      distance — for ANY corpus, not just the fixture.
  *
  * Same fixed-seed sampling as MergePropertiesSpec / SpanPropertiesSpec
  * (no scalatestplus bridge in the offline dependency set).
  */
class PqPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 16

  private def corpusGen(n: Int): Gen[Seq[(Long, Array[Float])]] =
    Gen.sequence[Seq[(Long, Array[Float])], (Long, Array[Float])](
      (0L until n.toLong).map { id =>
        Gen.listOfN(Dims, Gen.chooseNum(-1.0f, 1.0f)).map(v => (id, v.toArray))
      })

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(733L + i)))

  /** Driver-side PQ reference over the engine-quantized vectors. */
  private def refTopK(quant: Map[Long, Array[Long]], qids: Seq[Long], k: Int,
      m: Int, ksub: Int): Set[(Long, Int, Long, Long)] = {
    val dsub = Dims / m
    val seeds = quant.toSeq.sortBy(_._1).take(ksub).map(_._2)
    def sub(v: Array[Long], j: Int) = v.slice(j * dsub, (j + 1) * dsub)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codes = quant.map { case (id, v) =>
      id -> (0 until m).map { j =>
        seeds.indices.minBy(c => (d2(sub(v, j), sub(seeds(c), j)), c))
      }
    }
    qids.flatMap { qid =>
      val qv = quant(qid)
      val scored = quant.keys.filter(_ != qid).map { nid =>
        val adist = (0 until m).map(j =>
          d2(sub(qv, j), sub(seeds(codes(nid)(j)), j))).sum
        (nid, adist)
      }.toSeq.sortBy { case (nid, a) => (a, nid) }.take(k)
      scored.zipWithIndex.map { case ((nid, a), r) => (qid, r + 1, nid, a) }
    }.toSet
  }

  test("∀ corpora: pqTopK equals an independent driver-side PQ recomputation") {
    for ((corpus, i) <- samples(corpusGen(18), 4).zipWithIndex) {
      val df = corpus.toDF("vec_id", "embedding")
      val quant = df
        .select($"vec_id", Similarity.quantized($"embedding").as("q"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val qids = Seq(0L, 1L)
      // ksub = 25 > N = 18 exercises the undersized-corpus stride: the
      // seed LIMIT yields only N codewords, and the ADC lookup must use
      // the EFFECTIVE codebook size (a declared-ksub stride with m > 1
      // reads across subspace boundaries unchecked — silent garbage)
      for (m <- Seq(1, 2, 4); ksub <- Seq(4, 18, 25)) {
        val got = Similarity.pqTopK(df, qids, 5, m = m, ksub = ksub)
          .collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
        val want = refTopK(quant, qids, 5, m, ksub)
        assert(got == want, s"sample $i m=$m ksub=$ksub:\n got=$got\nwant=$want")
      }
    }
  }

  test("∀ corpora: m=1 with every vector a codeword is exact squared L2") {
    for (corpus <- samples(corpusGen(14), 3)) {
      val df = corpus.toDF("vec_id", "embedding")
      val quant = df
        .select($"vec_id", Similarity.quantized($"embedding").as("q"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val got = Similarity.pqTopK(df, Seq(0L), 5, m = 1, ksub = 14)
        .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
      val qv = quant(0L)
      for ((nid, adist) <- got) {
        val exact = quant(nid).zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum
        assert(adist == exact, s"nid=$nid adist=$adist exact=$exact")
      }
    }
  }

  test("SQ8: full pipeline (stats -> codes -> midpoint recon -> ranked ADC) ≡ driver reference") {
    for (corpus <- samples(corpusGen(60), 2)) {
      val df = corpus.toDF("vec_id", "embedding")
      val quant: Map[Long, Array[Long]] = df
        .select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
        .as[(Long, Array[Long])].collect().toMap
      val mins = (0 until Dims).map(d => quant.values.map(_(d)).min).toArray
      val widths = (0 until Dims).map(d =>
        quant.values.map(_(d)).max - mins(d) + 1L).toArray
      def code(v: Long, d: Int): Long =
        math.max(0L, math.min(255L, (v - mins(d)) * 256L / widths(d)))
      def adist(q: Array[Long], v: Array[Long]): Long =
        (0 until Dims).map { d =>
          val r = mins(d) + ((2L * code(v(d), d) + 1L) * widths(d)) / 512L
          val diff = q(d) - r
          diff * diff
        }.sum
      val got = Similarity.sqTopK(df, Seq(0L, 1L), k = 5)
        .as[(Long, Int, Long, Long)].collect()
      for (qid <- Seq(0L, 1L)) {
        val want = quant.keys.filter(_ != qid).toSeq
          .map(n => (n, adist(quant(qid), quant(n))))
          .sortBy(t => (t._2, t._1)).take(5)
        val gotQ = got.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
        assert(gotQ == want, s"qid=$qid\ngot =$gotQ\nwant=$want")
      }
    }
  }

  test("SQ8 degenerate corpus: identical vectors give zero distances, ties break by nid") {
    val df = (0L until 8L).map(i => (i, Array.fill(Dims)(0.25f))).toDF("vec_id", "embedding")
    val got = Similarity.sqTopK(df, Seq(0L), k = 3)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    // width = 1 on every dim -> recon == min == the value, adist == 0
    assert(got.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((1, 1L, 0L), (2, 2L, 0L), (3, 3L, 0L)))
  }
}
