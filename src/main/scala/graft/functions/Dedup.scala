package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north star).
  *
  * Scale design: every variant is candidate-generation + verification.
  * Exact dedup is a hash groupBy (one shuffle on the fingerprint).
  * MinHash/LSH and SimHash generate candidates by bucketing — only
  * near-identical docs ever meet in a shuffle — and verification runs
  * per candidate pair, never all-pairs. At 100 TB the all-pairs
  * n-gram-Jaccard join is for verification of LSH candidates only; the
  * standalone form here exists for oracle-checkable correctness at
  * small SF.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest doc_id per identical text. One
    * map-side-combined shuffle on the md5 fingerprint (shuffling the
    * 16-byte digest, not the document body).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup'd corpus: the winner rows themselves. */
  def exactSurvivors(docs: DataFrame): DataFrame =
    docs.join(
      exact(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  // ------------------------------------------------------------- shingles

  /** Distinct hashed w-token shingles per document. Hashing shingles to
    * 64-bit immediately keeps all downstream state fixed-width — the
    * document text never travels through a shuffle again.
    */
  def shingleHashes(text: Column, w: Int): Column = {
    val toks = split(lower(text), "\\s+")
    val n = size(toks)
    array_distinct(
      transform(sequence(lit(0), greatest(n - w, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w))))))
  }

  def withShingles(docs: DataFrame, w: Int = 3): DataFrame =
    docs.select(col("doc_id"), shingleHashes(col("text"), w).as("shingles"))

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard near-dup pairs: explode shingles, self-join on
    * shingle hash, count intersections per pair, Jaccard =
    * |∩| / (|A|+|B|−|∩|). Quadratic in the worst case — at scale this
    * is the verify stage behind [[minHashCandidates]]; standalone it is
    * SQL-expressible (DuckDB oracle).
    */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, threshold: Double = 0.5): DataFrame = {
    val ex = explodedShingles(docs, w)
    val counts = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("doc_id").as("a_id"), col("sh"))
    val b = ex.select(col("doc_id").as("b_id"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), Seq("a_id"))
      .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), Seq("b_id"))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("a_n") + col("b_n") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "jaccard")
  }

  // ------------------------------------------------------------- MinHash

  /** Universal-hash coefficients for the k MinHash permutations,
    * deterministic (no RNG at plan time).
    */
  /** Mersenne prime 2^31−1: universal-hash modulus. Inputs are first
    * folded to [0, P) so `a·h + b` stays < 2^62 — no 64-bit wraparound,
    * safe under Spark's default ANSI arithmetic.
    */
  private val P = 2147483647L

  private def coeffs(k: Int, salt: Long): Array[Long] =
    Array.tabulate(k)(i => {
      // splitmix64 of (salt, i): well-mixed, reproducible
      var z = salt + 0x9e3779b97f4a7c15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z & 0x7fffffffL) | 1L // odd, < 2^31
    })

  /** MinHash signature (k permutations) from the shingle-hash array.
    * Pure narrow transform: signature_i = min over shingles of
    * (a_i·h + b_i) mod P, computed with array built-ins inside codegen —
    * the full signature costs one pass over the shingle array per doc.
    */
  def minHashSignature(shingles: Column, k: Int): Column = {
    val as = coeffs(k, 0x5eedL)
    val bs = coeffs(k, 0xca5cadeL)
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    val folded = transform(shingles, h => pmod(h, lit(P)))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(folded,
        h => pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(P)))))
  }

  /** One row per (doc, distinct shingle hash) — the relational form all
    * scale paths run on. Built with posexplode + lead windows instead
    * of array lambdas: higher-order functions are interpreted (no
    * codegen) and were the dominant cost; window + concat + xxhash64
    * stay inside whole-stage codegen and the doc_id partitioning from
    * the window is reused by every downstream per-doc aggregation.
    * Semantics identical to [[shingleHashes]] (incl. the short-doc
    * whole-text shingle).
    */
  def explodedShingles(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val whole = Window.partitionBy("doc_id")
    val leads = (1 until w).map(j => lead(col("tok"), j).over(byPos))
    val full = if (leads.isEmpty) lit(true) else leads.last.isNotNull
    toks
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (col("tok") +: leads): _*).as("shingle"),
        full.as("full"),
        count(lit(1)).over(whole).as("n"))
      .filter(col("full") || (col("pos") === 0 && col("n") < w))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .distinct()
  }

  /** Signature table: doc_id, m0..m(k−1) minhash columns, n_sh shingle
    * count. The k permutation-mins are k plain `min(...)` aggregates
    * over the exploded shingle table — whole-stage codegen with
    * map-side partial aggregation, one shuffle on doc_id. This is the
    * 100 TB shape: no per-row array materialization, no interpreted
    * higher-order functions in the hot path.
    */
  private def signatureTable(ex: DataFrame, k: Int): DataFrame = {
    val as = coeffs(k, 0x5eedL)
    val bs = coeffs(k, 0xca5cadeL)
    val folded = ex.withColumn("hm", pmod(col("sh"), lit(P)))
    val aggs = (0 until k).map(i =>
      min(pmod(lit(as(i)) * col("hm") + lit(bs(i)), lit(P))).as(s"m$i")) :+
      count(lit(1)).as("n_sh")
    folded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (band, band_hash, doc_id) bucket keys from the signature table. */
  private def bandedBuckets(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * r until (b + 1) * r).map(i => col(s"m$i")): _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
  }

  /** LSH banding: split the signature into `bands` bands of `k/bands`
    * rows, hash each band, emit (band_idx, band_hash) bucket keys.
    * Docs sharing any bucket become candidate pairs.
    */
  def minHashCandidates(
      docs: DataFrame, w: Int = 3, k: Int = 128, bands: Int = 32): DataFrame = {
    val banded = bandedBuckets(
      signatureTable(explodedShingles(docs, w), k), k, bands)
    val x = banded.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val y = banded.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    x.join(y, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates verified with
    * exact Jaccard — intersection counts come from re-joining the
    * exploded shingle table on the candidate pairs, so only candidate
    * pairs pay the verification cost and the whole pipeline stays in
    * codegen.
    */
  def minHashDuplicates(
      docs: DataFrame, w: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // The exploded shingle table and the signature table each feed
    // multiple downstream branches (bands ×2 sides, sizes, verify);
    // their shuffles are canonically identical, so Spark's
    // ReusedExchange computes each once — no explicit persist (which
    // would leak cache entries across repeated calls).
    val ex = explodedShingles(docs, w)
    val sig = signatureTable(ex, k)
    val banded = bandedBuckets(sig, k, bands)
    val cands = banded
      .join(banded.select(col("band"), col("bh"), col("doc_id").as("b_id")),
        Seq("band", "bh"))
      .filter(col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id")).distinct()
    val inter = cands
      .join(ex.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(ex.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    val sizes = sig.select(col("doc_id"), col("n_sh"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), Seq("b_id"))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("a_n") + col("b_n") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token hashes: per bit, vote +1/−1 by token
    * bit, sign of the vote becomes the fingerprint bit. Expressed with
    * nested array built-ins — narrow, codegen'd.
    */
  def simHash(text: Column): Column = {
    val tokHashes = transform(split(lower(text), "\\s+"), t => xxhash64(t))
    // Unrolled at plan-construction time: one popcount-style vote per
    // bit, each a single pass over the token-hash array.
    (0 until 64).foldLeft(lit(0L)) { (acc, bit) =>
      val vote = aggregate(tokHashes, lit(0L),
        (v, h) => v + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      acc.bitwiseOR(when(vote > 0, lit(1L << bit)).otherwise(lit(0L)))
    }
  }

  /** SimHash fingerprints as a table, computed scale-shaped: explode
    * token hashes, 64 codegen'd vote sums in one grouped aggregation,
    * then pack the sign bits. (Column-expression variant [[simHash]]
    * kept for composability/tests.)
    */
  def simHashTable(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(transform(split(lower(col("text")), "\\s+"), t => xxhash64(t))).as("h"))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))).as(s"v$b"))
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
          acc.bitwiseOR(when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        }.as("fp"))
  }

  /** SimHash near-dup pairs within a Hamming radius. Pigeonhole
    * banding: split 64 bits into 4 16-bit chunks; hamming ≤ 3 ⇒ at
    * least one chunk identical, so bucket-join on chunks and verify
    * with bit_count(xor) — never all-pairs.
    */
  def simHashDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simHashTable(docs)
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL)).as("ch"))): _*))
        .as("c"))
      .select(col("doc_id"), col("fp"), col("c.chunk"), col("c.ch"))
    val l = chunked.select(col("chunk"), col("ch"),
      col("doc_id").as("a_id"), col("fp").as("a_fp"))
    val rj = chunked.select(col("chunk"), col("ch"),
      col("doc_id").as("b_id"), col("fp").as("b_fp"))
    l.join(rj, Seq("chunk", "ch"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
