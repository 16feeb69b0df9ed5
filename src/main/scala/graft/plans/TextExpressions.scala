package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time kernels for the text/dedup hot paths, called from
  * generated code (one static call per row keeps the whole pipeline
  * inside whole-stage codegen; the per-row work is a tight JVM loop
  * instead of interpreted higher-order-function lambdas, which round-1
  * profiling showed to be ~20× slower).
  *
  * Semantics mirror the column-level baselines exactly (unit-tested
  * equivalence):
  *  - [[shingleHashes]] ≡ `xxhash64(concat_ws(" ", slice(split(lower(text),
  *    "\\s+"), i, w)))` distinct, incl. the whole-text shingle for docs
  *    shorter than `w` tokens.
  *  - [[minHashSig]] ≡ k min-aggregates of `(a_i·pmod(sh,P) + b_i) mod P`
  *    with the splitmix64-derived coefficients.
  *  - [[hyperplaneSig]] ≡ [[graft.functions.Similarity]] random-hyperplane
  *    sign bits (same hash-derived plane components, same accumulation
  *    order, bit-identical buckets).
  */
object TextKernels {

  /** xxhash64 seed used by Spark's `xxhash64` function. */
  private final val Seed = 42L

  /** Mersenne prime 2^31−1 — universal-hash modulus (see
    * [[graft.functions.Dedup]]): folding inputs to [0, P) keeps
    * `a·h + b` below 2^62, no 64-bit wraparound under ANSI mode.
    */
  final val P = 2147483647L

  /** splitmix64 of (salt, i): well-mixed, reproducible — identical to
    * the round-1 column-level coefficient derivation.
    */
  private def splitmix(salt: Long, i: Int): Long = {
    var z = salt + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 0x7fffffffL) | 1L // odd, < 2^31
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, k =>
      (Array.tabulate(k)(splitmix(0x5eedL, _)),
        Array.tabulate(k)(splitmix(0xca5cadeL, _))))

  /** Distinct 64-bit hashes of the w-token shingles of `text`
    * (lowercased, whitespace-tokenized; one whole-text shingle when the
    * doc has fewer than `w` tokens).
    */
  def shingleHashes(text: UTF8String, w: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val n = toks.length
    val count = math.max(n - w, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + w, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == count) out else java.util.Arrays.copyOf(out, m))
  }

  /** 64-bit hash of every whitespace token of the lowercased text, in
    * order, duplicates kept (SimHash needs every occurrence to vote, so
    * no distinct; `split` with its default -1 limit keeps
    * leading/trailing empty tokens, and so does this).
    *
    * The hash is the first 8 bytes of md5 read as a signed big-endian
    * long — ENGINE-PORTABLE, like the winnowing kernel's md5 grams: the
    * DuckDB oracle reproduces the identical value with
    * `substr(md5(t), 1, 16)`, so the whole SimHash fingerprint (and the
    * Hamming pair set) is oracle-verifiable, which Spark's private
    * xxhash64 seeding would not be. ≡ the column form
    * `conv(substring(md5(t), 1, 16), 16, 10)` sign-folded to long
    * (unit-tested equivalence).
    */
  private val md5Local = java.lang.ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def tokenHashes(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val out = new Array[Long](toks.length)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 digest bytes big-endian == parseUnsignedLong(hex[0:16], 16)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ORDERED per-position w-gram hashes of the lowercased,
    * whitespace-tokenized text — one hash per gram START position,
    * duplicates kept (position identity is the point: repeated-span
    * detection needs to know WHERE each gram occurs, where
    * [[shingleHashes]] deliberately dedups for set-similarity). Hashes
    * are md5-portable (first 8 bytes signed, same construction as
    * [[tokenHashes]]) so the DuckDB oracle rebuilds them:
    * `md5(array_to_string(toks[i:i+w-1], ' '))`. Docs shorter than `w`
    * tokens contribute one whole-text gram (same rule as
    * [[shingleHashes]]).
    */
  def gramHashes(text: UTF8String, w: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val n = toks.length
    val count = math.max(n - w, 0) + 1
    val out = new Array[Long](count)
    val md = md5Local.get()
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + w, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ORDERED per-position CHARACTER-k-gram hashes of the raw text —
    * the [[gramHashes]] construction at character granularity (Lee et
    * al. 2021's actual unit: verbatim repeats that cross token
    * boundaries or sit inside tokens are invisible to token grams).
    * No lowercasing, no tokenization: exact-substring identity.
    * Positions and gram boundaries are CODE POINTS, matching DuckDB's
    * `substr`/`length` semantics (NOT UTF-16 code units), so the
    * oracle rebuilds identical hot sets with `md5(substr(text, i, k))`.
    * Docs shorter than k chars contribute one whole-text gram (the
    * [[gramHashes]] rule). One O(bytes) boundary scan, then one md5
    * per position over the byte slice — no per-gram string copies.
    */
  def charGramHashes(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx)
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var p = 0
    while (p < bytes.length) {
      if ((bytes(p) & 0xc0) != 0x80) { offs(n) = p; n += 1 }
      p += 1
    }
    offs(n) = bytes.length
    val count = math.max(n - k, 0) + 1
    val out = new Array[Long](count)
    val md = md5Local.get()
    var i = 0
    while (i < count) {
      val until = if (i + k <= n) offs(i + k) else bytes.length
      md.reset()
      md.update(bytes, offs(i), until - offs(i))
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** k-permutation MinHash signature of a shingle-hash array. Null
    * elements are skipped (the column form's `transform` propagates
    * null through `pmod`, and `array_min` ignores nulls — same result).
    */
  def minHashSig(shingles: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coeffs(k)
    val mins = Array.fill(k)(P)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val hm = ((shingles.getLong(j) % P) + P) % P
        var i = 0
        while (i < k) {
          val v = (as(i) * hm + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Winnowing selections (Schleimer et al., SIGMOD'03 — the MOSS
    * algorithm): md5-hex hashes of the K-GRAM at every token position
    * (k-grams, not unigrams — a shared fingerprint then witnesses a
    * shared k-token run, the discriminative property the algorithm
    * exists for), sliding window of `w` consecutive gram hashes,
    * per-window minimum with rightmost tie-break, distinct (fp, pos)
    * selections. Monotonic-deque O(n); ≡ the relational window form
    * ([[graft.functions.TextAnalysis.winnowFingerprintsRelational]],
    * unit-tested equivalence) but with NO shuffle — the whole
    * per-document selection happens in this one pass. Documents
    * shorter than k tokens contribute one whole-text gram (same rule
    * as [[shingleHashes]]); documents with fewer than w grams have no
    * full window and yield no fingerprints.
    */
  def winnow(text: UTF8String, w: Int, k: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val n = toks.length
    val gramCount = math.max(n - k, 0) + 1
    if (gramCount < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val hs = new Array[String](gramCount)
    var i = 0
    while (i < gramCount) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      // same md5-hex as Spark's md5() column function — parity with
      // the relational baseline and the DuckDB oracle by construction
      hs(i) = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    // monotonic deque of positions; h strictly increasing front→back,
    // equal hashes evicted so the NEWER (rightmost) position wins ties
    val deque = new java.util.ArrayDeque[Integer]()
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    // the selected front index is non-decreasing across windows, so
    // dedup is a single last-emitted comparison — no set needed
    var lastSel = -1
    i = 0
    while (i < gramCount) {
      while (!deque.isEmpty && hs(deque.peekLast()).compareTo(hs(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      val start = i - w + 1
      if (start >= 0) {
        while (deque.peekFirst() < start) deque.pollFirst()
        val sel = deque.peekFirst().intValue()
        if (sel != lastSel) {
          out += org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(hs(sel)), sel.toLong)
          lastSel = sel
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** 64-bit SimHash fingerprint from per-occurrence token hashes: per
    * bit, each token votes +1/−1 by its bit value; the fingerprint bit
    * is the sign of the vote sum. One tight pass over the token array —
    * ≡ the 64-vote-sum grouped aggregation (unit-tested equivalence)
    * but with no explode and no shuffle.
    */
  def simHash64(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = toks.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Hyperplane component (p, i): first 4 bytes of `md5("p_i")` as an
    * unsigned 32-bit value, mod 2000, shifted to ±[0, 1). md5-derived —
    * ENGINE-PORTABLE like the winnow grams and token hashes, so the
    * DuckDB oracle rebuilds identical signatures
    * (`substr(md5(p || '_' || i), 1, 8)`) and the LSH bucketing itself
    * is oracle-verifiable. Weights depend only on (p, i): memoized, so
    * the per-row signature cost stays a pure multiply-add loop.
    */
  private val planeWeights =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()

  def planeWeight(p: Int, i: Int): Double =
    planeWeights.computeIfAbsent((p.toLong << 32) | i, key => {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        s"${p}_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u32 = java.lang.Integer.parseUnsignedInt(hex.substring(0, 8), 16) & 0xffffffffL
      (u32 % 2000L - 1000L).toDouble / 1000.0
    })

  /** Random-hyperplane sign signature: bit p of the result is set when
    * the dot product of the embedding with pseudo-random plane p is
    * positive. Plane components come from [[planeWeight]] (md5-derived,
    * engine-portable), and accumulation is in element order for
    * bit-identical buckets across engines.
    */
  def hyperplaneSig(emb: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = emb.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        dot += x * planeWeight(p, i)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Quantize a float/double embedding to exact integer components
    * (`round(x·scale)` as long) — same contract as
    * [[graft.functions.Similarity.quantized]]. Rounding goes through
    * `BigDecimal.valueOf(...).setScale(0, HALF_UP)` — exactly what
    * Spark's `round()` does — so results are bit-identical to the
    * column form (`Math.round` would differ on negative halves).
    */
  def quantize(emb: ArrayData, scale: Int, isFloat: Boolean): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // Mirror `round(x * scale).cast("long")` exactly. Spark coerces
      // float×int to DOUBLE (verified empirically in
      // KernelEquivalenceSpec: 0.0025f×1000 → 2.4999998975… → 2,
      // whereas a float-precision product would give 2.5f → 3), so the
      // float element is widened BEFORE the multiply, and rounding goes
      // through BigDecimal.valueOf like Spark's Round on DoubleType.
      val d = (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * scale
      out(i) =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d.toLong
        else java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Full BPE encode under a rank-ordered merge list (`merges` is the
    * flattened pair list [a0,b0,a1,b1,…]): lowercase, whitespace-
    * tokenize, symbolize each word (code points + `</w>`), then apply
    * every merge as a greedy leftmost non-overlapping fusion — the
    * exact semantics of [[graft.functions.Bpe.mergeOnce]]'s fold
    * (including a==b run handling), in one tight loop per row instead
    * of k interpreted higher-order `aggregate` passes.
    * Spec-equivalent to the fold form (`BpeSpec`).
    */
  def bpeEncode(text: UTF8String, merges: Array[String]): ArrayData = {
    val words = text.toLowerCase.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String](w.length + 1)
        var ci = 0
        while (ci < w.length) {
          val n = Character.charCount(w.codePointAt(ci))
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        syms.add("</w>")
        var mi = 0
        while (mi + 1 < merges.length) {
          val a = merges(mi); val b = merges(mi + 1)
          val next = new java.util.ArrayList[String](syms.size)
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms.get(i) == a && syms.get(i + 1) == b) {
              next.add(a + b); i += 2
            } else { next.add(syms.get(i)); i += 1 }
          }
          syms = next
          mi += 2
        }
        var si = 0
        while (si < syms.size) {
          out += UTF8String.fromString(syms.get(si)); si += 1
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** [[bpeEncode]] with deterministic BPE-DROPOUT (Provilkov, Emelianenko
    * & Voita 2020, "BPE-Dropout: Simple and Effective Subword
    * Regularization"): each merge RANK is skipped for a given WORD when
    * the first byte of `md5("bpedrop:" + word + ":" + rank)` is below
    * `dropByte` (drop probability ≈ dropByte/256). md5-derived
    * "randomness" instead of a PRNG so the augmentation is a pure
    * function of (word, rank) — the DuckDB oracle replays every
    * decision with `substr(md5(...), 1, 2) < hex(dropByte)`, and two
    * engine runs agree bit-for-bit (the corpus-split/cap discipline).
    * Per-word (not per-occurrence) decisions are the deterministic
    * simplification: one epoch of training data gets one consistent
    * segmentation per word form, different word forms and different
    * salt epochs get different merge subsets — the regularization
    * signal Provilkov §3 measures survives. `dropByte = 0` is exactly
    * [[bpeEncode]].
    */
  def bpeEncodeDropout(
      text: UTF8String, merges: Array[String], dropByte: Int): ArrayData = {
    val words = text.toLowerCase.toString.split("\\s+")
    val md = md5Local.get()
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String](w.length + 1)
        var ci = 0
        while (ci < w.length) {
          val n = Character.charCount(w.codePointAt(ci))
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        syms.add("</w>")
        var mi = 0
        while (mi + 1 < merges.length) {
          md.reset()
          val d = md.digest(("bpedrop:" + w + ":" + (mi >> 1))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if ((d(0) & 0xff) >= dropByte) {
            val a = merges(mi); val b = merges(mi + 1)
            val next = new java.util.ArrayList[String](syms.size)
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms.get(i) == a && syms.get(i + 1) == b) {
                next.add(a + b); i += 2
              } else { next.add(syms.get(i)); i += 1 }
            }
            syms = next
          }
          mi += 2
        }
        var si = 0
        while (si < syms.size) {
          out += UTF8String.fromString(syms.get(si)); si += 1
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** GPT-2 byte↔unicode table (Radford et al. 2019, GPT-2
    * `encoder.py` `bytes_to_unicode` — the published byte-level BPE
    * alphabet): the 188 printable latin-1 bytes map to themselves,
    * the other 68 (controls, space, DEL, 0xA0, 0xAD) shift to
    * `256 + n` in byte order — every byte becomes exactly one
    * PRINTABLE char (space → 'Ġ' U+0120), so merge symbols are clean
    * strings with no whitespace/controls and ANY byte sequence
    * round-trips losslessly with no [UNK] and no char-level fallback.
    */
  val byteChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteChar]] (mapped codepoints stop at 323). */
  private val charByte: Array[Int] = {
    val out = Array.fill(324)(-1)
    var b = 0
    while (b < 256) { out(byteChar(b)) = b; b += 1 }
    out
  }

  /** BYTE-level BPE encode (the GPT-2/Llama lineage face of
    * [[bpeEncode]]): NO lowercasing, NO `</w>`, no dropped
    * characters — the text splits into alternating
    * whitespace/non-whitespace runs (every char belongs to exactly
    * one piece), each piece's UTF-8 BYTES map through [[byteChar]]
    * to one symbol per byte, and the rank-ordered merges fold
    * exactly as in [[bpeEncode]]. Concatenating the output tokens
    * and reversing the byte map reproduces the input BIT-FOR-BIT
    * ([[bpeDecodeBytes]], spec-pinned on emoji/CJK/control input) —
    * the property char-level BPE buys with `</w>` + lossy
    * normalization and byte-level BPE gets for free.
    */
  def bpeEncodeBytes(text: UTF8String, merges: Array[String]): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val n = s.length
    var i = 0
    while (i < n) {
      val ws = Character.isWhitespace(s.charAt(i))
      var j = i
      while (j < n && Character.isWhitespace(s.charAt(j)) == ws) j += 1
      val bytes = s.substring(i, j)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var syms = new java.util.ArrayList[String](bytes.length)
      var bi = 0
      while (bi < bytes.length) {
        syms.add(String.valueOf(byteChar(bytes(bi) & 0xFF))); bi += 1
      }
      var mi = 0
      while (mi + 1 < merges.length) {
        val a = merges(mi); val b = merges(mi + 1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k + 1 < syms.size && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        mi += 2
      }
      var si = 0
      while (si < syms.size) {
        out += UTF8String.fromString(syms.get(si)); si += 1
      }
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** One piece → its byte-alphabet symbol sequence (one 1-char
    * symbol per UTF-8 byte, through [[byteChar]]) — the seed
    * symbolization for byte-level BPE TRAINING (the byte face of
    * `initialSymbols`; no `</w>`).
    */
  def byteSyms(piece: UTF8String): ArrayData = {
    val bytes = piece.getBytes
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = UTF8String.fromString(
        String.valueOf(byteChar(bytes(i) & 0xFF)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact inverse of [[bpeEncodeBytes]]: concatenate the tokens,
    * map each char back to its byte, decode UTF-8. A char outside
    * the byte alphabet means the input was not produced by the
    * encoder — fail loudly rather than emit silent mojibake.
    */
  def bpeDecodeBytes(toks: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var ti = 0
    val n = toks.numElements()
    while (ti < n) { sb.append(toks.getUTF8String(ti).toString); ti += 1 }
    val bytes = new Array[Byte](sb.length)
    var ci = 0
    while (ci < sb.length) {
      val c = sb.charAt(ci).toInt
      val b = if (c < 324) charByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"not a byte-BPE token char: U+${c.toHexString}")
      bytes(ci) = b.toByte
      ci += 1
    }
    UTF8String.fromBytes(bytes)
  }

  /** Unigram-LM encode (Kudo 2018 / SentencePiece's segmentation
    * half): lowercase, whitespace-tokenize, then VITERBI
    * minimum-total-cost segmentation of each word over a piece
    * inventory with integer costs — the dynamic program greedy
    * longest-match (WordPiece) only approximates. `best[i]` = min
    * over pieces `p` ending at `i` of `best[i − |p|] + cost(p)`;
    * every single character falls back to `charCost` when not in the
    * inventory, so segmentation never fails. Ties prefer the LONGER
    * piece (deterministic; the SQL oracle's `ORDER BY cost, len
    * DESC`). Returns (tokens, total cost) — the exact-integer total
    * is the oracle's strongest signal. O(word · maxPieceLen) per
    * word, one kernel call per row.
    */
  def unigramEncode(
      text: UTF8String, pieces: Array[String], costs: Array[Long],
      charCost: Long): InternalRow = {
    // values stay EXPLICITLY boxed: with a primitive-valued map,
    // `get` on a miss unboxes null to 0L and every unknown substring
    // becomes a free piece (a real bug this kernel shipped with once)
    val costOf = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    var vi = 0
    while (vi < pieces.length) {
      costOf.put(pieces(vi), java.lang.Long.valueOf(costs(vi)))
      if (pieces(vi).length > maxLen) maxLen = pieces(vi).length
      vi += 1
    }
    val words = text.toLowerCase.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var totalCost = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        val best = new Array[Long](n + 1)
        val bp = new Array[Int](n + 1)
        var i = 1
        while (i <= n) {
          var bestC = Long.MaxValue
          var bestL = 0
          var len = 1
          val lim = math.min(i, maxLen)
          while (len <= lim) {
            val sub = w.substring(i - len, i)
            val boxed: java.lang.Long = costOf.get(sub)
            // a boolean, not a -1 sentinel: trained costs may be any
            // integer, so no cost value can be reserved as "absent"
            val found = (boxed ne null) || len == 1
            if (found) {
              val c0: Long =
                if (boxed ne null) boxed.longValue() else charCost
              val c = best(i - len) + c0
              // len ascends, so `<=` keeps the LONGEST piece among
              // cost ties — the documented tie-break
              if (c < bestC || (c == bestC && len > bestL)) {
                bestC = c; bestL = len
              }
            }
            len += 1
          }
          best(i) = bestC; bp(i) = bestL
          i += 1
        }
        totalCost += best(n)
        val rev = new java.util.ArrayList[String]()
        var j = n
        while (j > 0) { rev.add(w.substring(j - bp(j), j)); j -= bp(j) }
        var ri = rev.size - 1
        while (ri >= 0) { out += UTF8String.fromString(rev.get(ri)); ri -= 1 }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray),
        totalCost))
  }

  /** [[unigramEncode]] with deterministic SUBWORD SAMPLING (Kudo 2018
    * §4 — subword regularization: training on sampled, not argmax,
    * segmentations regularizes the downstream model; SentencePiece
    * samples from the n-best lattice). This face replaces the sampler
    * with a GUMBEL-STYLE perturb-and-Viterbi: every candidate piece's
    * cost is perturbed by md5-derived noise keyed on (word, piece) —
    * `(first 4 md5 bytes of "useg_" + word + "_" + piece) % noiseMod`
    * — and the SAME Viterbi then picks the argmin path. Different
    * word forms draw independent perturbations (segmentation
    * diversity across the corpus, the Kudo training signal) while
    * every decision is a pure function of the inputs: the DuckDB
    * oracle replays the noise with the `'0x' || substr(md5(…),1,8)`
    * construction the trained-cost formula already uses, and retries/
    * shuffles cannot change the output. `noiseMod = 1` is exactly
    * [[unigramEncode]] (noise ≡ 0 — spec-pinned).
    */
  def unigramEncodeSampled(
      text: UTF8String, pieces: Array[String], costs: Array[Long],
      charCost: Long, noiseMod: Int): InternalRow = {
    val costOf = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    var vi = 0
    while (vi < pieces.length) {
      costOf.put(pieces(vi), java.lang.Long.valueOf(costs(vi)))
      if (pieces(vi).length > maxLen) maxLen = pieces(vi).length
      vi += 1
    }
    val md = md5Local.get()
    def noise(word: String, piece: String): Long = {
      md.reset()
      val d = md.digest(("useg_" + word + "_" + piece)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 4 digest bytes big-endian unsigned == the oracle's
      // CAST('0x' || substr(md5(…), 1, 8) AS UBIGINT)
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      u % noiseMod
    }
    val words = text.toLowerCase.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var totalCost = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        val best = new Array[Long](n + 1)
        val bp = new Array[Int](n + 1)
        var i = 1
        while (i <= n) {
          var bestC = Long.MaxValue
          var bestL = 0
          var len = 1
          val lim = math.min(i, maxLen)
          while (len <= lim) {
            val sub = w.substring(i - len, i)
            val boxed: java.lang.Long = costOf.get(sub)
            val found = (boxed ne null) || len == 1
            if (found) {
              val c0: Long =
                if (boxed ne null) boxed.longValue() else charCost
              val c = best(i - len) + c0 + noise(w, sub)
              if (c < bestC || (c == bestC && len > bestL)) {
                bestC = c; bestL = len
              }
            }
            len += 1
          }
          best(i) = bestC; bp(i) = bestL
          i += 1
        }
        totalCost += best(n)
        val rev = new java.util.ArrayList[String]()
        var j = n
        while (j > 0) { rev.add(w.substring(j - bp(j), j)); j -= bp(j) }
        var ri = rev.size - 1
        while (ri >= 0) { out += UTF8String.fromString(rev.get(ri)); ri -= 1 }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray),
        totalCost))
  }

  /** WordPiece encode (Wu+ 2016 / BERT): lowercase, whitespace-
    * tokenize, then greedy LONGEST-MATCH-FIRST segmentation of each
    * word against `vocab` — continuation positions match pieces
    * carrying the `##` prefix; a position with no match collapses the
    * WHOLE word to one `[UNK]` (classic BertTokenizer semantics).
    * Longest-match is a length-descending probe of a hash set, bounded
    * by the longest vocab piece — O(word·maxPiece) per word.
    */
  def wordPiece(text: UTF8String, vocab: Array[String]): ArrayData = {
    val pieces = new java.util.HashSet[String]()
    var maxLen = 1
    var vi = 0
    while (vi < vocab.length) {
      val p = vocab(vi)
      pieces.add(p)
      val eff = if (p.startsWith("##")) p.length - 2 else p.length
      if (eff > maxLen) maxLen = eff
      vi += 1
    }
    val words = text.toLowerCase.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val toks = new java.util.ArrayList[String]()
        var pos = 0
        var dead = false
        while (pos < w.length && !dead) {
          var len = math.min(maxLen, w.length - pos)
          var hit: String = null
          while (len >= 1 && hit == null) {
            val sub = w.substring(pos, pos + len)
            val cand = if (pos == 0) sub else "##" + sub
            if (pieces.contains(cand)) hit = cand
            len -= 1
          }
          if (hit == null) dead = true
          else {
            toks.add(hit)
            pos += (if (pos == 0) hit.length else hit.length - 2)
          }
        }
        if (dead) out += UTF8String.fromString("[UNK]")
        else {
          var ti = 0
          while (ti < toks.size) {
            out += UTF8String.fromString(toks.get(ti)); ti += 1
          }
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Unicode NFC normalization (UAX #15, via the JDK's
    * `java.text.Normalizer`): canonical-compose so visually-identical
    * strings hash identically — a REQUIRED step before any exact/
    * fuzzy dedup of web text (U+0065 U+0301 and U+00E9 are the same
    * "é"; unnormalized they produce different shingles, MinHash
    * signatures, and exact-dup digests). Fast path: already-NFC text
    * (the overwhelmingly common case) returns the input buffer
    * untouched — `isNormalized` is a cheap scan with no allocation.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Accent stripping: NFD-decompose, drop non-spacing combining
    * marks (Unicode category Mn), recompose NFC. Matches DuckDB's
    * `strip_accents` on decomposable Latin text (é→e, ü→u); characters
    * with no canonical decomposition (ø, ß) pass through unchanged in
    * both — the folding step of a search/match normalizer, NOT a
    * transliterator.
    */
  def stripAccents(text: UTF8String): UTF8String = {
    val s = text.toString
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    // codepoint-wise pre-scan (charCount steps), mirroring the strip
    // loop below: a UTF-16-char scan would miss supplementary-plane
    // non-spacing marks (e.g. U+1D167 musical combining tremolo),
    // whose surrogate halves never report category Mn, and such
    // strings would exit via the nfc fast path un-stripped.
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      val cp = d.codePointAt(i)
      if (java.lang.Character.getType(cp) ==
          java.lang.Character.NON_SPACING_MARK) hasMark = true
      i += java.lang.Character.charCount(cp)
    }
    if (!hasMark) nfc(text)
    else {
      val sb = new java.lang.StringBuilder(d.length)
      i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (java.lang.Character.getType(cp) !=
            java.lang.Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        i += java.lang.Character.charCount(cp)
      }
      UTF8String.fromString(java.text.Normalizer.normalize(
        sb.toString, java.text.Normalizer.Form.NFC))
    }
  }
}

/** `graft_shingles(text, w)` — distinct w-token shingle hashes. */
case class ShingleHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.shingleHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** `graft_tokenhashes(text)` — per-occurrence token hashes. */
case class TokenHashesExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.tokenHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

/** `graft_gramhashes(text, w)` — ordered per-position w-gram hashes
  * (md5-portable; duplicates kept).
  */
case class GramHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if w < 1 =>
      TypeCheckResult.TypeCheckFailure(s"gram width must be >= 1, got $w")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.gramHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.gramHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** `graft_chargrams(text, k)` — ordered per-position character-k-gram
  * hashes (md5-portable; raw text, code-point positions).
  */
case class CharGramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 =>
      TypeCheckResult.TypeCheckFailure(s"gram width must be >= 1, got $k")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.charGramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.charGramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashesExpr =
    copy(child = newChild)
}

/** `graft_winnow(text, w, k)` — winnowing (fp, fp_pos) selections
  * over k-gram hashes.
  */
case class WinnowExpr(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", StringType, nullable = false),
      StructField("fp_pos", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if w < 1 || k < 1 =>
      TypeCheckResult.TypeCheckFailure(s"window/gram sizes must be >= 1, got w=$w k=$k")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[UTF8String], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.winnow($c, $w, $k)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** `graft_bpe_encode(text, merges_flat)` — BPE encode under a
  * rank-ordered merge list passed as a flattened foldable string array
  * [a0,b0,a1,b1,…] (folded once at construction; only the text is
  * per-row).
  */
case class BpeEncodeExpr(child: Expression, merges: IndexedSeq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if merges.length % 2 != 0 =>
      TypeCheckResult.TypeCheckFailure(
        s"merge list must be flattened (a,b) pairs, got ${merges.length} entries")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val mArr: Array[String] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncode(input.asInstanceOf[UTF8String], mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.bpeEncode($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** `graft_bpe_dropout(text, merges, drop_byte)` — BPE encode with
  * deterministic md5-keyed per-(word, rank) merge dropout
  * (drop probability ≈ drop_byte/256; 0 ≡ plain encode).
  */
case class BpeDropoutExpr(child: Expression, merges: IndexedSeq[String],
    dropByte: Int) extends UnaryExpression {

  override def prettyName: String = "graft_bpe_dropout"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if merges.length % 2 != 0 =>
      TypeCheckResult.TypeCheckFailure("merges must be a flat [a,b,...] pair list")
    case _ if dropByte < 0 || dropByte > 256 =>
      TypeCheckResult.TypeCheckFailure(s"drop_byte must be in [0, 256], got $dropByte")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val mArr: Array[String] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeDropout(input.asInstanceOf[UTF8String], mArr, dropByte)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mArr, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.bpeEncodeDropout($c, $mRef, $dropByte)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDropoutExpr =
    copy(child = newChild)
}

/** `graft_bpe_bytes(text, merges_flat)` — BYTE-level BPE encode
  * (GPT-2 alphabet, lossless, no normalization) under a rank-ordered
  * flattened merge list.
  */
case class BpeBytesEncodeExpr(child: Expression, merges: IndexedSeq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_bpe_bytes"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if merges.length % 2 != 0 =>
      TypeCheckResult.TypeCheckFailure(
        s"merge list must be flattened (a,b) pairs, got ${merges.length} entries")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val mArr: Array[String] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeBytes(input.asInstanceOf[UTF8String], mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeByteMerges", mArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.bpeEncodeBytes($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeBytesEncodeExpr =
    copy(child = newChild)
}

/** `graft_byte_syms(piece)` — byte-alphabet seed symbolization for
  * byte-level BPE training.
  */
case class ByteSymsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_byte_syms"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.byteSyms(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.byteSyms($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteSymsExpr =
    copy(child = newChild)
}

/** `graft_bpe_bytes_decode(toks)` — exact inverse of
  * `graft_bpe_bytes`: tokens → bytes → UTF-8 string.
  */
case class BpeBytesDecodeExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_bpe_bytes_decode"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeDecodeBytes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.bpeDecodeBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeBytesDecodeExpr =
    copy(child = newChild)
}

/** `graft_wordpiece(text, vocab)` — WordPiece greedy longest-match
  * encode against a foldable vocabulary array (folded once at
  * construction; only the text is per-row).
  */
case class WordPieceExpr(child: Expression, vocab: IndexedSeq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_wordpiece"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val vArr: Array[String] = vocab.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordPiece(input.asInstanceOf[UTF8String], vArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("wpVocab", vArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.wordPiece($c, $vRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceExpr =
    copy(child = newChild)
}

/** `graft_unigram(text, pieces, costs, char_cost)` — Unigram-LM
  * Viterbi encode against a foldable piece inventory with integer
  * costs (folded once at construction; only the text is per-row).
  * Returns `struct(toks array<string>, cost bigint)`.
  */
case class UnigramEncodeExpr(
    child: Expression, pieces: IndexedSeq[String],
    costs: IndexedSeq[Long], charCost: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_unigram"
  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("cost", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if pieces.length != costs.length =>
      TypeCheckResult.TypeCheckFailure(
        s"${pieces.length} pieces vs ${costs.length} costs")
    case _ if charCost < 0 =>
      TypeCheckResult.TypeCheckFailure("char fallback cost must be >= 0")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val pArr: Array[String] = pieces.toArray
  private lazy val cArr: Array[Long] = costs.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.unigramEncode(
      input.asInstanceOf[UTF8String], pArr, cArr, charCost.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("ugPieces", pArr, "java.lang.String[]")
    val cRef = ctx.addReferenceObj("ugCosts", cArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.unigramEncode($c, $pRef, $cRef, ${charCost}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

/** `graft_unigram_sampled(text, pieces, costs, char_cost, noise_mod)`
  * — Unigram Viterbi over md5-perturbed costs (deterministic subword
  * sampling; noise_mod = 1 ≡ plain encode).
  */
case class UnigramSampledExpr(
    child: Expression, pieces: IndexedSeq[String],
    costs: IndexedSeq[Long], charCost: Int, noiseMod: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_unigram_sampled"
  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("cost", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if pieces.length != costs.length =>
      TypeCheckResult.TypeCheckFailure(
        s"${pieces.length} pieces vs ${costs.length} costs")
    case _ if charCost < 0 =>
      TypeCheckResult.TypeCheckFailure("char fallback cost must be >= 0")
    case _ if noiseMod < 1 =>
      TypeCheckResult.TypeCheckFailure("noise_mod must be >= 1")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  private lazy val pArr: Array[String] = pieces.toArray
  private lazy val cArr: Array[Long] = costs.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.unigramEncodeSampled(
      input.asInstanceOf[UTF8String], pArr, cArr, charCost.toLong, noiseMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("ugPieces", pArr, "java.lang.String[]")
    val cRef = ctx.addReferenceObj("ugCosts", cArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextKernels.unigramEncodeSampled($c, $pRef, $cRef, " +
        s"${charCost}L, $noiseMod)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSampledExpr =
    copy(child = newChild)
}

/** `graft_simhash64(token_hashes)` — 64-bit SimHash fingerprint. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<bigint> not null, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `graft_minhash(shingles, k)` — k-permutation MinHash signature. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.minHashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.minHashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** `graft_hyperplane_sig(embedding, planes)` — packed sign bits of
  * `planes` pseudo-random hyperplane dot products (LSH bucket key).
  */
case class HyperplaneSigExpr(child: Expression, planes: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.hyperplaneSig(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.hyperplaneSig($c, $planes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

/** `graft_quantize(embedding, scale)` — integer-quantized vector. */
case class QuantizeExpr(child: Expression, scale: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.quantize(input.asInstanceOf[ArrayData], scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.quantize($c, $scale, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
}

/** `graft_nfc(text)` — Unicode NFC canonical composition (UAX #15);
  * the normalize-before-hash step of the dedup family.
  */
case class NfcExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

/** `graft_strip_accents(text)` — NFD-decompose, drop combining marks
  * (Mn), NFC-recompose; DuckDB `strip_accents` parity on decomposable
  * Latin text.
  */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}
