package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** BPE training/encoding vs an independent in-memory implementation of
  * Sennrich+ 2016 Algorithm 1 — the engine's relational formulation
  * (pair table + argmax + fold-merge) must agree with the direct
  * imperative one on merges learned, encodings produced, and the
  * adversarial merge cases (runs, alternations) where a wrong fold
  * would silently diverge.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- in-memory reference (Sennrich+ 2016, Algorithm 1) ----

  private def refSymbolize(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndOfWord

  /** Greedy leftmost non-overlapping single-merge pass. */
  private def refMergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refPairCounts(vocab: Map[Vector[String], Long]): Map[(String, String), Long] =
    vocab.toSeq
      .flatMap { case (s, n) => s.zip(s.tail).map(p => (p, n)) }
      .groupMapReduce(_._1)(_._2)(_ + _)

  /** Train k merges; argmax by count, ties to lexicographically
    * smallest (a,b) — the engine's orderBy(cnt desc, a, b) rule.
    */
  private def refTrain(wordFreq: Map[String, Long], k: Int): Seq[(String, String)] = {
    var vocab = wordFreq.map { case (w, n) => refSymbolize(w) -> n }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) done = true
      else {
        val max = pc.values.max
        val pair = pc.collect { case (p, n) if n == max => p }.min
        merges += pair
        vocab = vocab.map { case (s, n) => refMergeOnce(s, pair._1, pair._2) -> n }
      }
      i += 1
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
      merges.foldLeft(refSymbolize(w)) { case (s, (a, b)) => refMergeOnce(s, a, b) }
    }

  /** The paper's worked vocabulary: low×5 lower×2 newest×6 widest×3,
    * shaped as a documents table (one doc per word occurrence).
    */
  private val sennrichFreq =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def sennrichDocs = {
    val rows = sennrichFreq.toSeq.sortBy(_._1).flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    rows.toDF("doc_id", "text")
  }

  test("trainBpe matches the in-memory reference on the Sennrich fixture") {
    val got = Bpe.trainBpe(sennrichDocs, numMerges = 6)
    val want = refTrain(sennrichFreq, 6)
    assert(got == want, s"engine $got vs reference $want")
    // paper sanity anchor: (e,s) is the first merge (count 9, lexical
    // winner of the 9-way tie with (s,t) and (t,</w>))
    assert(got.head == (("e", "s")))
  }

  test("golden: the published Sennrich et al. merge sequence and 'lowest' segmentation") {
    // Sennrich, Haddow & Birch 2016 (arXiv:1508.07909) Fig. 1's worked
    // example — corpus {low:5, lower:2, newest:6, widest:3}. The first
    // merges the paper derives, HARD-CODED (not recomputed by any
    // reference implementation in this repo): e+s and es+t from the
    // newest/widest suffix (count 9), the word-final est</w>, then the
    // l+o / lo+w prefix of low/lower (count 7). Ranks 0-2 tie at
    // count 9; the deterministic (count desc, a, b) tie-break picks
    // them in exactly the paper's order.
    val merges = Bpe.trainBpe(sennrichDocs, numMerges = 5)
    val published = Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w"))
    assert(merges == published,
      s"trained merges $merges diverge from the published sequence $published")
    // the paper's motivating segmentation: the UNSEEN word "lowest"
    // decomposes into the learned units low + est</w>
    val seg = Seq((0L, "lowest")).toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(seg == Seq("low", "est" + Bpe.EndOfWord),
      s"'lowest' segmented as $seg, want [low, est</w>]")
  }

  test("trainBpe stops when no adjacent pairs remain") {
    // single-char words collapse to one fused symbol after one merge
    // each; asking for more merges than exist must terminate
    val docs = Seq((0L, "a a b"), (1L, "b a")).toDF("doc_id", "text")
    val got = Bpe.trainBpe(docs, numMerges = 50)
    val want = refTrain(Map("a" -> 3L, "b" -> 2L), 50)
    assert(got == want)
    assert(got.size < 50)
  }

  test("mergeOnce equals the greedy leftmost scan on adversarial and random arrays") {
    val adversarial: Seq[(Vector[String], (String, String))] = Seq(
      // run of the pair's own symbol: greedy takes (0,1),(2,3) leaving
      // the LAST b single — order matters, [bb,b,bb] would be wrong
      (Vector("b", "b", "b", "b", "b"), ("b", "b")),
      (Vector("b", "b", "b"), ("b", "b")),
      // alternation: every (a,b) adjacency is disjoint, all fuse
      (Vector("a", "b", "a", "b", "a", "b"), ("a", "b")),
      (Vector("a", "b", "a", "b", "a"), ("a", "b")),
      // fusion must not chain into the next element
      (Vector("a", "b", "b"), ("a", "b")),
      (Vector("a", "a", "b"), ("a", "b")),
      (Vector("a"), ("a", "b")),
      (Vector(), ("a", "b")))
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", Bpe.EndOfWord)
    val random = (1 to 120).map { _ =>
      val syms = Vector.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      val pair = (alphabet(rnd.nextInt(3)), alphabet(rnd.nextInt(3)))
      (syms, pair)
    }
    for (((syms, (a, b)), i) <- (adversarial ++ random).zipWithIndex) {
      val got = Seq(Tuple1(syms)).toDF("s")
        .select(Bpe.mergeOnce(col("s"), a, b).as("m"))
        .as[Seq[String]].head()
      val want = refMergeOnce(syms, a, b)
      assert(got == want, s"case $i: merge ($a,$b) on $syms: engine $got vs reference $want")
    }
  }

  test("encode matches the reference under the registered fixture merges on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 30).select("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.encode(col("text"), Bpe.fixtureMerges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    for ((id, text) <- texts) {
      val want = refEncode(text, Bpe.fixtureMerges)
      assert(got(id) == want, s"doc $id")
    }
  }

  test("kernel encode ≡ fold encode on real docs, trained, arbitrary and a==b merges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val trained = Bpe.trainBpe(docs, numMerges = 6)
    val cases = Seq(
      Bpe.fixtureMerges,
      trained,
      // a==b run merges and merges-of-merges — the semantics the SQL
      // oracle can't express but the kernel and fold both must
      Seq(("e", "e"), ("ee", "e"), ("t", "h"), ("th", "e")),
      Seq.empty[(String, String)])
    for (merges <- cases) {
      val bad = docs.select(
          Bpe.encode(col("text"), merges).as("kernel"),
          Bpe.encodeFold(col("text"), merges).as("fold"))
        .filter(col("kernel") =!= col("fold"))
        .collect()
      assert(bad.isEmpty, s"kernel/fold diverge under $merges: ${bad.headOption}")
    }
  }

  test("encodeDropout: dropByte=0 ≡ encode; fertility rises with the drop rate; decisions replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val merges = Bpe.fixtureMerges
    def toks(dropByte: Int) = docs.select(col("doc_id"),
        Bpe.encodeDropout(col("text"), merges, dropByte).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val plain = docs.select(col("doc_id"),
        Bpe.encode(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    // dropByte = 0: every decision keeps — exactly the plain encode
    assert(toks(0) == plain)
    // dropByte = 256: every decision drops — pure character encode,
    // the fertility ceiling
    val t64 = toks(64)
    val t128 = toks(128)
    val t256 = toks(256)
    def total(m: Map[Long, Seq[String]]) = m.values.map(_.size.toLong).sum
    // dropping merges can only starve fusions: token counts rise
    // monotonically with the drop rate, strictly on a real corpus
    assert(total(plain) < total(t64), s"${total(plain)} vs ${total(t64)}")
    assert(total(t64) < total(t128))
    assert(total(t128) <= total(t256))
    // per-doc: never below the plain encode, never above char-level
    for ((id, ts) <- t64) {
      assert(ts.size >= plain(id).size, s"doc $id shrank under dropout")
      assert(ts.size <= t256(id).size, s"doc $id exceeded char encode")
    }
    // md5-keyed decisions are a pure function of (word, rank): a
    // second run replays bit-for-bit
    assert(toks(64) == t64)
    // decode still inverts: merges only concatenate, dropped or not
    val rt = docs.select(col("doc_id"),
        Bpe.decode(Bpe.encodeDropout(col("text"), merges, 64)).as("rt"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("want"))
      .filter(col("rt") =!= col("want")).count()
    assert(rt == 0L)
  }

  test("decode∘encode is the identity on normalized text for trained AND arbitrary merges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val trained = Bpe.trainBpe(docs, numMerges = 10)
    // arbitrary list incl. an a==b merge and a merge-of-a-merge
    val arbitrary = Seq(("e", "e"), ("t", "h"), ("th", "e"), ("a", Bpe.EndOfWord))
    for (merges <- Seq(Bpe.fixtureMerges, trained, arbitrary, Seq.empty)) {
      val bad = docs.select(col("doc_id"),
          Bpe.decode(Bpe.encode(col("text"), merges)).as("rebuilt"),
          concat_ws(" ", filter(split(lower(col("text")), "\\s+"),
            w => length(w) > 0)).as("want"))
        .filter(col("rebuilt") =!= col("want"))
        .collect()
      assert(bad.isEmpty, s"roundtrip broke under $merges: ${bad.headOption}")
    }
  }

  test("byte-BPE: bit-for-bit lossless roundtrip on emoji/CJK/control/any-UTF-8 input") {
    // the property that distinguishes the byte face from the char
    // face: NOTHING is normalized or dropped — decode(encode(x)) == x
    // exactly, for any input, under any merge list, with no [UNK]
    val texts = Seq(
      "hello world",
      "Héllo WÖRLD — mixed Ça",           // latin-1 accents + dash
      "日本語のテキスト 中文 한국어",          // CJK multi-byte
      "emoji 🎉🎊 👩‍👩‍👧‍👦 flags 🇵🇭",      // 4-byte + ZWJ sequences
      "tabs\tand\nnewlines\r\n  double  spaces ",
      "ASCII with UPPER case preserved",
      "")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val trained = Bpe.trainBpe(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 40), numMerges = 6)
    for (merges <- Seq(Bpe.fixtureByteMerges, trained, Seq.empty)) {
      val got = df.select(col("doc_id"),
          Bpe.decodeBytes(Bpe.encodeBytes(col("text"), merges)).as("rebuilt"))
        .as[(Long, String)].collect().toMap
      for ((i, t) <- texts.zipWithIndex.map(_.swap))
        assert(got(i.toLong) == t,
          s"byte roundtrip broke under $merges on doc $i: ${got(i.toLong)}")
    }
  }

  test("byte-BPE: hand-checked segmentation — rank chaining, case sensitivity, Ġ for space") {
    val df = Seq((0L, "the thin Thing in an")).toDF("doc_id", "text")
    val got = df.select(
        Bpe.encodeBytes(col("text"), Bpe.fixtureByteMerges).as("toks"))
      .as[Seq[String]].head()
    // merges (t,h) (th,e) (i,n) (a,n): "the"→the (rank chain),
    // "thin"→th+in, "Thing"→T,h,in,g (NO lowercase: 'T'≠'t'),
    // space pieces → 'Ġ' (mapped byte 32), "in"→in, "an"→an
    val g = "Ġ"
    assert(got == Seq("the", g, "th", "in", g, "T", "h", "in", "g",
      g, "in", g, "an"), got)
  }

  test("byte-BPE trainer: hand-derived merges on a tiny corpus; trained merges roundtrip") {
    // corpus "low low low lower": pieces = 3×"low", "lower", single
    // spaces (1 symbol → no pairs). Round 1 pairs: (l,o)=4, (o,w)=4 —
    // tie breaks (cnt desc, a, b) → (l,o). Round 2: (lo,w)=4.
    // Round 3: only "lower" has pairs left — (e,r) vs (low,e), both 1,
    // 'e' < 'low' → (e,r). NO </w> anywhere (byte face).
    val docs = Seq((0L, "low low low lower")).toDF("doc_id", "text")
    val merges = Bpe.trainBpeBytes(docs, numMerges = 3)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")), merges)
    // the trained artifact drives the byte encoder and still decodes
    // back bit-for-bit
    val rebuilt = docs.select(
        Bpe.decodeBytes(Bpe.encodeBytes(col("text"), merges)).as("t"))
      .as[String].head()
    assert(rebuilt == "low low low lower")
    val toks = docs.select(
        Bpe.encodeBytes(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(toks == Seq("low", "Ġ", "low", "Ġ", "low", "Ġ", "low", "er"),
      toks)
  }

  test("byte-BPE: every byte's mapped char is printable and the alphabet is a bijection") {
    val bc = graft.plans.TextKernels.byteChar
    assert(bc.length == 256)
    assert(bc.toSet.size == 256, "byte alphabet must be injective")
    for (c <- bc) {
      assert(!Character.isWhitespace(c) && !Character.isISOControl(c),
        s"mapped char U+${c.toInt.toHexString} is whitespace/control")
    }
    // the published anchors: printable ASCII identity, space → Ġ
    assert(bc('a'.toInt) == 'a' && bc('~'.toInt) == '~' && bc(33) == '!')
    assert(bc(32) == 'Ġ') // Ġ
    assert(bc(0) == 'Ā')  // first shifted byte → Ā
  }

  test("trained merges compress: tokenCounts under trained BPE ≤ char count, equals reference") {
    val merges = Bpe.trainBpe(sennrichDocs, numMerges = 8)
    val got = Bpe.tokenCounts(sennrichDocs, merges)
      .as[(Long, Int)].collect().toMap
    val texts = sennrichDocs.as[(Long, String)].collect().toMap
    for ((id, text) <- texts) {
      val want = refEncode(text, merges).size
      assert(got(id) == want, s"doc $id")
      assert(got(id) <= text.length + 1)
    }
    // 8 merges on this vocab fully fuse the paper words: "newest"
    // encodes to one token
    assert(refEncode("newest", merges).size == 1)
  }
}
