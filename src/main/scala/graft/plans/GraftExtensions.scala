package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the native vector expressions: either through
  * `SparkSessionExtensions` (`.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.plans.GraftExtensions`) or imperatively
  * on an existing session via [[GraftFunctions.register]]. SQL names:
  * `graft_dot`, `graft_norm_sq`, `graft_hamming64`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => NormalizeChainSimplification)
  }
}

object GraftFunctions {

  private[plans] val specs: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => ArrayDotProduct(es(0), es(1))),
    ("graft_norm_sq",
      new ExpressionInfo(classOf[ArrayNormSq].getName, "graft_norm_sq"),
      (es: Seq[Expression]) => ArrayNormSq(es.head)),
    ("graft_hamming64",
      new ExpressionInfo(classOf[Hamming64].getName, "graft_hamming64"),
      (es: Seq[Expression]) => Hamming64(es(0), es(1))),
    ("graft_bag_dot",
      new ExpressionInfo(classOf[BagDotExpr].getName, "graft_bag_dot"),
      (es: Seq[Expression]) => BagDotExpr(es(0), es(1), es(2), es(3))),
    ("graft_hilbert2",
      new ExpressionInfo(classOf[Hilbert2Expr].getName, "graft_hilbert2"),
      (es: Seq[Expression]) => Hilbert2Expr(es(0), es(1), foldedInt(es(2)))),
    // Text/dedup kernels: the scalar second argument must be a foldable
    // literal (shingle width / permutation count / plane count).
    ("graft_shingles",
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingles"),
      (es: Seq[Expression]) => ShingleHashesExpr(es(0), foldedInt(es(1)))),
    ("graft_tokenhashes",
      new ExpressionInfo(classOf[TokenHashesExpr].getName, "graft_tokenhashes"),
      (es: Seq[Expression]) => TokenHashesExpr(es.head)),
    ("graft_gramhashes",
      new ExpressionInfo(classOf[GramHashesExpr].getName, "graft_gramhashes"),
      (es: Seq[Expression]) => GramHashesExpr(es(0), foldedInt(es(1)))),
    ("graft_chargrams",
      new ExpressionInfo(classOf[CharGramHashesExpr].getName, "graft_chargrams"),
      (es: Seq[Expression]) => CharGramHashesExpr(es(0), foldedInt(es(1)))),
    ("graft_nfc",
      new ExpressionInfo(classOf[NfcExpr].getName, "graft_nfc"),
      (es: Seq[Expression]) => NfcExpr(es.head)),
    ("graft_strip_accents",
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "graft_strip_accents"),
      (es: Seq[Expression]) => StripAccentsExpr(es.head)),
    ("graft_winnow",
      new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowExpr(es(0), foldedInt(es(1)), foldedInt(es(2)))),
    ("graft_bpe_encode",
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "graft_bpe_encode"),
      (es: Seq[Expression]) => BpeEncodeExpr(es(0), foldedStringArray(es(1)))),
    ("graft_bpe_dropout",
      new ExpressionInfo(classOf[BpeDropoutExpr].getName, "graft_bpe_dropout"),
      (es: Seq[Expression]) => BpeDropoutExpr(es(0), foldedStringArray(es(1)),
        foldedInt(es(2)))),
    ("graft_bpe_bytes",
      new ExpressionInfo(classOf[BpeBytesEncodeExpr].getName, "graft_bpe_bytes"),
      (es: Seq[Expression]) => BpeBytesEncodeExpr(es(0), foldedStringArray(es(1)))),
    ("graft_byte_syms",
      new ExpressionInfo(classOf[ByteSymsExpr].getName, "graft_byte_syms"),
      (es: Seq[Expression]) => ByteSymsExpr(es(0))),
    ("graft_bpe_bytes_decode",
      new ExpressionInfo(classOf[BpeBytesDecodeExpr].getName,
        "graft_bpe_bytes_decode"),
      (es: Seq[Expression]) => BpeBytesDecodeExpr(es(0))),
    ("graft_wordpiece",
      new ExpressionInfo(classOf[WordPieceExpr].getName, "graft_wordpiece"),
      (es: Seq[Expression]) => WordPieceExpr(es(0), foldedStringArray(es(1)))),
    ("graft_unigram",
      new ExpressionInfo(classOf[UnigramEncodeExpr].getName, "graft_unigram"),
      (es: Seq[Expression]) => UnigramEncodeExpr(es(0),
        foldedStringArray(es(1)), foldedLongArray(es(2)), foldedInt(es(3)))),
    ("graft_unigram_sampled",
      new ExpressionInfo(classOf[UnigramSampledExpr].getName, "graft_unigram_sampled"),
      (es: Seq[Expression]) => UnigramSampledExpr(es(0),
        foldedStringArray(es(1)), foldedLongArray(es(2)), foldedInt(es(3)),
        foldedInt(es(4)))),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSigExpr(es(0), foldedInt(es(1)))),
    ("graft_hyperplane_sig",
      new ExpressionInfo(classOf[HyperplaneSigExpr].getName, "graft_hyperplane_sig"),
      (es: Seq[Expression]) => HyperplaneSigExpr(es(0), foldedInt(es(1)))),
    ("graft_quantize",
      new ExpressionInfo(classOf[QuantizeExpr].getName, "graft_quantize"),
      (es: Seq[Expression]) => QuantizeExpr(es(0), foldedInt(es(1)))),
    // PQ kernels: codebook + shape are foldable literals, folded once
    // at construction — only the vector is per-row.
    ("graft_pq_encode",
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      (es: Seq[Expression]) => PqEncodeExpr(es(0), foldedLongArray(es(1)),
        foldedInt(es(2)), foldedInt(es(3)))),
    ("graft_pq_dt",
      new ExpressionInfo(classOf[PqDistTableExpr].getName, "graft_pq_dt"),
      (es: Seq[Expression]) => PqDistTableExpr(es(0), foldedLongArray(es(1)),
        foldedInt(es(2)), foldedInt(es(3)))),
    ("graft_pq_adc",
      new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
      (es: Seq[Expression]) => PqAdcExpr(es(0), es(1), foldedInt(es(2)))),
    // SQ8 kernels: trained (min, width) ranges are foldable literals.
    ("graft_sq_encode",
      new ExpressionInfo(classOf[SqEncodeExpr].getName, "graft_sq_encode"),
      (es: Seq[Expression]) => SqEncodeExpr(es(0), foldedLongArray(es(1)),
        foldedLongArray(es(2)))),
    ("graft_sq_adc",
      new ExpressionInfo(classOf[SqAdcExpr].getName, "graft_sq_adc"),
      (es: Seq[Expression]) => SqAdcExpr(es(0), es(1), foldedLongArray(es(2)),
        foldedLongArray(es(3)))),
  )

  private def foldedInt(e: Expression): Int = {
    require(e.foldable, s"expected a foldable integer literal, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def foldedStringArray(e: Expression): IndexedSeq[String] = {
    require(e.foldable, s"expected a foldable string-array literal, got $e")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
      .toIndexedSeq
  }

  private def foldedLongArray(e: Expression): IndexedSeq[Long] = {
    require(e.foldable, s"expected a foldable array literal, got $e")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toIndexedSeq
  }

  /** Idempotent imperative registration on a live session: the kernel
    * functions plus the normalization-chain optimizer rule (appended
    * to `experimental.extraOptimizations` exactly once).
    */
  def register(spark: SparkSession): Unit = {
    specs.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(NormalizeChainSimplification))
      spark.experimental.extraOptimizations =
        cur :+ NormalizeChainSimplification
  }

  /** Register on the thread's active (or default) session. The
    * Column-level wrappers ([[graft.functions.Similarity.quantized]],
    * [[graft.functions.Dedup.nativeShingles]], …) call this before
    * emitting a `call_function`, so they resolve on ANY session —
    * including a fresh one that never ran a registering pipeline.
    * (Spark 4 analyzes `Dataset.select` eagerly, so resolution must be
    * guaranteed at Column-construction time, not first-action time.)
    */
  def registerActive(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)

  /** Column-API wrappers (register first). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }
  def normSq(spark: SparkSession, a: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_norm_sq", a)
  }
  def hamming64(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_hamming64", a, b)
  }
  def bagDot(spark: SparkSession, aTerms: Column, aTfs: Column,
      bTerms: Column, bTfs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_bag_dot", aTerms, aTfs, bTerms, bTfs)
  }
  def hilbert2(spark: SparkSession, x: Column, y: Column, bits: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_hilbert2", x, y,
      org.apache.spark.sql.functions.lit(bits))
  }
}
