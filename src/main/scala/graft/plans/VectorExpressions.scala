package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot paths (SURVEY.md
  * §2.9 extension note; builder preference order (b): a custom
  * `Expression` with `doGenCode` beats the interpreted higher-order
  * `aggregate`/`zip_with` lambdas it replaces).
  *
  * All operate on quantized integer vectors (`array<bigint>`, see
  * [[graft.functions.Similarity.quantized]]) so arithmetic is exact and
  * engine-independent. Inputs are bounded (|component| ≤ ~10^3, dims ≤
  * ~10^4) so products fit comfortably in 64 bits.
  */

/** Exact integer dot product of two equal-length long arrays. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"expected (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact integer squared L2 norm of a long array. */
case class ArrayNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getLong(i); acc += x * x; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  ${ev.value}Acc += $x * $x;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNormSq =
    copy(child = newChild)
}

/** Static PQ kernels (called from both interpreted eval and generated
  * code). The codebook is a FLAT long[] in (j, c, d) row-major layout —
  * `cb[(j*ksub + c)*dsub + d]` — materialized ONCE per task as a
  * reference object, not rebuilt per row.
  */
object PqKernels {

  /** codes[j] = argmin_c ‖sub_j − cw_{j,c}‖² (ties → lowest c). The
    * ‖sub_j‖² term is constant within a (row, subspace) argmin and is
    * dropped; the comparison key is ‖cw‖² − 2·sub·cw, exact integers.
    */
  def encode(vec: ArrayData, cb: Array[Long], m: Int, ksub: Int): ArrayData = {
    val dsub = vec.numElements() / m
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var wn = 0L
        var dot = 0L
        var d = 0
        while (d < dsub) {
          val w = cb(base + d)
          wn += w * w
          dot += vec.getLong(j * dsub + d) * w
          d += 1
        }
        val dist = wn - 2L * dot
        if (dist < bestD) { bestD = dist; bestC = c }
        c += 1
      }
      out(j) = bestC.toLong
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Flat distance table dt[j*ksub + c] = exact ‖sub_j − cw_{j,c}‖². */
  def distTable(vec: ArrayData, cb: Array[Long], m: Int, ksub: Int): ArrayData = {
    val dsub = vec.numElements() / m
    val out = new Array[Long](m * ksub)
    var j = 0
    while (j < m) {
      var qn = 0L
      var d = 0
      while (d < dsub) {
        val x = vec.getLong(j * dsub + d)
        qn += x * x
        d += 1
      }
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var wn = 0L
        var dot = 0L
        var dd = 0
        while (dd < dsub) {
          val w = cb(base + dd)
          wn += w * w
          dot += vec.getLong(j * dsub + dd) * w
          dd += 1
        }
        out(j * ksub + c) = qn + wn - 2L * dot
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC distance: Σ_j dt[j*ksub + codes[j]]. */
  def adc(dt: ArrayData, codes: ArrayData, ksub: Int): Long = {
    var acc = 0L
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      acc += dt.getLong(j * ksub + codes.getLong(j).toInt)
      j += 1
    }
    acc
  }
}

/** `graft_pq_encode(vec, codebook, m, ksub)` — PQ codes per vector.
  * The codebook/m/ksub arguments are foldable literals, folded at
  * construction; only the vector is per-row.
  */
case class PqEncodeExpr(child: Expression, codebook: IndexedSeq[Long],
    m: Int, ksub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<bigint>, got $other")
    }

  private lazy val cbArr: Array[Long] = codebook.toArray

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cbArr, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PqKernels.encode($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `graft_pq_dt(vec, codebook, m, ksub)` — flat m×ksub ADC distance
  * table for a query vector.
  */
case class PqDistTableExpr(child: Expression, codebook: IndexedSeq[Long],
    m: Int, ksub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<bigint>, got $other")
    }

  private lazy val cbArr: Array[Long] = codebook.toArray

  override def nullSafeEval(v: Any): Any =
    PqKernels.distTable(v.asInstanceOf[ArrayData], cbArr, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.PqKernels.distTable($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTableExpr =
    copy(child = newChild)
}

/** `graft_pq_adc(dt, codes, ksub)` — ADC lookup-sum. */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"expected (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(dt: Any, codes: Any): Any =
    PqKernels.adc(dt.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dt, codes) =>
      s"${ev.value} = graft.plans.PqKernels.adc($dt, $codes, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar-quantization (FAISS SQ8 shape) kernels: per-dimension 8-bit
  * codes against corpus-trained (min, width) ranges. Exact nonnegative
  * integer arithmetic only — truncating and floor division coincide on
  * the nonneg domain, so DuckDB `//`, Spark `div` and JVM `/` all
  * reproduce the same codes and reconstructions.
  */
object SqKernels {

  /** code_d = clamp(((v_d − min_d)·256) div width_d, 0, 255) — in-range
    * values land in [0,255] by construction; the clamp only guards
    * vectors outside the trained range.
    */
  def encode(vec: ArrayData, mins: Array[Long], widths: Array[Long]): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](n)
    var d = 0
    while (d < n) {
      val c = ((vec.getLong(d) - mins(d)) * 256L) / widths(d)
      out(d) = math.max(0L, math.min(255L, c))
      d += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Asymmetric distance Σ_d (q_d − recon_d)² with bucket-midpoint
    * reconstruction recon_d = min_d + ((2·code_d + 1)·width_d) div 512.
    */
  def adc(q: ArrayData, codes: ArrayData,
      mins: Array[Long], widths: Array[Long]): Long = {
    var acc = 0L
    var d = 0
    val n = q.numElements()
    while (d < n) {
      val recon = mins(d) + ((2L * codes.getLong(d) + 1L) * widths(d)) / 512L
      val diff = q.getLong(d) - recon
      acc += diff * diff
      d += 1
    }
    acc
  }
}

/** `graft_sq_encode(vec, mins, widths)` — SQ8 codes per vector; the
  * trained ranges are foldable literals, folded at construction.
  */
case class SqEncodeExpr(child: Expression, mins: IndexedSeq[Long],
    widths: IndexedSeq[Long]) extends UnaryExpression {

  override def prettyName: String = "graft_sq_encode"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if mins.length != widths.length || widths.exists(_ <= 0L) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("mins/widths must align and widths be positive")
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected array<bigint>, got $other")
    }

  private lazy val mArr: Array[Long] = mins.toArray
  private lazy val wArr: Array[Long] = widths.toArray

  override def nullSafeEval(v: Any): Any =
    SqKernels.encode(v.asInstanceOf[ArrayData], mArr, wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("sqMins", mArr, "long[]")
    val wRef = ctx.addReferenceObj("sqWidths", wArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SqKernels.encode($c, $mRef, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncodeExpr =
    copy(child = newChild)
}

/** `graft_sq_adc(q, codes, mins, widths)` — exact asymmetric distance
  * of a full query vector against SQ8 codes.
  */
case class SqAdcExpr(left: Expression, right: Expression,
    mins: IndexedSeq[Long], widths: IndexedSeq[Long])
    extends BinaryExpression {

  override def prettyName: String = "graft_sq_adc"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if mins.length != widths.length || widths.exists(_ <= 0L) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("mins/widths must align and widths be positive")
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"expected (array<bigint>, array<bigint>), got ($l, $r)")
    }

  private lazy val mArr: Array[Long] = mins.toArray
  private lazy val wArr: Array[Long] = widths.toArray

  override def nullSafeEval(q: Any, codes: Any): Any =
    SqKernels.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      mArr, wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("sqMins", mArr, "long[]")
    val wRef = ctx.addReferenceObj("sqWidths", wArr, "long[]")
    nullSafeCodeGen(ctx, ev, (q, codes) =>
      s"${ev.value} = graft.plans.SqKernels.adc($q, $codes, $mRef, $wRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** 2-D Hilbert curve index: the iterative rotate/flip xy→d transform
  * (the classic public-domain formulation — e.g. Warren, Hacker's
  * Delight; Hamilton & Rau-Chaplin 2008 give the N-D general form).
  * Shared by interpreted eval and codegen so both paths are the same
  * arithmetic.
  */
object HilbertKernel {
  /** Map a `bits`-bit (x, y) cell to its Hilbert distance in
    * [0, 2^(2·bits)). Pure integer rotate/flip loop — exact,
    * engine-portable, branch structure mirrored verbatim in the
    * oracle's unrolled per-level CTEs.
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate the quadrant frame
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert index of a quantized (x, y) pair — the locality-preserving
  * alternative to Morton interleave for multi-dimensional file layout
  * (consecutive Hilbert cells are always grid-adjacent; Morton takes
  * long diagonal jumps at quadrant boundaries, which widens per-file
  * min/max zones). `bits` is construction-time (foldable literal).
  */
case class Hilbert2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected (bigint, bigint), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertKernel.xy2d(bits, l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HilbertKernel.xy2d($bits, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2Expr =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two 64-bit fingerprints (popcount of xor) —
  * SimHash verification.
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected (bigint, bigint), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two SPARSE term-frequency bags, each
  * given as aligned (terms sorted ascending, tfs) array pairs — the
  * verification kernel for Bayardo APSS cosine
  * ([[graft.functions.Dedup.bagCosinePairs]]). A two-pointer merge
  * over the binary-sorted term arrays (the same UTF8String order
  * `array_sort` produces), so each candidate pair costs
  * O(|a| + |b|) primitive comparisons in generated code instead of
  * the interpreted `map_zip_with` + `aggregate` lambda pair it
  * replaces (which allocates a merged map per row).
  */
case class BagDotExpr(aTerms: Expression, aTfs: Expression,
    bTerms: Expression, bTfs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = aTerms
  override def second: Expression = aTfs
  override def third: Expression = bTerms
  override def fourth: Expression = bTfs

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (aTerms.dataType, aTfs.dataType, bTerms.dataType, bTfs.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(LongType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"expected (array<string>, array<bigint>) × 2, got $other")
    }

  override def nullSafeEval(at: Any, af: Any, bt: Any, bf: Any): Any =
    BagDotKernel.dot(at.asInstanceOf[ArrayData], af.asInstanceOf[ArrayData],
      bt.asInstanceOf[ArrayData], bf.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (at, af, bt, bf) =>
      s"${ev.value} = graft.plans.BagDotKernel.dot($at, $af, $bt, $bf);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): BagDotExpr =
    copy(aTerms = newFirst, aTfs = newSecond,
      bTerms = newThird, bTfs = newFourth)
}

/** Static kernel shared by interpreted eval and generated code. */
object BagDotKernel {
  def dot(aT: ArrayData, aF: ArrayData, bT: ArrayData, bF: ArrayData): Long = {
    val n = aT.numElements()
    val m = bT.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val c = aT.getUTF8String(i).compareTo(bT.getUTF8String(j))
      if (c == 0) { acc += aF.getLong(i) * bF.getLong(j); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }
}
