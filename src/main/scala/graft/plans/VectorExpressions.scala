package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused dot product over two `array<float>` columns.
  *
  * Semantically identical (bit-for-bit) to the composed Column form
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)` — float widened before multiply, products
  * accumulated left-to-right, null result on length mismatch or null
  * element (zip_with pads the shorter side with null; null poisons the
  * sum). Oracle-checked queries can therefore swap freely between the
  * two forms.
  *
  * Why it exists: the HOF form materializes the products as an
  * intermediate array per pair and walks it with per-element lambda
  * dispatch; this expression is one primitive loop over the two
  * ArrayData buffers inside whole-stage codegen — the preferred
  * "custom Catalyst Expression beats UDF" path for the ANN hot loop
  * (SURVEY.md §4).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.plans.VecDot.compute($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** Native multi-probe LSH bucket set: `probe_buckets(vec, bits,
  * nProbe)` — the vector's sign bucket over the first `bits` dims plus
  * the nProbe−1 Hamming-1 neighbors flipped at the smallest-|component|
  * dims (Lv et al., VLDB 2007), as ONE expression.
  *
  * Value-identical to the composed Column form (sign chars from
  * `try_element_at(a,i) > 0` — null / missing / ≤0 read '0', NaN reads
  * '1' under Spark's NaN-greatest comparison semantics;
  * flip order by (|a_i| asc, dim asc) with a null |a_i| sorting first,
  * matching array_sort's NULLS-FIRST struct compare; NaN |a_i| sorts
  * LAST like Spark's double ordering) — spec-pinned differentially, so
  * the q118 oracle is unchanged. One divergence by design: `nProbe >
  * bits + 1` asks for more probes than distinct Hamming-1 neighbors
  * exist, so the output clamps at `bits + 1` buckets (the Column form
  * threw under ANSI `element_at` there — graceful beats mid-task
  * crash; `Similarity.lshTopKMultiProbe` clamps symmetrically).
  *
  * Why it exists: the unrolled Column form builds an O(bits·nProbe)
  * tree of concat/when/substr whose generated code trips a janino
  * compile error ("isNull_X is not an rvalue") inside whole-stage
  * codegen — every multi-probe stage was silently falling back to
  * interpreted eval after ~96 logged compile attempts, and the plan
  * itself was planning-bound at large nProbe. One primitive kernel
  * removes the pathological tree and the O(nProbe²) expression blowup.
  */
case class ProbeBuckets(first: Expression, second: Expression,
                        third: Expression)
    extends TernaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // the Column form produces "00…0" buckets even for a NULL vector
  // (when(null > 0).otherwise("0")); mirror that instead of null-out
  override def nullable: Boolean = false

  // CodegenFallback: generated stages call this eval through a
  // reference — one tiny kernel per row instead of the O(bits·nProbe)
  // inlined tree that janino refused to compile. The kernel cost is
  // ~1 µs against a join + rank window per row.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vec = first.eval(input) // may be null — handled by the kernel
    val bits = second.eval(input).asInstanceOf[Int]
    val nProbe = third.eval(input).asInstanceOf[Int]
    ProbeBuckets.compute(vec.asInstanceOf[ArrayData], bits, nProbe)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object ProbeBuckets {
  /** '1'/'0' sign char exactly like `when(try_element_at(a,i) > 0,
    * "1").otherwise("0")`: out-of-range, null element, and ≤ 0 give
    * '0'; NaN gives '1' (Spark's comparison semantics order NaN above
    * every value, so `NaN > 0` is TRUE — Scala's IEEE `>` is false,
    * hence the explicit branch; differentially spec-pinned).
    */
  private def signChar(a: ArrayData, i: Int): Char =
    if (a == null || i >= a.numElements() || a.isNullAt(i)) '0'
    else {
      val v = a.getFloat(i)
      if (v > 0f || java.lang.Float.isNaN(v)) '1' else '0'
    }

  def compute(a: ArrayData, bits: Int, nProbe: Int): ArrayData = {
    val base = new Array[Char](bits)
    var i = 0
    while (i < bits) { base(i) = signChar(a, i); i += 1 }
    val b = UTF8String.fromString(new String(base))
    if (nProbe <= 1) return new GenericArrayData(Array[Any](b))
    // dims 1..bits ranked by (|a_i| asc — null first, dim asc): the
    // array_sort(struct(abs, i)) ordering of the Column form
    val idx = (1 to bits).toArray
    val absV = new Array[Double](bits + 1)
    val isN = new Array[Boolean](bits + 1)
    i = 1
    while (i <= bits) {
      val j = i - 1
      if (a == null || j >= a.numElements() || a.isNullAt(j)) isN(i) = true
      else absV(i) = math.abs(a.getFloat(j).toDouble)
      i += 1
    }
    // a TOTAL order (java.lang.Double.compare: NaN sorts last, exactly
    // Spark's double ordering in array_sort) — `<` on raw doubles made
    // NaN components incomparable, which both diverged from the Column
    // form and could trip TimSort's contract check mid-task
    val sorted = idx.sorted(new Ordering[Int] {
      def compare(x: Int, y: Int): Int = {
        if (isN(x) != isN(y)) { if (isN(x)) -1 else 1 } // null abs first
        else {
          val c = if (isN(x)) 0 else java.lang.Double.compare(absV(x), absV(y))
          if (c != 0) c else Integer.compare(x, y)
        }
      }
    })
    // only `bits` single-dim flips exist: clamp rather than AIOOBE —
    // callers asking for more probes than distinct Hamming-1 neighbors
    // get the full bits+1 distinct set (call sites clamp symmetrically)
    val total = math.min(nProbe, bits + 1)
    val out = new Array[Any](total)
    out(0) = b
    var p = 1
    while (p < total) {
      val flip = sorted(p - 1) - 1 // 0-based char to flip
      val chars = base.clone()
      chars(flip) = if (chars(flip) == '1') '0' else '1'
      out(p) = UTF8String.fromString(new String(chars))
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native squared-L2 distance over two `array<float>` columns —
  * [[VecDot]]'s sibling for the distance-ranked ANN paths. Floats
  * widen to double before the subtraction, squared differences
  * accumulate left-to-right: exactly the `adcTable`/`probeCells` fold
  * in `ProductQuantizer`, so a streaming serving plan built on this
  * expression is bit-identical to the batch heaps (spec-pinned). Null
  * on length mismatch or a null element, like VecDot.
  */
case class VecL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.plans.VecL2.compute($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object VecL2 {
  /** Shared kernel for interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native dequantized squared-L2: `vec_l2_q8(q, v8, inv)` — q an
  * `array<float>` query, v8 the BINARY int8 tier (one signed byte per
  * dim), inv the dequantization step s/127. Per dim:
  * (q_i − byte_i·inv)² accumulated left-to-right in double — the int8
  * rerank's reference arithmetic, codegen'd (BINARY is the layout that
  * actually stores d bytes/row; array<byte> round-trips through
  * parquet as annotated INT32). Null on length mismatch.
  */
case class VecL2Q8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any, v8: Any, inv: Any): Any =
    VecL2Q8.compute(q.asInstanceOf[ArrayData], v8.asInstanceOf[Array[Byte]],
      inv.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, v8, inv) => s"""
      java.lang.Double r = graft.plans.VecL2Q8.compute($q, $v8, $inv);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object VecL2Q8 {
  /** Shared kernel for interpreted eval and generated code. */
  def compute(q: ArrayData, v8: Array[Byte], inv: Double): java.lang.Double = {
    val n = q.numElements()
    if (n != v8.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      val d = q.getFloat(i).toDouble - v8(i).toDouble * inv
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native fused ADC distance: `adc_dist(qr, codes, cb)` — qr the
  * (residual) query `array<float>`, codes the row's `array<int>` PQ
  * codes, cb the `[m][k][subDim]` codebook literal. One pass, no
  * intermediate slices: per subspace an inner left fold of
  * (qr_i − cb_i)² in double, the subspace sums added in s order —
  * EXACTLY the batch heap accumulation (`acc += dt(s)(cs(s))` over
  * per-subspace table entries), so a streaming plan built on this is
  * bit-identical to `ivfAdcTopK` (spec-pinned). Replaces the composed
  * `m × vec_l2(slice(...), element_at(element_at(...)))` form, which
  * paid a slice allocation and two nested array lookups per subspace
  * per candidate. Null on null/ragged inputs.
  */
case class AdcDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType),
      ArrayType(ArrayType(ArrayType(FloatType))))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(qr: Any, codes: Any, cb: Any): Any =
    AdcDist.compute(qr.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qr, codes, cb) => s"""
      java.lang.Double r = graft.plans.AdcDist.compute($qr, $codes, $cb);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object AdcDist {
  /** Shared kernel for interpreted eval and generated code. Null on
    * any shape violation (ragged codebook, code out of range, qr
    * length != m·subDim) — a misconfigured plan surfaces as null
    * rows, never an executor crash.
    */
  def compute(qr: ArrayData, codes: ArrayData, cb: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (cb.numElements() != m || m == 0) return null
    var acc = 0.0
    var s = 0
    var off = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val code = codes.getInt(s)
      val cbs = cb.getArray(s)
      if (code < 0 || code >= cbs.numElements()) return null
      val cent = cbs.getArray(code)
      val subDim = cent.numElements()
      if (off + subDim > qr.numElements()) return null
      var sub = 0.0
      var j = 0
      while (j < subDim) {
        if (qr.isNullAt(off + j)) return null
        val d = qr.getFloat(off + j).toDouble - cent.getFloat(j).toDouble
        sub += d * d
        j += 1
      }
      acc += sub // subspace sums added in s order — the heap fold
      off += subDim
      s += 1
    }
    if (off != qr.numElements()) return null
    java.lang.Double.valueOf(acc)
  }
}

/** Per-query ADC lookup table: `adc_table(qr, cb)` →
  * `array<array<double>>` of shape [m][k], entry [s][j] = the subspace-s
  * squared L2 between qr's s-th slice and codebook entry cb[s][j] —
  * EXACTLY the `sub` values [[AdcDist]]'s fused fold computes, produced
  * once per (query, probe) row instead of once per candidate. The batch
  * `ivfAdcTopK` heaps amortize per-candidate work to m table lookups by
  * collecting queries driver-side; a stream cannot collect, but it CAN
  * build the same table scan-locally as a column and carry it through
  * the stream-static join — the streaming half of the amortization.
  * Paired with [[AdcDistTbl]] the scores are bit-identical to
  * [[AdcDist]] (same subspace folds, same s-order accumulation) —
  * differential-spec-pinned. Null on ragged/null inputs (the AdcDist
  * contract).
  */
case class AdcTable(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(ArrayType(FloatType))))
  // FLAT [m·k] layout, entry s·k+j — a nested array<array<double>> costs
  // one UnsafeArrayData wrapper allocation per getArray(s) PER CANDIDATE
  // in the hot lookup (measured 137 s CPU at the 64-cell geometry vs
  // ~60 s flat); the flat buffer is one primitive region read with
  // getDouble(s·k + code)
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(qr: Any, cb: Any): Any =
    AdcTable.compute(qr.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qr, cb) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r =
        graft.plans.AdcTable.compute($qr, $cb);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r; }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object AdcTable {
  /** [m][k] table of per-subspace squared L2s — each entry computed by
    * the same inner fold as [[AdcDist.compute]]'s `sub`, so sums of
    * entries reproduce its accumulations bit for bit. Null on any
    * shape violation (ragged codebook, qr length != Σ subDim).
    */
  def compute(qr: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    if (m == 0) return null
    val k0 = cb.getArray(0).numElements()
    if (k0 == 0) return null
    val flat = new Array[Double](m * k0)
    var s = 0
    var off = 0
    while (s < m) {
      val cbs = cb.getArray(s)
      if (cbs.numElements() != k0) return null // ragged codebook
      var subDim = -1
      var j = 0
      while (j < k0) {
        val cent = cbs.getArray(j)
        if (subDim < 0) {
          subDim = cent.numElements()
          if (off + subDim > qr.numElements()) return null
        } else if (cent.numElements() != subDim) return null
        var sub = 0.0
        var i = 0
        while (i < subDim) {
          if (qr.isNullAt(off + i)) return null
          val d = qr.getFloat(off + i).toDouble - cent.getFloat(i).toDouble
          sub += d * d
          i += 1
        }
        flat(s * k0 + j) = sub
        j += 1
      }
      off += subDim
      s += 1
    }
    if (off != qr.numElements()) return null
    ArrayData.toArrayData(flat)
  }
}

/** Table-based ADC distance: `adc_dist_tbl(tbl, codes, m)` — tbl the
  * [[AdcTable]] flat [m·k] column, codes the candidate's `array<int>`
  * PQ codes, m the EXPLICIT subspace count (a literal the caller knows
  * from the PQ geometry; k then derives as tbl.length / m). Per
  * candidate: m primitive getDouble reads accumulated in s order —
  * bit-identical to [[AdcDist]] over the same inputs (the table entries
  * ARE its subspace sums) at ~subDim× less arithmetic and zero
  * per-candidate allocation. The candidate-volume hot path of the
  * streaming IVFADC serving plan.
  *
  * m is explicit (round 16, advisory): deriving it from `codes.length`
  * let a codes array of the WRONG m that still divides the table size
  * (m=4 codes against an m=8,k=256 table ⇒ k=512) return a plausible
  * wrong distance; with m pinned, any codes-length mismatch nulls —
  * the "misconfigured plan surfaces as null rows" contract [[AdcDist]]
  * keeps via the codebook shape.
  */
case class AdcDistTbl(first: Expression, second: Expression,
                      third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(tbl: Any, codes: Any, m: Any): Any =
    AdcDistTbl.compute(tbl.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tbl, codes, m) => s"""
      java.lang.Double r = graft.plans.AdcDistTbl.compute($tbl, $codes, $m);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object AdcDistTbl {
  /** Σ_s tbl[s·k + codes[s]] in s order — [[AdcDist.compute]]'s outer
    * accumulation over precomputed subspace sums. Null on any geometry
    * mismatch: codes.length != m, tbl not a multiple of m, or an
    * out-of-range code (the AdcDist contract for bad codes).
    */
  def compute(tbl: ArrayData, codes: ArrayData,
              mExpected: Int): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0 || m != mExpected) return null
    val total = tbl.numElements()
    val k = total / m
    if (k * m != total || k == 0) return null
    var acc = 0.0
    var s = 0
    var base = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val code = codes.getInt(s)
      if (code < 0 || code >= k) return null
      acc += tbl.getDouble(base + code)
      s += 1
      base += k
    }
    java.lang.Double.valueOf(acc)
  }
}

object VecDot {
  /** Shared kernel for interpreted eval and generated code. Returns
    * null (boxed) exactly when the zip_with/aggregate composition
    * would: unequal lengths or a null element.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
