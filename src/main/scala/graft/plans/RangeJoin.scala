package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

import scala.collection.mutable

/** Per-equi-key sorted interval list with running max upper bound.
  * Top-level (not nested in the exec) so broadcasting it does not drag
  * the plan tree along via an `$outer` reference.
  */
private[plans] case class IntervalBucket(
    loVals: Array[Any], hiRunMax: Array[Any], rows: Array[InternalRow])

/** Primitive-packed bucket used when both range bounds are integral:
  * bounds as long arrays (no boxing), row payloads as ONE concatenated
  * UnsafeRow byte blob + offsets (no per-row objects). Matters at the
  * regime boundary: a 3.1M-interval index measured ~1.7 KB/interval in
  * the boxed/object form (5.3 GiB — OOM'd a default 8 GiB driver,
  * round-7 10⁸-row run) vs ~60 B/interval packed, so the broadcast
  * survives another ~decade of request-side growth before the banded
  * plan must take over.
  */
private[plans] case class PackedBucket(
    loVals: Array[Long], hiRunMax: Array[Long],
    rowBytes: Array[Byte], offsets: Array[Int])

/** Serializable helpers for the packed path (an `object`, so executor
  * closures reference the module instead of capturing the plan).
  */
private[plans] object RangeJoinPack {
  /** Widen an integral bound to Long — order-preserving for the types
    * the packed path admits (Long/Int/Short).
    */
  def toL(v: Any): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case other => throw new IllegalStateException(
      s"range join packed path: non-integral bound $other")
  }

  def integral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType => true
    case _ => false
  }
}

/** Broadcast interval-index join — graft's custom physical operator for
  * range/overlap joins.
  *
  * Motivation (SURVEY.md §4): the reference's bulk-waveform query
  * (obsplus `utils/waveforms.py:567-608`) is an interval join between a
  * big segment index and a set of (t1, t2) requests. Spark's built-in
  * planner can only run a non-equi inner join as BroadcastNestedLoop —
  * O(|stream| × |bcast|) comparisons. This operator plans the same
  * logical join as:
  *
  *   1. collect the small side, group it by the equi keys (if any),
  *      sort each group by its lower range bound, and attach a
  *      running-maximum of the upper bound;
  *   2. broadcast that index;
  *   3. for each streamed row, binary-search the group for the last
  *      interval whose lower bound ≤ the row's upper bound, then walk
  *      backwards while the running max upper bound ≥ the row's lower
  *      bound. The running max makes the walk terminate as soon as no
  *      earlier interval can overlap, so lookup is O(log m + k) with
  *      k = candidates, instead of O(m).
  *
  * The full original join condition is re-evaluated on every candidate
  * pair, so strict vs non-strict bounds, extra residual predicates, and
  * null semantics are exactly Spark's. At 100 TB the streamed side is
  * never shuffled or sorted — the operator is map-side only, like a
  * broadcast hash join but for inequality conditions.
  */
case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    broadcastRight: Boolean,
    streamKeys: Seq[Expression],
    bcastKeys: Seq[Expression],
    bcastLo: Expression, // broadcast-side lower bound (matches stream hi)
    bcastHi: Expression, // broadcast-side upper bound (matches stream lo)
    streamLo: Expression,
    streamHi: Expression,
    condition: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  private def streamedPlan: SparkPlan = if (broadcastRight) left else right
  private def broadcastPlan: SparkPlan = if (broadcastRight) right else left

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numCandidates" -> SQLMetrics.createMetric(sparkContext, "candidate pairs probed"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numCandidates = longMetric("numCandidates")

    val bOut = broadcastPlan.output
    val sOut = streamedPlan.output
    val loType = bcastLo.dataType
    val hiType = bcastHi.dataType

    // integral bounds (the epoch-ns convention) take the packed path:
    // primitive bound arrays + one byte blob per bucket instead of
    // boxed values and per-row objects — same probe algorithm, ~30×
    // smaller broadcast (PackedBucket scaladoc)
    if (RangeJoinPack.integral(loType) && RangeJoinPack.integral(hiType) &&
        RangeJoinPack.integral(streamLo.dataType) &&
        RangeJoinPack.integral(streamHi.dataType))
      return doExecutePacked(numOutputRows, numCandidates)

    // ---- driver side: build the interval index ----
    val loOrdD = TypeUtils.getInterpretedOrdering(loType)
    val hiOrdD = TypeUtils.getInterpretedOrdering(hiType)
    val keyProj = UnsafeProjection.create(bcastKeys, bOut)
    val loBound = BindReferences.bindReference(bcastLo, bOut)
    val hiBound = BindReferences.bindReference(bcastHi, bOut)

    val groups = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Any, Any, InternalRow)]]
    broadcastPlan.executeCollect().foreach { row =>
      val lo = loBound.eval(row)
      val hi = hiBound.eval(row)
      // A null bound can never satisfy an inequality in an inner join.
      if (lo != null && hi != null) {
        val key = keyProj(row).copy()
        groups.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += ((lo, hi, row))
      }
    }
    val index: Map[UnsafeRow, IntervalBucket] = groups.iterator.map { case (k, buf) =>
      val sorted = buf.sortWith((a, b) => loOrdD.lt(a._1, b._1)).toArray
      val lo = sorted.map(_._1)
      val hi = new Array[Any](sorted.length)
      var i = 0
      var runMax: Any = null
      while (i < sorted.length) {
        runMax = if (i == 0 || hiOrdD.gt(sorted(i)._2, runMax)) sorted(i)._2 else runMax
        hi(i) = runMax
        i += 1
      }
      k -> IntervalBucket(lo, hi, sorted.map(_._3))
    }.toMap
    val bcast = sparkContext.broadcast(index)

    // serializable captures for the executor closure
    val sKeys = streamKeys
    val sLoE = streamLo
    val sHiE = streamHi
    val cond = condition
    val outAttrs = output
    val bcastIsRight = broadcastRight

    streamedPlan.execute().mapPartitionsWithIndex { (pidx, iter) =>
      val loOrd = TypeUtils.getInterpretedOrdering(loType)
      val hiOrd = TypeUtils.getInterpretedOrdering(hiType)
      val idx = bcast.value
      val keyProjS = UnsafeProjection.create(sKeys, sOut)
      val sLoB = BindReferences.bindReference(sLoE, sOut)
      val sHiB = BindReferences.bindReference(sHiE, sOut)
      val pred = Predicate.create(cond, if (bcastIsRight) sOut ++ bOut else bOut ++ sOut)
      pred.initialize(pidx)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      iter.flatMap { srow =>
        val sLo = sLoB.eval(srow)
        val sHi = sHiB.eval(srow)
        if (sLo == null || sHi == null) Iterator.empty
        else idx.get(keyProjS(srow)) match {
          case None => Iterator.empty
          case Some(b) =>
            // last position with loVals(pos) <= sHi
            val end = {
              var lo = 0; var hi = b.loVals.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (loOrd.lteq(b.loVals(mid), sHi)) lo = mid + 1 else hi = mid
              }
              lo - 1
            }
            new Iterator[InternalRow] {
              private var j = end
              private var ready: InternalRow = _
              private def advance(): Unit = {
                while (ready == null && j >= 0 && hiOrd.gteq(b.hiRunMax(j), sLo)) {
                  numCandidates += 1
                  val pair = if (bcastIsRight) joined(srow, b.rows(j)) else joined(b.rows(j), srow)
                  if (pred.eval(pair)) ready = resultProj(pair)
                  j -= 1
                }
              }
              override def hasNext: Boolean = { advance(); ready != null }
              override def next(): InternalRow = {
                advance()
                val r = ready; ready = null; numOutputRows += 1; r
              }
            }
        }
      }
    }
  }

  /** The packed-path twin of the generic doExecute body: identical
    * index algorithm (per-key sort by lo + running-max hi, binary
    * search + backward walk, full condition re-check), bounds widened
    * to primitive longs and broadcast rows carried as UnsafeRow bytes
    * reconstructed zero-copy on the executor.
    */
  private def doExecutePacked(
      numOutputRows: org.apache.spark.sql.execution.metric.SQLMetric,
      numCandidates: org.apache.spark.sql.execution.metric.SQLMetric): RDD[InternalRow] = {
    import RangeJoinPack.toL
    val bOut = broadcastPlan.output
    val sOut = streamedPlan.output

    // ---- driver side: build the packed interval index ----
    val keyProj = UnsafeProjection.create(bcastKeys, bOut)
    val loBound = BindReferences.bindReference(bcastLo, bOut)
    val hiBound = BindReferences.bindReference(bcastHi, bOut)
    val toUnsafe = UnsafeProjection.create(bOut, bOut)

    val groups = mutable.HashMap
      .empty[UnsafeRow, mutable.ArrayBuffer[(Long, Long, Array[Byte])]]
    broadcastPlan.executeCollect().foreach { row =>
      val lo = loBound.eval(row)
      val hi = hiBound.eval(row)
      if (lo != null && hi != null) {
        // copy(): the projection reuses its buffer; the copy's backing
        // array is exact-size, so getBytes is allocation-free
        val bytes = toUnsafe(row).copy().getBytes
        groups.getOrElseUpdate(keyProj(row).copy(),
          mutable.ArrayBuffer.empty) += ((toL(lo), toL(hi), bytes))
      }
    }
    val index: Map[UnsafeRow, PackedBucket] = groups.iterator.map { case (k, buf) =>
      val sorted = buf.sortBy(_._1).toArray
      val n = sorted.length
      val lo = new Array[Long](n)
      val hiRun = new Array[Long](n)
      val offsets = new Array[Int](n + 1)
      var i = 0
      while (i < n) {
        offsets(i + 1) = offsets(i) + sorted(i)._3.length
        i += 1
      }
      val blob = new Array[Byte](offsets(n))
      i = 0
      var runMax = Long.MinValue
      while (i < n) {
        lo(i) = sorted(i)._1
        runMax = math.max(runMax, sorted(i)._2)
        hiRun(i) = runMax
        System.arraycopy(sorted(i)._3, 0, blob, offsets(i), sorted(i)._3.length)
        i += 1
      }
      k -> PackedBucket(lo, hiRun, blob, offsets)
    }.toMap
    val bcast = sparkContext.broadcast(index)

    // serializable captures for the executor closure
    val sKeys = streamKeys
    val sLoE = streamLo
    val sHiE = streamHi
    val cond = condition
    val outAttrs = output
    val bcastIsRight = broadcastRight
    val bNumFields = bOut.length

    streamedPlan.execute().mapPartitionsWithIndex { (pidx, iter) =>
      val idx = bcast.value
      val keyProjS = UnsafeProjection.create(sKeys, sOut)
      val sLoB = BindReferences.bindReference(sLoE, sOut)
      val sHiB = BindReferences.bindReference(sHiE, sOut)
      val pred = Predicate.create(cond, if (bcastIsRight) sOut ++ bOut else bOut ++ sOut)
      pred.initialize(pidx)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val brow = new UnsafeRow(bNumFields)

      iter.flatMap { srow =>
        val loV = sLoB.eval(srow)
        val hiV = sHiB.eval(srow)
        if (loV == null || hiV == null) Iterator.empty
        else {
          val sLo = toL(loV)
          val sHi = toL(hiV)
          idx.get(keyProjS(srow)) match {
            case None => Iterator.empty
            case Some(b) =>
              // last position with loVals(pos) <= sHi
              val end = {
                var lo = 0; var hi = b.loVals.length
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (b.loVals(mid) <= sHi) lo = mid + 1 else hi = mid
                }
                lo - 1
              }
              new Iterator[InternalRow] {
                private var j = end
                private var ready: InternalRow = _
                private def advance(): Unit = {
                  while (ready == null && j >= 0 && b.hiRunMax(j) >= sLo) {
                    numCandidates += 1
                    brow.pointTo(b.rowBytes,
                      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET +
                        b.offsets(j),
                      b.offsets(j + 1) - b.offsets(j))
                    val pair = if (bcastIsRight) joined(srow, brow)
                               else joined(brow, srow)
                    if (pred.eval(pair)) ready = resultProj(pair)
                    j -= 1
                  }
                }
                override def hasNext: Boolean = { advance(); ready != null }
                override def next(): InternalRow = {
                  advance()
                  val r = ready; ready = null; numOutputRows += 1; r
                }
              }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override def simpleString(maxFields: Int): String =
    s"RangeJoinExec bcast=${if (broadcastRight) "right" else "left"} " +
      s"keys=${streamKeys.mkString(",")} range=[$streamLo,$streamHi] vs [$bcastLo,$bcastHi]"
}

/** Shared range-condition classification for [[RangeJoinStrategy]] (the
  * broadcast interval-index path) and [[BandedRangeJoinRule]] (the
  * huge×huge banded-equi-join path).
  */
private[plans] object RangeExtract {

  case class Extracted(
      streamKeys: Seq[Expression], bcastKeys: Seq[Expression],
      bcastLo: Expression, bcastHi: Expression,
      streamLo: Expression, streamHi: Expression)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case x => Seq(x)
  }

  def broadcastable(p: LogicalPlan, hint: Option[HintInfo]): Boolean = {
    if (hint.exists(_.strategy.contains(BROADCAST))) return true
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold > 0 && p.stats.sizeInBytes >= 0 && p.stats.sizeInBytes <= threshold
  }

  /** Classify the condition's conjuncts for stream side S / broadcast
    * side B. Needs at least one `S.x {>=,>} B.lo` and one
    * `S.y {<=,<} B.hi` (in any operand order); extra conjuncts are fine
    * (the caller re-checks the full condition).
    */
  def extract(
      cond: Expression, s: LogicalPlan, b: LogicalPlan): Option[Extracted] = {
    if (!cond.deterministic) return None
    val equi = mutable.ArrayBuffer.empty[(Expression, Expression)]
    // (streamExpr, bcastExpr) pairs where streamExpr upper-bounds bcastLo
    val loPairs = mutable.ArrayBuffer.empty[(Expression, Expression)]
    val hiPairs = mutable.ArrayBuffer.empty[(Expression, Expression)]

    def sides(a: Expression, c: Expression): Option[(Expression, Expression, Boolean)] =
      if (a.references.subsetOf(s.outputSet) && c.references.subsetOf(b.outputSet))
        Some((a, c, false))
      else if (a.references.subsetOf(b.outputSet) && c.references.subsetOf(s.outputSet))
        Some((c, a, true))
      else None

    splitConjuncts(cond).foreach {
      case EqualTo(a, c) => sides(a, c).foreach { case (se, be, _) => equi += ((se, be)) }
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual)
          if RowOrdering.isOrderable(cmp.asInstanceOf[BinaryComparison].left.dataType) =>
        val bc = cmp.asInstanceOf[BinaryComparison]
        sides(bc.left, bc.right).foreach { case (se, be, flipped) =>
          val streamIsGreater = bc match {
            case _: GreaterThan | _: GreaterThanOrEqual => !flipped
            case _ => flipped
          }
          if (streamIsGreater) loPairs += ((se, be)) else hiPairs += ((se, be))
        }
      case _ => () // residual; re-checked by the exec
    }

    if (loPairs.isEmpty || hiPairs.isEmpty) None
    else {
      // first of each kind drives the index; rest are residual
      val (sHi, bLo) = loPairs.head
      val (sLo, bHi) = hiPairs.head
      Some(Extracted(equi.map(_._1).toSeq, equi.map(_._2).toSeq, bLo, bHi, sLo, sHi))
    }
  }
}

/** Planner strategy: rewrite an inner equi+range join whose small side is
  * broadcastable into [[RangeJoinExec]]. Matches plain DataFrame joins —
  * users write `a.join(b, cond)` with a between/overlap condition and get
  * the interval index automatically. Disable with
  * `spark.graft.rangeJoin.enabled=false`.
  */
object RangeJoinStrategy extends SparkStrategy {
  import RangeExtract.{broadcastable, extract}

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), hint)
        if SQLConf.get.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean =>
      val tryRight =
        if (broadcastable(r, hint.rightHint)) extract(cond, l, r).map(e => (e, true))
        else None
      val chosen = tryRight.orElse {
        if (broadcastable(l, hint.leftHint)) extract(cond, r, l).map(e => (e, false))
        else None
      }
      chosen match {
        case Some((e, bcastRight)) =>
          RangeJoinExec(planLater(l), planLater(r), bcastRight,
            e.streamKeys, e.bcastKeys, e.bcastLo, e.bcastHi,
            e.streamLo, e.streamHi, cond) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}
