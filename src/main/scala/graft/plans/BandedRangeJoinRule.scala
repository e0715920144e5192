package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType}

/** Huge×huge fallback for range/overlap joins: when NEITHER side of an
  * inner range join fits the broadcast threshold (so
  * [[RangeJoinStrategy]] can't build its broadcast interval index and
  * Spark would fall back to BroadcastNestedLoopJoin or a cartesian
  * product), rewrite the join into a *banded equi join*:
  *
  *   - each side's [lo, hi] span is exploded over the fixed-width time
  *     bands it covers (a point side degenerates to one band per row);
  *   - the join gains `bandL = bandR` equi keys, so it plans as a
  *     shuffled hash / sort-merge join — hash-partitioned on
  *     (origKeys, band), no nested loop anywhere;
  *   - a pair that overlaps across several bands would match once per
  *     shared band, so a dedup conjunct keeps exactly the first shared
  *     band: `band = floorDiv(greatest(lLo, rLo))` (the intersection of
  *     two band ranges starts at the greater of the two starts);
  *   - the original condition is kept verbatim, so strict/non-strict
  *     bounds, residual predicates and null semantics are exactly
  *     Spark's.
  *
  * This is the planner-unified form of
  * `operators/IntervalJoin.bandedPoints` (obsplus bulk-waveform
  * semantics, `utils/waveforms.py:567-608`): users write one plain
  * `a.join(b, cond)` and the planner picks broadcast RangeJoinExec when
  * a side is small, banded SMJ/SHJ when both are huge.
  *
  * Scale note: cost per row is O(span/bandWidth) duplicated rows in the
  * shuffle. `spark.graft.rangeJoin.bandWidth` (default 1 hour in ns,
  * matching the engine's epoch-ns convention) must be of the order of
  * the typical span; a row whose span covers more than
  * `spark.graft.rangeJoin.maxBandsPerRow` (default 4096) bands — an
  * un-filtered "forever" sentinel, a mis-sized width — fails fast with
  * an actionable error instead of silently multiplying the shuffle.
  * If every row lands in one band (tiny value domain), the plan
  * degrades to a single hot partition; AQE's skew-join split
  * re-parallelizes SMJ partitions at runtime, and the width conf is the
  * designed fix. Disable with
  * `spark.graft.rangeJoin.banded.enabled=false`.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  private val BandPrefix = "_graft_band"

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeJoin.banded.enabled", "true").toBoolean &&
      SQLConf.get.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  /** Default width: 1 hour in ns (the engine's epoch-ns convention). */
  private val DefaultBandWidth = 3600000000000L

  /** Stats-absent fallback: the last width MEASURED by
    * `IntervalJoin.autoBandNs` on this session (published under
    * `spark.graft.rangeJoin.bandWidth.measured`), floored at the
    * default. The rule cannot run the measurement itself: a
    * `Rule[LogicalPlan]` executes inside the optimizer, where launching
    * a Spark job would re-enter the very optimizer mid-rewrite, make
    * `EXPLAIN` run jobs, and break rule idempotency under AQE's
    * repeated re-optimization — so the measured width flows one way,
    * from the eager operator path into this planner fallback. Floored,
    * never narrowed: a width measured on one workload applied to
    * another could be arbitrarily narrow, and too-narrow widths are the
    * direction that trips the [[bandSeq]] band-cap error — taking
    * `max(measured, default)` can only reduce band replication for
    * long-span workloads, never turn a working join into a failure.
    */
  private def measuredFallback: Option[Long] = {
    val v = SQLConf.get.getConfString(
      "spark.graft.rangeJoin.bandWidth.measured", "")
    if (v.isEmpty) None
    else scala.util.Try(v.toLong).toOption.map(math.max(_, DefaultBandWidth))
  }

  /** Explicitly configured width, if any — always wins over auto. */
  private def explicitBandWidth: Option[Long] = {
    val v = SQLConf.get.getConfString("spark.graft.rangeJoin.bandWidth", "")
    if (v.isEmpty) None else Some(v.toLong)
  }

  private def autoWidthEnabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeJoin.bandWidth.auto",
      "true").toBoolean

  /** Last auto-derived width — diagnostic/test observability hook. */
  @volatile private[graft] var lastAutoWidth: Option[Long] = None

  /** Column-stats band-width derivation (docs/NEXT.md follow-up): with
    * CBO stats present (`ANALYZE TABLE ... COMPUTE STATISTICS FOR
    * COLUMNS` + `spark.sql.cbo.enabled`), a side whose intervals tile
    * their [min(lo), max(hi)] extent has typical span ≈ extent /
    * rowCount; the width that keeps bands-per-row O(1) on BOTH sides is
    * the larger of the two estimates (a point side derives a tiny
    * width and never dominates). Returns None — falling back to the
    * conf/default — when either min/max or rowCount is unavailable.
    *
    * extent/rowCount is interval SPACING, not span: heavily OVERLAPPING
    * intervals (span >> spacing) would derive a width far below typical
    * spans and trip [[bandSeq]]'s maxBandsPerRow error at runtime —
    * merely running ANALYZE TABLE must never turn a working query into
    * a failure. So the derived width is clamped per side to a floor of
    * extent/maxBandsPerRow: no row can span more than its side's
    * extent, hence no row explodes past the cap. The floor trades
    * selectivity (wider bands = more candidate pairs) for guaranteed
    * completion, and an explicit bandWidth conf still overrides.
    */
  private[graft] def deriveAutoWidth(l: LogicalPlan, r: LogicalPlan,
                                     e: RangeExtract.Extracted): Option[Long] = {
    def longOf(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case n: Long => Some(n)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    def attrOf(x: Expression): Option[Attribute] = x match {
      case a: Attribute => Some(a)
      case c: Cast => attrOf(c.child)
      case _ => None
    }
    val cap = BigInt(maxBandsPerRow)
    def side(p: LogicalPlan, lo: Expression, hi: Expression): Option[Long] = {
      val st = p.stats
      for {
        n <- st.rowCount if n > 0
        loA <- attrOf(lo)
        hiA <- attrOf(hi)
        loS <- st.attributeStats.get(loA)
        hiS <- st.attributeStats.get(hiA)
        mn <- loS.min.flatMap(longOf)
        mx <- hiS.max.flatMap(longOf)
        if mx > mn
      } yield {
        val extent = BigInt(mx) - BigInt(mn)
        val spacing = extent / n
        val floor = (extent + cap - 1) / cap // ceil: extent fits in cap bands
        spacing.max(floor).max(1).toLong
      }
    }
    val ws = Seq(side(l, e.streamLo, e.streamHi),
      side(r, e.bcastLo, e.bcastHi)).flatten
    if (ws.isEmpty) None else Some(ws.max)
  }

  private def maxBandsPerRow: Long =
    SQLConf.get.getConfString("spark.graft.rangeJoin.maxBandsPerRow",
      "4096").toLong

  private def isBandable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(x / w) in exact long arithmetic: (x - pmod(x, w)) / w.
    * `pmod` returns the non-negative remainder, so this is a true
    * floor for negative values too.
    */
  private def floorDiv(x: Expression, w: Literal): Expression =
    IntegralDivide(Subtract(toLong(x), Pmod(toLong(x), w)), w)

  /** The per-row band explosion, guarded: a row spanning more than
    * `maxBandsPerRow` bands (an unfiltered open-end sentinel, a wildly
    * mis-sized bandWidth) fails fast with an actionable error instead
    * of silently multiplying the shuffle by span/bandWidth — the
    * maximum representable ns span is ~2.5M one-hour bands, which would
    * otherwise materialize without ever tripping sequence()'s own
    * too-long guard.
    */
  private def bandSeq(lo: Expression, hi: Expression, w: Literal,
                      cap: Long): Expression = {
    val fLo = floorDiv(lo, w)
    val fHi = floorDiv(hi, w)
    val seq = new Sequence(fLo, fHi, Some(Literal(1L, LongType)),
      Some(SQLConf.get.sessionLocalTimeZone))
    val cnt = Add(Subtract(fHi, fLo), Literal(1L, LongType))
    val err = Cast(new RaiseError(Literal.create(
      s"graft banded range join: row spans more than $cap bands " +
        s"(bandWidth=${w.value}). Raise spark.graft.rangeJoin.bandWidth, " +
        "filter open-ended intervals, or set " +
        "spark.graft.rangeJoin.banded.enabled=false", StringType)),
      seq.dataType)
    If(LessThanOrEqual(cnt, Literal(cap, LongType)), seq, err)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if cond.deterministic &&
            !cond.references.exists(_.name.startsWith(BandPrefix)) &&
            !RangeExtract.broadcastable(l, hint.leftHint) &&
            !RangeExtract.broadcastable(r, hint.rightHint) =>
        RangeExtract.extract(cond, l, r) match {
          case Some(e) if Seq(e.streamLo, e.streamHi, e.bcastLo, e.bcastHi)
              .forall(isBandable) =>
            // width precedence: explicit conf > CBO-derived >
            // session-measured (floored at default) > default
            val derived =
              if (explicitBandWidth.isEmpty && autoWidthEnabled)
                deriveAutoWidth(l, r, e)
              else None
            derived.foreach(d => lastAutoWidth = Some(d))
            val w = Literal(explicitBandWidth.orElse(derived)
              .orElse(if (autoWidthEnabled) measuredFallback else None)
              .getOrElse(DefaultBandWidth), LongType)
            val cap = maxBandsPerRow
            // Normalize each side's span with least/greatest so rows
            // whose extracted bounds come from unrelated columns (lo >
            // hi) still band over the region they can match in.
            val lLo = Least(Seq(toLong(e.streamLo), toLong(e.streamHi)))
            val lHi = Greatest(Seq(toLong(e.streamLo), toLong(e.streamHi)))
            val rLo = Least(Seq(toLong(e.bcastLo), toLong(e.bcastHi)))
            val rHi = Greatest(Seq(toLong(e.bcastLo), toLong(e.bcastHi)))

            val lBand = AttributeReference(s"${BandPrefix}_l", LongType,
              nullable = false)()
            val rBand = AttributeReference(s"${BandPrefix}_r", LongType,
              nullable = false)()
            // A null bound can never satisfy the range conjuncts it was
            // extracted from, so sequence()'s null array (dropped by
            // the non-outer Generate) preserves inner-join semantics.
            val lGen = Generate(
              Explode(bandSeq(lLo, lHi, w, cap)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(lBand), child = l)
            val rGen = Generate(
              Explode(bandSeq(rLo, rHi, w, cap)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(rBand), child = r)

            val dedup = EqualTo(lBand, floorDiv(Greatest(Seq(lLo, rLo)), w))
            val newCond = And(And(cond, EqualTo(lBand, rBand)), dedup)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
