package graft.operators

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches with set algebra — the KMV
  * ("k minimum values") / theta-sketch family (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007; the Apache DataSketches theta design),
  * built for the 100 TB regime where exact `COUNT(DISTINCT ...)` is a
  * full shuffle of every distinct value and Spark's builtin HLL
  * (`approx_count_distinct`) cannot answer INTERSECTIONS ("distinct
  * users in A∩B") without a join back over the raw data.
  *
  * A sketch is the k smallest DISTINCT 60-bit hashes of a group —
  * crucially an ORDER-INDEPENDENT, associatively-mergeable value (max
  * a few KB regardless of input size), so:
  *
  *   - partial aggregation combines map-side like any sum: the shuffle
  *     moves one ≤k-array per group per partition, never the values;
  *   - sketches persist (an `Array[Long]` column in parquet) and
  *     re-aggregate across days/partitions without rescanning;
  *   - union / intersection / Jaccard come from sketch ALGEBRA alone —
  *     [[kmvUnion]], [[kmvIntersectEstimate]] are plain column
  *     expressions over two array columns, zero additional scans.
  *
  * DETERMINISM is the property the oracle leans on: unlike HLL's
  * implementation-defined registers, the k-min set is a pure function
  * of the input VALUE SET — any partitioning, any arrival order, any
  * merge tree produces the identical sketch, so DuckDB reproduces
  * every estimate bit for bit from a `row_number() ≤ k` recompute
  * (q122/q123/q124), and the estimate itself is one IEEE division.
  *
  * Hashes come from [[graft.plans.Md5Long60]] (`md5_long60`), uniform
  * on [0, 2⁶⁰); the standard KMV estimator for a FULL sketch is
  * `(k−1)·2⁶⁰ / θ` with θ = the k-th minimum; a sketch with fewer than
  * k entries has seen every distinct hash and is EXACT. Relative
  * standard error ≈ 1/√(k−2) (~6.3% at k=256).
  */
object Sketches {

  /** Size of the hash space `md5_long60` draws from (2⁶⁰). */
  final val HashSpace: Long = 1L << 60

  /** Per-(aggregate, k) memo of the registered udaf functions: every
    * `udaf(new XAgg(k), enc)` call resolves encoders and builds a
    * fresh `UserDefinedAggregator` — harmless once, but a caller
    * stamping thousands of sketch columns in one plan (the bank's
    * statsPartials, wide dashboard selects) pays it per column. The
    * aggregators are stateless between rows apart from their buffers,
    * so one instance per (class, k) is safe to share.
    */
  private val udafMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int), org.apache.spark.sql.expressions.UserDefinedFunction]
  private def memo(key: String, k: Int)(
      build: => org.apache.spark.sql.expressions.UserDefinedFunction)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udafMemo.computeIfAbsent((key, k), _ => build)

  /** KMV aggregator: IN = 60-bit hash, BUF/OUT = the sorted-ascending
    * array of the k smallest distinct hashes seen. The buffer is a
    * primitive `Array[Long]` kept sorted-unique — binary-search
    * rejection makes the common case (hash ≥ current max with a full
    * sketch) one comparison, and the array encoder keeps shuffle
    * serialization primitive (no kryo, no boxed trees). Accepted
    * inserts copy ≤ k longs, and only ~k·ln(n/k) rows per partition
    * are ever accepted, so the copy cost is noise at any scale.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"kmv sketch needs k >= 2, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val n = buf.length
      if (n >= k && h >= buf(n - 1)) return buf // common case: one compare
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf                  // already present
      val ins = -pos - 1
      if (n < k) {
        val out = new Array[Long](n + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins)
        out
      } else {
        // full: h < max (checked above) — insert, drop the max
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** The KMV aggregate as an untyped column function:
    * `df.groupBy(...).agg(kmvSketch(col("h"), 256))` over a LongType
    * hash column. Works in batch and in watermarked streaming
    * aggregations (the buffer serializes through the state store like
    * any ImperativeAggregate).
    */
  def kmvSketch(hash: Column, k: Int): Column =
    memo("kmv", k)(udaf(new KmvAgg(k), Encoders.scalaLong)).apply(hash)

  /** Re-aggregation of PERSISTED KMV sketches: IN = a sketch array,
    * merged through [[KmvAgg.merge]] directly — the rollup path without
    * q125's explode-and-resketch row multiplication (one input row per
    * part instead of k). Lossless like any KMV merge: k-min of k-mins
    * = k-min of the union.
    */
  final class KmvMergeAgg(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new KmvAgg(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
      // null sketch rows (outer-join misses, null columns) drop — the
      // same policy as FreqMergeAgg, and the policy SQL aggregates have
      if (in == null) buf else inner.merge(buf, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** [[KmvMergeAgg]] as an untyped column aggregate. */
  def kmvMerge(sk: Column, k: Int): Column =
    memo("kmvMerge", k)(udaf(new KmvMergeAgg(k),
      ExpressionEncoder[Array[Long]]())).apply(sk)

  /** θ of a sketch: the k-th minimum when the sketch is full, else the
    * whole hash space (the sketch is exact). Every hash in the sketch
    * strictly below θ is a uniform sample of the group's distinct
    * hashes at rate θ/2⁶⁰ — the invariant all the estimators share.
    */
  def kmvTheta(sk: Column, k: Int): Column =
    when(size(sk) >= k, element_at(sk, k)).otherwise(lit(HashSpace))

  /** Distinct-count estimate: exact size below k; `(k−1)·2⁶⁰/θ` for a
    * full sketch. One IEEE division — deterministic across engines.
    */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace.toDouble)
        / element_at(sk, k).cast("double"))

  /** Union of two sketches — itself a valid k-sketch of the united
    * value set (the k smallest of the merged distinct hashes).
    */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Distinct-count estimate of A ∪ B via [[kmvUnion]]. */
  def kmvUnionEstimate(a: Column, b: Column, k: Int): Column =
    kmvEstimate(kmvUnion(a, b, k), k)

  /** Theta-sketch intersection estimate: hashes present in BOTH
    * sketches and strictly below θ = min(θ_a, θ_b) are a uniform
    * θ/2⁶⁰-rate sample of A ∩ B, so the estimate is their count
    * scaled by 2⁶⁰/θ. Exact-mode sketches (θ = 2⁶⁰) degrade to the
    * exact intersection count (the scale factor is 1.0). This is the
    * query a join-free architecture needs: "distinct users who did
    * BOTH X and Y" from two persisted kilobyte sketches.
    */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmvTheta(a, k), kmvTheta(b, k))
    val common = size(filter(array_intersect(a, b), h => h < theta))
    common.cast("double") * lit(HashSpace.toDouble) / theta.cast("double")
  }

  /** Jaccard estimate |A∩B|/|A∪B| from the two set estimates. */
  def kmvJaccardEstimate(a: Column, b: Column, k: Int): Column =
    kmvIntersectEstimate(a, b, k) / kmvUnionEstimate(a, b, k)

  /** Theta-sketch a-not-b estimate |A ∖ B|: hashes in A's sketch below
    * θ = min(θ_a, θ_b) and absent from B's sketch are a uniform
    * θ/2⁶⁰-rate sample of A∖B (below the joint θ, B's sketch contains
    * EVERY hash of B, so absence from the sketch is absence from B).
    * "Users who did X but never Y" from two persisted arrays.
    */
  def kmvDifferenceEstimate(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmvTheta(a, k), kmvTheta(b, k))
    val only = size(filter(array_except(a, b), h => h < theta))
    only.cast("double") * lit(HashSpace.toDouble) / theta.cast("double")
  }

  // ==================================================================
  // Priority sampling (Duffield, Lund & Thorup, JACM 2007): a bounded
  // weighted sample supporting unbiased SUBSET-SUM estimates — the
  // third leg of the approximate-query layer (KMV: distinct counts;
  // theta algebra: set operations; this: Σweight over arbitrary
  // post-hoc subsets). Item i with weight w_i draws u_i = h_i/2⁶⁰
  // from its hash and gets priority q_i = w_i/u_i; keep the k+1
  // highest-priority items, let τ = the (k+1)-th priority, and
  // Σ_{subset} ≈ Σ_{i ∈ top-k ∩ subset} max(w_i, τ). Like KMV the
  // sample is a pure function of the (item, weight) set — order,
  // partitioning, and merge trees are invisible, and DuckDB
  // reproduces every estimate from a rank-over-priority recompute.
  // ==================================================================

  /** Priority-sampling aggregate: IN = (hash, weight, item-id), BUF =
    * the ≤(k+1) highest-priority rows as parallel primitive arrays
    * sorted by (priority DESC, id ASC) — the explicit tie-break keeps
    * equal priorities (equal weights with colliding hash draws)
    * deterministic under any merge tree. OUT = array of (priority,
    * weight, id) structs. The id rides along so callers can evaluate
    * subset membership AFTER sampling — the whole point of the
    * method. Items must be UNIQUE (pre-aggregate duplicate keys): a
    * re-delivered item would occupy two sample slots.
    */
  final class PriorityAgg(k: Int)
      extends Aggregator[(Long, Long, Long),
        (Array[Double], Array[Long], Array[Long]),
        Seq[(Double, Long, Long)]] {
    require(k >= 1, s"priority sample needs k >= 1, got $k")
    private val cap = k + 1

    override def zero: (Array[Double], Array[Long], Array[Long]) =
      (Array.emptyDoubleArray, Array.emptyLongArray, Array.emptyLongArray)

    /** Strict "ranks ahead of" under (priority DESC, id ASC) — the
      * explicit tie-break that keeps the trimmed sample a pure
      * function of the item set even when two items draw equal
      * priorities (same weight, colliding hash draw).
      */
    private def ahead(p1: Double, id1: Long, p2: Double, id2: Long): Boolean =
      p1 > p2 || (p1 == p2 && id1 < id2)

    private def insert(buf: (Array[Double], Array[Long], Array[Long]),
                       q: Double, w: Long, id: Long) = {
      val (ps, ws, ids) = buf
      val n = ps.length
      if (n >= cap && !ahead(q, id, ps(n - 1), ids(n - 1))) buf
      else {
        // first position this row ranks ahead of (descending order)
        var ins = 0
        while (ins < n && ahead(ps(ins), ids(ins), q, id)) ins += 1
        val m = math.min(cap, n + 1)
        val po = new Array[Double](m); val wo = new Array[Long](m)
        val io = new Array[Long](m)
        System.arraycopy(ps, 0, po, 0, ins)
        System.arraycopy(ws, 0, wo, 0, ins)
        System.arraycopy(ids, 0, io, 0, ins)
        po(ins) = q; wo(ins) = w; io(ins) = id
        val tail = m - ins - 1
        System.arraycopy(ps, ins, po, ins + 1, tail)
        System.arraycopy(ws, ins, wo, ins + 1, tail)
        System.arraycopy(ids, ins, io, ins + 1, tail)
        (po, wo, io)
      }
    }

    override def reduce(buf: (Array[Double], Array[Long], Array[Long]),
                        in: (Long, Long, Long)) = {
      val (h, w, id) = in
      // u = h/2⁶⁰ ∈ (0, 1]; h = 0 maps to the full space (u = 1)
      val u = if (h <= 0) 1.0 else h.toDouble / HashSpace.toDouble
      insert(buf, w.toDouble / u, w, id)
    }

    override def merge(a: (Array[Double], Array[Long], Array[Long]),
                       b: (Array[Double], Array[Long], Array[Long])) = {
      var out = a
      val (ps, ws, ids) = b
      var i = 0
      while (i < ps.length) {
        out = insert(out, ps(i), ws(i), ids(i)); i += 1
      }
      out
    }

    override def finish(buf: (Array[Double], Array[Long], Array[Long])) = {
      val (ps, ws, ids) = buf
      ps.indices.map(i => (ps(i), ws(i), ids(i)))
    }

    override def bufferEncoder
        : ExpressionEncoder[(Array[Double], Array[Long], Array[Long])] =
      ExpressionEncoder[(Array[Double], Array[Long], Array[Long])]()
    override def outputEncoder: ExpressionEncoder[Seq[(Double, Long, Long)]] =
      ExpressionEncoder[Seq[(Double, Long, Long)]]()
  }

  /** Priority sample as an untyped column aggregate:
    * `prioritySample(hashCol, weightCol, idCol, k)` → array of
    * `(_1 priority, _2 weight, _3 id)` structs, priority-descending,
    * length ≤ k+1 (the extra row carries τ).
    */
  def prioritySample(hash: Column, weight: Column, id: Column, k: Int): Column =
    memo("priority", k)(udaf(new PriorityAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong))).apply(hash, weight, id)

  /** τ of a sample: the (k+1)-th priority when present, else 0 (fewer
    * than k+1 items seen — the sample is the whole set, estimates are
    * exact).
    */
  def priorityTau(sample: Column, k: Int): Column =
    when(size(sample) >= k + 1, element_at(sample, k + 1).getField("_1"))
      .otherwise(lit(0.0))

  /** Subset-sum estimate from a priority sample: Σ max(w, τ) over the
    * top-k sample rows whose id satisfies `member`. With τ = 0 (exact
    * mode) this is the plain subset sum.
    */
  def prioritySubsetSum(sample: Column, k: Int,
                        member: Column => Column): Column = {
    val tau = priorityTau(sample, k)
    aggregate(
      filter(slice(sample, 1, k), x => member(x.getField("_3"))),
      lit(0.0),
      (acc, x) => acc + greatest(x.getField("_2").cast("double"), tau))
  }

  /** Rank-based quantile over the PAYLOADS of a weight-1 priority
    * sample ([[prioritySample]]`(hash, lit(1L), payload, k)` — with
    * unit weights the k+1 highest priorities are exactly the k+1
    * smallest hash draws, i.e. a uniform bottom-k-by-hash sample of
    * the distinct items, payload riding in `_3`). The estimate is the
    * ⌈q·m⌉-th smallest payload of the top-k sample — an INTEGER from
    * the data, so the oracle comparison is exact, no interpolation,
    * no float summation. "Median document length per source" from a
    * kilobyte sample instead of a sort of the group.
    */
  def sampleQuantile(sample: Column, k: Int, q: Double): Column = {
    val vals = array_sort(transform(slice(sample, 1, k), x => x.getField("_3")))
    element_at(vals,
      greatest(lit(1), ceil(size(vals) * lit(q)).cast("int")))
  }

  // ==================================================================
  // Frequent items (Misra & Gries 1982; SpaceSaving, Metwally et al.
  // 2005; mergeable form per Agarwal et al., "Mergeable Summaries",
  // PODS 2012): the fourth approximate-query leg — "top-k tokens /
  // domains / event types per group over 100 TB" without the full
  // per-item count shuffle. The summary is ≤k (item, count) counters;
  // the mergeable merge is: combine counters over the item union,
  // subtract the (k+1)-th largest combined count from every counter,
  // drop the non-positive. Guarantees that hold under ANY merge tree:
  //
  //   - no overcount: est(x) ≤ true(x) for every item;
  //   - bounded undercount: true(x) − est(x) ≤ (n − ŝ)/(k+1), where
  //     n = rows seen and ŝ = Σ retained counts (each decrement of v
  //     hits ≥ k+1 counters that are ≥ v, so ŝ drops by ≥ (k+1)·v
  //     while any single item loses ≤ v) — in particular ≤ n/(k+1);
  //   - heavy-hitter recall: every item with true(x) > n/(k+1) is in
  //     the summary (its undercount bound leaves est(x) > 0).
  //
  // DETERMINISM is weaker than KMV's: over capacity the counter VALUES
  // (and which sub-threshold items survive) depend on the merge tree,
  // so oracle queries pin (a) the guarantees above as verdict columns
  // (theorem-true for a correct implementation, so deterministic), and
  // (b) the BELOW-CAPACITY regime bit for bit — with ≤ k distinct
  // items no decrement ever fires anywhere in any tree, and the
  // summary IS the exact count map (q133/q134's exact legs).
  // ==================================================================

  /** The PODS'12 merge of two CANONICAL summaries (item-sorted,
    * effective counts): merge-join + (k+1)-th-largest subtraction.
    * Shared by [[FreqAgg]] (after de-debting) and [[FreqMergeAgg]].
    */
  private[operators] def freqMergeCanonical(
      k: Int,
      ai: Array[String], ac: Array[Long], an: Long,
      bi: Array[String], bc: Array[Long], bn: Long)
      : (Array[String], Array[Long], Long) = {
    if (ai.isEmpty) return (bi, bc, an + bn)
    if (bi.isEmpty) return (ai, ac, an + bn)
    // merge-join the two item-sorted runs, summing counts
    val io = new Array[String](ai.length + bi.length)
    val co = new Array[Long](io.length)
    var i = 0; var j = 0; var o = 0
    while (i < ai.length || j < bi.length) {
      val c =
        if (i >= ai.length) 1
        else if (j >= bi.length) -1
        else ai(i).compareTo(bi(j))
      if (c < 0) { io(o) = ai(i); co(o) = ac(i); i += 1 }
      else if (c > 0) { io(o) = bi(j); co(o) = bc(j); j += 1 }
      else { io(o) = ai(i); co(o) = ac(i) + bc(j); i += 1; j += 1 }
      o += 1
    }
    if (o <= k) {
      (java.util.Arrays.copyOf(io.asInstanceOf[Array[AnyRef]], o)
        .asInstanceOf[Array[String]],
        java.util.Arrays.copyOf(co, o), an + bn)
    } else {
      // over capacity: subtract the (k+1)-th largest count from every
      // counter, keep the strictly positive (≤ k survive by choice of
      // the threshold) — the PODS'12 merge that preserves the bound
      val sorted = java.util.Arrays.copyOf(co, o)
      java.util.Arrays.sort(sorted)
      val v = sorted(o - k - 1) // (k+1)-th largest
      var keep = 0
      var t = 0
      while (t < o) { if (co(t) > v) keep += 1; t += 1 }
      val io2 = new Array[String](keep); val co2 = new Array[Long](keep)
      var u = 0; t = 0
      while (t < o) {
        if (co(t) > v) { io2(u) = io(t); co2(u) = co(t) - v; u += 1 }
        t += 1
      }
      (io2, co2, an + bn)
    }
  }

  /** Mutable Misra–Gries buffer: a hash map of STORED counts
    * (effective + debt), rows-seen n, the debt offset, and an
    * exact-from-below bound on min(stored). Kryo-encoded (it crosses
    * the wire only at exchange/state boundaries, once per group).
    */
  final class FreqBuf extends Serializable {
    val map = new java.util.HashMap[String, java.lang.Long]()
    var n: Long = 0L
    var debt: Long = 0L
    var minStored: Long = Long.MaxValue
  }

  /** Misra–Gries aggregate: IN = item (string), OUT = (Seq[(item,
    * count)] item-ascending, n). n rides in the summary so a PERSISTED
    * sketch stays self-contained: the error budget (n − ŝ)/(k+1) and
    * the heavy-hitter threshold n/(k+1) need it after re-aggregation.
    *
    * The classic implementation keeps a sorted array and pays O(k) per
    * tail insert (memcpy) and O(k) per miss (the decrement-all /
    * zero-drop sweep) — on a Zipf stream with k = 2048 that is the
    * whole wall (~half the stream is tail misses). This buffer is a
    * HASH MAP with a debt counter: MG's counter VALUES are
    * order-independent (hit += 1, insert at 1, miss decrements all and
    * drops zeros — no rule reads buffer order), so the map holds
    * stored = effective + debt and
    *   - hit / insert are O(1) (no memcpy, no sort);
    *   - a miss on a full buffer is `debt += 1` — O(1) — unless a
    *     counter dies; `minStored` (exact on insert/sweep, stale-LOW
    *     only under increments) gates the death sweep, so a stale
    *     bound costs one wasted O(k) sweep, never a missed death;
    *   - every entry is live (stored > debt) at all times.
    * Merge and finish canonicalize (de-debt + item sort) and are
    * BIT-IDENTICAL to the eager sorted-array implementation under any
    * stream and merge tree (differential property spec pins it against
    * the round-11 code verbatim).
    */
  final class FreqAgg(k: Int)
      extends Aggregator[String, FreqBuf, (Seq[(String, Long)], Long)] {
    require(k >= 1, s"frequent-items sketch needs k >= 1, got $k")

    override def zero: FreqBuf = new FreqBuf

    override def reduce(buf: FreqBuf, item: String): FreqBuf = {
      // null items are DROPPED (not counted in n) — the null-input
      // policy of every other operator family
      if (item == null) return buf
      val v = buf.map.get(item)
      if (v != null) { // present (live by invariant): bump in place
        buf.map.put(item, v + 1L)
        buf.n += 1L
      } else if (buf.map.size < k) { // room: effective 1
        buf.map.put(item, buf.debt + 1L)
        buf.minStored = buf.debt + 1L // the new exact global min
        buf.n += 1L
      } else {
        // full, item absent: every effective count drops by 1 (the
        // unseen item's own 1 → 0, never stored)
        buf.debt += 1L
        buf.n += 1L
        if (buf.minStored <= buf.debt) {
          // possible deaths: one sweep removes stored ≤ debt (effective
          // 0) and re-establishes the exact minimum
          var newMin = Long.MaxValue
          val it = buf.map.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.longValue()
            if (c <= buf.debt) it.remove()
            else if (c < newMin) newMin = c
          }
          buf.minStored = newMin
        }
      }
      buf
    }

    /** Canonical (item-sorted, effective-count) view — every entry is
      * live by invariant, so this only de-debts and sorts.
      */
    private def canonical(buf: FreqBuf)
        : (Array[String], Array[Long], Long) = {
      val m = buf.map.size
      val its = new Array[String](m)
      var i = 0
      val keys = buf.map.keySet().iterator()
      while (keys.hasNext) { its(i) = keys.next(); i += 1 }
      java.util.Arrays.sort(its.asInstanceOf[Array[AnyRef]])
      val cts = new Array[Long](m)
      i = 0
      while (i < m) { cts(i) = buf.map.get(its(i)) - buf.debt; i += 1 }
      (its, cts, buf.n)
    }

    private def fromCanonical(io: Array[String], co: Array[Long],
                              n: Long): FreqBuf = {
      val out = new FreqBuf
      out.n = n
      var minS = Long.MaxValue
      var i = 0
      while (i < io.length) {
        out.map.put(io(i), co(i))
        if (co(i) < minS) minS = co(i)
        i += 1
      }
      out.minStored = minS
      out
    }

    override def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
      val (ai, ac, an) = canonical(a)
      val (bi, bc, bn) = canonical(b)
      val (io, co, n) = freqMergeCanonical(k, ai, ac, an, bi, bc, bn)
      fromCanonical(io, co, n)
    }

    override def finish(buf: FreqBuf): (Seq[(String, Long)], Long) = {
      val (its, cts, n) = canonical(buf)
      (its.indices.map(i => (its(i), cts(i))), n)
    }

    override def bufferEncoder: org.apache.spark.sql.Encoder[FreqBuf] =
      Encoders.kryo[FreqBuf]
    override def outputEncoder
        : ExpressionEncoder[(Seq[(String, Long)], Long)] =
      ExpressionEncoder[(Seq[(String, Long)], Long)]()
  }

  /** Frequent-items aggregate as an untyped column function — OUT is a
    * struct `(_1: array<struct<_1: item, _2: count>>, _2: n)`, items
    * ascending. Works in batch and watermarked streaming aggregations
    * (state per group = one ≤k summary, cardinality-independent).
    */
  def freqSketch(item: Column, k: Int): Column =
    memo("freq", k)(udaf(new FreqAgg(k), Encoders.STRING)).apply(item)

  /** Re-aggregation of PERSISTED frequent-items summaries — IN = the
    * OUT form of [[FreqAgg]], merged through the same PODS'12 merge
    * (one input row per part). Exact below capacity like any MG merge
    * of exact parts; over capacity the guarantees compose (the
    * undercount budgets add).
    */
  final class FreqMergeAgg(k: Int)
      extends Aggregator[(Seq[(String, Long)], Long),
        (Array[String], Array[Long], Long), (Seq[(String, Long)], Long)] {
    require(k >= 1, s"frequent-items sketch needs k >= 1, got $k")
    override def zero: (Array[String], Array[Long], Long) =
      (Array.empty[String], Array.emptyLongArray, 0L)
    override def reduce(buf: (Array[String], Array[Long], Long),
                        in: (Seq[(String, Long)], Long))
        : (Array[String], Array[Long], Long) = {
      // null summary rows (outer-join misses, null columns) drop
      if (in == null || in._1 == null) return buf
      freqMergeCanonical(k, buf._1, buf._2, buf._3,
        in._1.map(_._1).toArray, in._1.map(_._2).toArray, in._2)
    }
    override def merge(a: (Array[String], Array[Long], Long),
                       b: (Array[String], Array[Long], Long))
        : (Array[String], Array[Long], Long) =
      freqMergeCanonical(k, a._1, a._2, a._3, b._1, b._2, b._3)
    override def finish(buf: (Array[String], Array[Long], Long))
        : (Seq[(String, Long)], Long) =
      (buf._1.indices.map(i => (buf._1(i), buf._2(i))), buf._3)
    override def bufferEncoder
        : ExpressionEncoder[(Array[String], Array[Long], Long)] =
      ExpressionEncoder[(Array[String], Array[Long], Long)]()
    override def outputEncoder
        : ExpressionEncoder[(Seq[(String, Long)], Long)] =
      ExpressionEncoder[(Seq[(String, Long)], Long)]()
  }

  /** [[FreqMergeAgg]] as an untyped column aggregate. */
  def freqMerge(sk: Column, k: Int): Column =
    memo("freqMerge", k)(udaf(new FreqMergeAgg(k),
      ExpressionEncoder[(Seq[(String, Long)], Long)]())).apply(
      sk.getField("_1"), sk.getField("_2"))

  /** The (item, count) entries of a frequent-items summary. */
  def freqItems(sk: Column): Column = sk.getField("_1")

  /** Pairwise MG union as a pure EXPRESSION — the q123 set-algebra
    * device applied to top-k: combine two PERSISTED summaries without
    * an aggregate (join two sketch tables, union in the select list).
    * This is the PODS'12 merge verbatim: sum counts per item (≤ 2k
    * entries, so the O(k²) membership scan is constant work), and if
    * over capacity subtract the (k+1)-th largest and drop
    * non-positives — the guarantees compose (undercount budgets add).
    * Exact when the combined support fits k: bit-equal to
    * [[FreqMergeAgg]] over the same parts (pinned in spec).
    */
  def freqUnion(a: Column, b: Column, k: Int): Column = {
    val combined = concat(freqItems(a), freqItems(b))
    val items = array_distinct(transform(combined, _.getField("_1")))
    val summed = transform(items, i =>
      struct(i.as("_1"),
        aggregate(combined, lit(0L), (acc, e) =>
          acc + when(e.getField("_1") === i, e.getField("_2"))
            .otherwise(0L)).as("_2")))
    val m = size(summed)
    val countsAsc = sort_array(transform(summed, _.getField("_2")))
    // (k+1)-th largest = index m-k ascending; greatest(1, ...) keeps
    // the (lazily unevaluated) under-capacity branch index-safe
    val thresh = element_at(countsAsc, greatest(lit(1), m - lit(k)))
    val cut = transform(
      filter(summed, e => e.getField("_2") > thresh),
      e => struct(e.getField("_1").as("_1"),
        (e.getField("_2") - thresh).as("_2")))
    val entries = when(m <= k, sort_array(summed))
      .otherwise(sort_array(cut))
    struct(entries.as("_1"), (freqN(a) + freqN(b)).as("_2"))
  }

  /** Rows-seen n carried by the summary. */
  def freqN(sk: Column): Column = sk.getField("_2")

  /** Σ retained counts ŝ — with [[freqN]] this gives the summary's own
    * undercount budget (n − ŝ)/(k+1).
    */
  def freqRetained(sk: Column): Column =
    aggregate(freqItems(sk), lit(0L), (acc, x) => acc + x.getField("_2"))

  /** Canonical "item:count" CSV of the top `m` entries under (count
    * DESC, item ASC) — deterministic content whenever the summary is in
    * the exact regime (group distinct ≤ k); over capacity the VALUES
    * are merge-tree-dependent and only the [[freqBoundsOk]] /
    * [[freqHeavyRecallOk]] guarantees are stable.
    */
  def freqTopCsv(sk: Column, m: Int): Column = {
    val sorted = array_sort(freqItems(sk), (l, r) =>
      when(l.getField("_2") > r.getField("_2"), -1)
        .when(l.getField("_2") < r.getField("_2"), 1)
        .when(l.getField("_1") < r.getField("_1"), -1)
        .when(l.getField("_1") > r.getField("_1"), 1)
        .otherwise(0))
    array_join(transform(slice(sorted, 1, m),
      x => concat_ws(":", x.getField("_1"), x.getField("_2").cast("string"))),
      ",")
  }

  /** Verdict: every summary entry satisfies the two-sided MG guarantee
    * against an exact count map — `est ≤ true` (no overcount) and
    * `(true − est)·(k+1) ≤ n − ŝ` (bounded undercount; integer
    * arithmetic, no division). Theorem-true for a correct
    * implementation under any merge tree — the oracle pins it as a
    * constant 1.
    */
  def freqBoundsOk(sk: Column, trueCounts: Column, k: Int): Column = {
    val budget = freqN(sk) - freqRetained(sk)
    forall(freqItems(sk), x => {
      val t = element_at(trueCounts, x.getField("_1"))
      t.isNotNull && x.getField("_2") <= t &&
        (t - x.getField("_2")) * lit(k + 1) <= budget
    }).cast("long")
  }

  /** Verdict: every true heavy hitter — `true(x)·(k+1) > n` — appears
    * in the summary (pigeonhole consequence of the undercount bound).
    */
  def freqHeavyRecallOk(sk: Column, trueCounts: Column, k: Int): Column = {
    val names = transform(freqItems(sk), _.getField("_1"))
    forall(
      map_keys(map_filter(trueCounts,
        (_, v) => v * lit(k + 1) > freqN(sk))),
      t => array_contains(names, t)).cast("long")
  }

  // ==================================================================
  // Quantiles over ALL rows (Manku, Rajagopalan & Lindsay, SIGMOD
  // 1998 deterministic compaction; the level scheme popularized by
  // KLL, Karnin et al. FOCS 2016): per-group latency/doc-length
  // percentiles over 100 TB without a sort of the group and without
  // `approx_percentile`'s non-determinism-across-runs or its missing
  // persist/re-aggregate contract. The summary is a stack of level
  // buffers — level l holds values of weight 2^l, capacity c each.
  // When a level overflows it SORTS and keeps the even-indexed half at
  // doubled weight (deterministic — no random parity), pushing it up.
  //
  // Error accounting is carried IN the sketch: each compaction of
  // level-l items shifts any rank by at most 2^l, so the summary
  // tracks B = Σ 2^l over every compaction it has ever performed (its
  // own worst-case rank error, valid under ANY merge tree). The
  // estimator returns the first entry whose cumulative weight reaches
  // the target rank r = ⌈q·n⌉, which pins the returned value v to
  // |true_rank(v) − r| ≤ B + max entry weight. Like the MG summary,
  // entry CONTENT over capacity is merge-tree-dependent; what oracle
  // queries pin are (a) that theorem as a verdict column and (b) the
  // EXACT regime — n ≤ c compacts nowhere in any tree, B = 0, and the
  // summary is the exact sorted multiset, bit for bit (q135).
  // ==================================================================

  /** Shared buffer ops for the two quantile aggregates. Buffer =
    * (level-0 array of fixed length c, fill pointer, higher levels
    * (index i = level i+1, each sorted ascending), n, B).
    */
  /** Quantile-summary buffer: (level-0 array of fixed length c, fill
    * pointer, higher levels (index i = level i+1, sorted), n, B).
    */
  type QuantileBuf = (Array[Long], Int, Seq[Array[Long]], Long, Long)

  private object QuantileOps {
    type Buf = QuantileBuf

    def zero(c: Int): Buf = (new Array[Long](c), 0, Vector.empty, 0L, 0L)

    /** Keep the even-indexed half of a sorted run (deterministic
      * compaction parity — rank error ≤ the input items' weight).
      */
    private def evenHalf(sorted: Array[Long]): Array[Long] = {
      val out = new Array[Long](sorted.length / 2)
      var i = 0
      while (i < out.length) { out(i) = sorted(2 * i); i += 1 }
      out
    }

    private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length && j < b.length) {
        if (a(i) <= b(j)) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
      while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
      out
    }

    /** Merge a sorted weight-2^level run into the level stack,
      * compacting overflow upward. Returns (levels, B delta).
      */
    def pushUp(hi: Seq[Array[Long]], run0: Array[Long], level0: Int,
               c: Int): (Seq[Array[Long]], Long) = {
      var levels = hi.toVector
      var run = run0; var level = level0; var db = 0L
      while (run.nonEmpty) {
        while (levels.length < level) levels = levels :+ Array.emptyLongArray
        val merged = mergeSorted(levels(level - 1), run)
        if (merged.length <= c) {
          levels = levels.updated(level - 1, merged)
          run = Array.emptyLongArray
        } else { // whole-level compaction: error ≤ items' weight 2^level
          // odd length: HOLD BACK the max at this level — compaction
          // must never lose weight, or Σweights < n and a high-q
          // estimate can run off the end of the summary (found by the
          // q138 bound audit: cum never reached ⌈0.9n⌉)
          val odd = merged.length % 2 == 1
          val toCompact =
            if (odd) java.util.Arrays.copyOf(merged, merged.length - 1)
            else merged
          levels = levels.updated(level - 1,
            if (odd) Array(merged(merged.length - 1))
            else Array.emptyLongArray)
          run = evenHalf(toCompact)
          db += 1L << level
          level += 1
        }
      }
      (levels, db)
    }

    /** Compact a full level-0 buffer into a sorted weight-2 run. */
    def compactL0(l0: Array[Long], len: Int): Array[Long] = {
      val s = java.util.Arrays.copyOf(l0, len)
      java.util.Arrays.sort(s)
      evenHalf(s)
    }

    /** Canonical OUT form: (value, weight) pairs sorted by (value asc,
      * weight asc) — in the exact regime all weights are 1 and this is
      * the exact sorted multiset. Weights stay the per-level powers of
      * two (never collapsed) so a persisted summary re-ingests
      * losslessly into [[Sketches.QuantileMergeAgg]]'s level stack.
      */
    def finish(buf: Buf): (Seq[(Long, Long)], Long, Long) = {
      val (l0, len, hi, n, b) = buf
      val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < len) { entries += ((l0(i), 1L)); i += 1 }
      hi.indices.foreach { li =>
        val w = 1L << (li + 1)
        hi(li).foreach(v => entries += ((v, w)))
      }
      (entries.sortBy(e => (e._1, e._2)).toSeq, n, b)
    }

    def merge(a: Buf, b: Buf, c: Int): Buf = {
      val (al0, alen, ahi, an, ab) = a
      val (bl0, blen, bhi, bn, bb) = b
      var db = 0L
      // level-0: concat; compact once if over capacity (≤ 2c ⇒ one
      // even-half pass lands ≤ c)
      var l0 = al0; var len = alen
      if (alen + blen <= c) {
        System.arraycopy(bl0, 0, l0, alen, blen)
        len = alen + blen
      } else {
        val all = new Array[Long](alen + blen)
        System.arraycopy(al0, 0, all, 0, alen)
        System.arraycopy(bl0, 0, all, alen, blen)
        java.util.Arrays.sort(all)
        // odd length: hold the max back in level 0 (weight conservation
        // — see pushUp)
        val odd = all.length % 2 == 1
        val run = new Array[Long]((all.length - (if (odd) 1 else 0)) / 2)
        var i = 0
        while (i < run.length) { run(i) = all(2 * i); i += 1 }
        db += 1L // compacting weight-1 items
        l0 = new Array[Long](c)
        if (odd) { l0(0) = all(all.length - 1); len = 1 } else len = 0
        val (hi2, db2) = pushUp(ahi, run, 1, c)
        val (hi3, db3) = foldLevels(hi2, bhi, c)
        return (l0, len, hi3, an + bn, ab + bb + db + db2 + db3)
      }
      val (hi3, db3) = foldLevels(ahi, bhi, c)
      (l0, len, hi3, an + bn, ab + bb + db + db3)
    }

    /** Merge b's level stack into a's, low to high. */
    private def foldLevels(a: Seq[Array[Long]], b: Seq[Array[Long]],
                           c: Int): (Seq[Array[Long]], Long) = {
      var levels = a
      var db = 0L
      b.indices.foreach { li =>
        if (b(li).nonEmpty) {
          val (l2, d) = pushUp(levels, b(li), li + 1, c)
          levels = l2; db += d
        }
      }
      (levels, db)
    }
  }

  /** Quantile-summary aggregate: IN = value (long), OUT = (entries
    * sorted by value, n, B). `c` = per-level capacity; the summary is
    * EXACT (B = 0, entries = the sorted multiset) while n ≤ c under
    * any merge tree, and ~c·log₂(n/c) entries with tracked worst-case
    * rank error B above it.
    */
  final class QuantileAgg(c: Int)
      extends Aggregator[Long, QuantileBuf,
        (Seq[(Long, Long)], Long, Long)] {
    require(c >= 4 && c % 2 == 0, s"quantile sketch needs even c >= 4, got $c")

    override def zero: QuantileBuf = QuantileOps.zero(c)

    override def reduce(buf: QuantileBuf, v: Long): QuantileBuf = {
      var (l0, len, hi, n, b) = buf
      if (len == c) { // full: compact first so exactness holds to n = c
        val run = QuantileOps.compactL0(l0, len)
        val (hi2, db) = QuantileOps.pushUp(hi, run, 1, c)
        hi = hi2; b += 1L + db; len = 0
      }
      l0(len) = v
      (l0, len + 1, hi, n + 1L, b)
    }

    override def merge(a: QuantileBuf, b: QuantileBuf): QuantileBuf =
      QuantileOps.merge(a, b, c)

    override def finish(buf: QuantileBuf): (Seq[(Long, Long)], Long, Long) =
      QuantileOps.finish(buf)

    override def bufferEncoder: ExpressionEncoder[QuantileBuf] =
      ExpressionEncoder[QuantileBuf]()
    override def outputEncoder
        : ExpressionEncoder[(Seq[(Long, Long)], Long, Long)] =
      ExpressionEncoder[(Seq[(Long, Long)], Long, Long)]()
  }

  /** Re-aggregation of PERSISTED quantile summaries (the rollup path:
    * daily per-partition sketches → one summary per group, no rescan).
    * IN = the OUT form of [[QuantileAgg]]; entries re-enter the level
    * stack at their weight's level (weights are always powers of two),
    * so a rollup of exact parts is exact and B adds honestly — rollup
    * error is only what NEW compactions introduce.
    */
  final class QuantileMergeAgg(c: Int)
      extends Aggregator[(Seq[(Long, Long)], Long, Long), QuantileBuf,
        (Seq[(Long, Long)], Long, Long)] {
    require(c >= 4 && c % 2 == 0, s"quantile sketch needs even c >= 4, got $c")

    override def zero: QuantileBuf = QuantileOps.zero(c)

    override def reduce(buf: QuantileBuf,
                        in: (Seq[(Long, Long)], Long, Long)): QuantileBuf = {
      // null sketch rows (outer-join misses, null columns) drop — the
      // same policy as FreqMergeAgg/KmvMergeAgg
      if (in == null || in._1 == null) return buf
      val (entries, n, b) = in
      // rebuild the part's level stack from its entries, then merge
      var part = QuantileOps.zero(c)
      val byW = entries.groupBy(_._2)
      byW.toSeq.sortBy(_._1).foreach { case (w, es) =>
        val vals = es.map(_._1).sorted.toArray
        val level = java.lang.Long.numberOfTrailingZeros(w)
        require(java.lang.Long.bitCount(w) == 1,
          s"quantile entry weight $w is not a power of two")
        if (level == 0) {
          var (l0, len, hi, pn, pb) = part
          vals.foreach { v =>
            if (len == c) {
              val run = QuantileOps.compactL0(l0, len)
              val (hi2, db) = QuantileOps.pushUp(hi, run, 1, c)
              hi = hi2; pb += 1L + db; len = 0
            }
            l0(len) = v; len += 1
          }
          part = (l0, len, hi, pn, pb)
        } else {
          val (l0, len, hi, pn, pb) = part
          val (hi2, db) = QuantileOps.pushUp(hi, vals, level, c)
          part = (l0, len, hi2, pn, pb + db)
        }
      }
      val seeded = (part._1, part._2, part._3, n, part._5 + b)
      QuantileOps.merge(buf, seeded, c)
    }

    override def merge(a: QuantileBuf, b: QuantileBuf): QuantileBuf =
      QuantileOps.merge(a, b, c)

    override def finish(buf: QuantileBuf): (Seq[(Long, Long)], Long, Long) =
      QuantileOps.finish(buf)

    override def bufferEncoder: ExpressionEncoder[QuantileBuf] =
      ExpressionEncoder[QuantileBuf]()
    override def outputEncoder
        : ExpressionEncoder[(Seq[(Long, Long)], Long, Long)] =
      ExpressionEncoder[(Seq[(Long, Long)], Long, Long)]()
  }

  /** Quantile summary as an untyped column aggregate — OUT is a struct
    * `(_1: array<struct<_1: value, _2: weight>>, _2: n, _3: B)`.
    */
  def quantileSketch(value: Column, c: Int): Column =
    memo("quantile", c)(udaf(new QuantileAgg(c), Encoders.scalaLong))
      .apply(value)

  /** Re-aggregate persisted summaries (see [[QuantileMergeAgg]]). */
  def quantileMerge(sketch: Column, c: Int): Column =
    memo("quantileMerge", c)(udaf(new QuantileMergeAgg(c),
      ExpressionEncoder[(Seq[(Long, Long)], Long, Long)]())).apply(
      sketch.getField("_1"), sketch.getField("_2"), sketch.getField("_3"))

  /** The (value, weight) entries of a quantile summary. */
  def quantileEntries(sk: Column): Column = sk.getField("_1")

  /** Verdict: the summary respects its size theorem — ≤ c level-0
    * entries plus ≤ c per populated HIGHER level (pushUp leaves a
    * level un-compacted while `merged.length <= c`, so a level can
    * hold up to c entries, not c/2 — a merge tree that tops several
    * levels is reachable and CORRECT), with higher levels bounded by
    * ⌊log₂ n⌋ (a run of weight 2^l needs 2^l ≤ n rows behind it):
    * total ≤ c·(⌊log₂ n⌋ + 1), the MRL O(c·log n) bound, tight to
    * within per-level slack. NOT ≤ c — the summary keeps its level
    * stack, that's what makes the rank bound honest.
    */
  def quantileSizeOk(sk: Column, c: Int): Column = {
    val n = quantileN(sk)
    // ⌊log₂ n⌋ + 1 = bit length of n, in INTEGER arithmetic: the
    // floating-point log₂ can round ⌊log₂ 2^k⌋ down a level for exact
    // powers of two, silently shrinking the bound the verdict audits
    val maxLevels = length(bin(greatest(n, lit(1L)))).cast("long")
    (size(quantileEntries(sk)).cast("long") <=
      lit(c.toLong) * maxLevels).cast("long")
  }

  /** Rows-seen n carried by a quantile summary. */
  def quantileN(sk: Column): Column = sk.getField("_2")

  /** The summary's own worst-case rank-error budget B (0 ⇔ exact). */
  def quantileErr(sk: Column): Column = sk.getField("_3")

  /** Rank bound for verdicts: B + the largest entry weight (the
    * estimator overshoots its target rank by less than one entry).
    */
  def quantileRankBound(sk: Column): Column =
    quantileErr(sk) + coalesce(
      array_max(transform(sk.getField("_1"), _.getField("_2"))), lit(0L))

  /** Quantile estimate: the first entry (value ascending) whose
    * cumulative weight reaches r = max(1, ⌈q·n⌉). In the exact regime
    * this is precisely `element_at(sorted, ceil(q·n))` — the same rank
    * convention as [[sampleQuantile]] and the oracle queries.
    */
  def quantileEstimate(sk: Column, q: Double): Column = {
    val target = greatest(lit(1L),
      ceil(quantileN(sk).cast("double") * lit(q)).cast("long"))
    aggregate(sk.getField("_1"),
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("_2")
        struct(cum.as("cum"),
          when(acc.getField("ans").isNull && cum >= target, x.getField("_1"))
            .otherwise(acc.getField("ans")).as("ans"))
      },
      acc => acc.getField("ans"))
  }

  /** Verdict: an over-capacity summary's q-estimate lands within its
    * OWN tracked rank bound, audited against an exact-regime reference
    * summary of the same group (whose entries ARE the value list, so
    * true ranks are plain weighted counts over it). Theorem-true for a
    * correct implementation under any merge tree — the q135/q138
    * device with the reference carried IN-STREAM, no second scan.
    * Includes weight conservation (both summaries saw the same n).
    */
  def quantileWithinBoundOk(sk: Column, ref: Column, q: Double): Column = {
    val v = quantileEstimate(sk, q)
    val n = quantileN(ref)
    val target = greatest(lit(1L),
      ceil(n.cast("double") * lit(q)).cast("long"))
    val rb = quantileRankBound(sk)
    def rank(cmp: (Column, Column) => Column): Column =
      aggregate(ref.getField("_1"), lit(0L), (acc, x) =>
        acc + when(cmp(x.getField("_1"), v), x.getField("_2"))
          .otherwise(0L))
    (quantileN(sk) === n &&
      rank(_ <= _) >= target - rb && rank(_ < _) <= target + rb)
      .cast("long")
  }

  /** Production hash for the sketch input: `xxhash64 >>> 4`, uniform on
    * [0, 2⁶⁰) like `md5_long60` but whole-stage-codegen'd and ~10×
    * cheaper — the right kernel when the scan is 100 TB and nothing
    * needs to reproduce the hash outside Spark. Oracle-checked queries
    * use `md5_long60` (DuckDB-reproducible); everything downstream of
    * the hash is identical.
    */
  def kmvHash64(value: Column): Column =
    shiftrightunsigned(xxhash64(value), 4)
}
