package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Primitive-buffer bounded top-k: two sorted primitive arrays,
  * (key asc, id asc) through `java.lang.Double.compare` /
  * `Long.compare` — the EXACT total order of
  * [[graft.operators.TopK]]'s typed Aggregator (NaN last), which this
  * replaces on the hot paths: the typed form pays an encoder
  * round-trip plus a Cand allocation plus immutable-Vector churn PER
  * CANDIDATE ROW (measured ~4M rows/s on the candidate-heavy
  * streaming geometry — BASELINE's 35.7 s vs batch 5.71 s), where this
  * buffer's common case is one primitive compare against the current
  * k-th (reject) and its worst case one binary search + one
  * `arraycopy`.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val d: Array[Double] = new Array[Double](k)
  val id: Array[Long] = new Array[Long](k)

  @inline private def lessThan(d1: Double, i1: Long,
                               d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && i1 < i2)
  }

  def insert(dv: Double, iv: Long): Unit = {
    if (size == k && !lessThan(dv, iv, d(k - 1), id(k - 1))) return
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lessThan(dv, iv, d(mid), id(mid))) hi = mid else lo = mid + 1
    }
    val shift = math.min(size, k - 1) - lo
    if (shift > 0) {
      System.arraycopy(d, lo, d, lo + 1, shift)
      System.arraycopy(id, lo, id, lo + 1, shift)
    }
    d(lo) = dv
    id(lo) = iv
    if (size < k) size += 1
  }

  /** Bounded two-way merge (both inputs sorted) into this buffer. */
  def mergeIn(o: TopKBuffer): TopKBuffer = {
    if (o.size == 0) return this
    val nd = new Array[Double](k)
    val nid = new Array[Long](k)
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < size || j < o.size)) {
      val takeThis = j >= o.size ||
        (i < size && !lessThan(o.d(j), o.id(j), d(i), id(i)))
      if (takeThis) { nd(n) = d(i); nid(n) = id(i); i += 1 }
      else { nd(n) = o.d(j); nid(n) = o.id(j); j += 1 }
      n += 1
    }
    System.arraycopy(nd, 0, d, 0, n)
    System.arraycopy(nid, 0, id, 0, n)
    size = n
    this
  }
}

/** `bounded_topk(k, d, id)` — mergeable bounded top-k as a native
  * [[TypedImperativeAggregate]]: map-side partials, shuffled partials,
  * and the streaming state row all clamp at k entries (the
  * [[graft.operators.TopK]] contract), output bit-identical to the
  * typed form (`array<struct<d double, id bigint>>` ascending) —
  * differential-spec-pinned including NaN ordering and duplicate
  * keys. Null `d` or `id` inputs are ignored (the typed form never
  * sees them — its call sites compute both from non-null columns).
  *
  * `k` is a foldable positive int (buffer geometry rides the
  * expression, like percentile's accuracy).
  */
case class BoundedTopK(k: Int,
                       left: Expression, right: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with BinaryLike[Expression] {

  require(k >= 1, s"bounded_topk: k must be >= 1: $k")

  override def prettyName: String = "bounded_topk"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_topk(k, d DOUBLE, id BIGINT) — got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  // Codegen'd input projection for the per-candidate update path:
  // ObjectAggregation evaluates a TypedImperativeAggregate's children
  // with interpreted `eval`, and the optimizer collapses the child
  // Project INTO the aggregate — so a candidate-volume child like the
  // native adc_dist fold ran INTERPRETED per candidate row (the
  // measured 23 s-vs-batch-5.7 s residual on the candidate-heavy
  // streaming geometry after the buffer itself went primitive). One
  // generated projection restores the codegen path the batch plan's
  // WholeStageCodegen span gives the same expression for free.
  // Lazily built on first update: by then the function instance is the
  // BOUND copy (children are BoundReferences), which is what
  // UnsafeProjection.create requires; falls back to the interpreted
  // projection under codegen-factory fallback, same semantics.
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Seq(left, right))

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val row = inputProj(input)
    if (!row.isNullAt(0) && !row.isNullAt(1))
      buf.insert(row.getDouble(0), row.getLong(1))
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer =
    buf.mergeIn(other)

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.d(i), buf.id(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.d(i)); i += 1 }
    i = 0
    while (i < buf.size) { bb.putLong(buf.id(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bk = bb.getInt()
    val n = bb.getInt()
    val buf = new TopKBuffer(bk)
    buf.size = n
    var i = 0
    while (i < n) { buf.d(i) = bb.getDouble(); i += 1 }
    i = 0
    while (i < n) { buf.id(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}
