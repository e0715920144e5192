package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, written as
  * higher-order Column expressions (`zip_with`/`aggregate`) so they run
  * inside codegen with zero UDF/serialization cost.
  *
  * Floats are widened to double BEFORE multiplication and accumulated
  * left-to-right — deterministic and engine-portable (matches a
  * sequential C++ accumulator bit-for-bit, which the oracle relies on).
  */
object VectorFunctions {

  /** Dot product of two float-array columns, double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Bit-identical native form of [[dot]]: one fused primitive loop
    * (no intermediate products array), codegen'd via the custom
    * `graft.plans.VecDot` expression. Requires the graft extensions
    * (`GraftSession.configure` installs them); prefer it on pairwise
    * hot loops at scale.
    */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (|a|·|b|), op order fixed. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms: dot(a,b) / (na·nb). Bit-identical
    * to [[cosine]] when na/nb are [[norm]] of the same vectors (same
    * FP ops in the same order) — but the norms hoist out of a pairwise
    * join, turning 3 array traversals per PAIR into 1 per pair + 1 per
    * ROW. In an |Q|·N candidate loop that's ~3× less hot-path work.
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** [[norm]] on the fused native dot — same double, one primitive loop. */
  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** [[cosineWithNorms]] on the fused native dot. Bit-identical. */
  def cosineWithNormsNative(a: Column, b: Column, na: Column, nb: Column): Column =
    dotNative(a, b) / (na * nb)

  /** Sign-pattern LSH bucket over the first `bits` dimensions: the
    * cheapest hyperplane family (axis-aligned). At scale the bucket is
    * the shuffle/partition key, so ANN probes touch only one bucket.
    */
  def signBucket(a: Column, bits: Int): Column =
    array_join(transform(sequence(lit(1), lit(bits)),
      i => when(try_element_at(a, i) > 0, "1").otherwise("0")), "")
}
