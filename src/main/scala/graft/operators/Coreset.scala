package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space coreset selection — greedy k-center (Gonzalez 1985
  * farthest-point traversal) for training-data diversity curation:
  * pick k documents so every document is within the coverage radius of
  * a pick, the classic 2-approximation to the k-center objective. The
  * selected set is the "maximally spread" subset — the diversity
  * complement of the dedup family (dedup removes the too-close;
  * k-center keeps the deliberately far-apart).
  *
  * Plan shape (the 100 TB story): k passes over the corpus, each a
  * NARROW projection — the running min-distance column updates against
  * ONE new center (a broadcast literal, d floats), and the next center
  * is a TakeOrderedAndProject top-1 (per-partition top-1 + driver
  * merge of #partitions rows — never a global sort, never a corpus
  * collect). The frame persists every iteration and unpersists its
  * predecessor, so lineage stays O(1) deep and each pass reads the
  * cached (id, vec, mind) projection, not the source scan. Driver
  * state is k rows (the picks).
  *
  * DETERMINISM: distances are the [[KMeans]] fold (zip_with diff² +
  * left-fold sum — order-pinned, no libm), ties on the max-min
  * distance break by id ascending, so the traversal replays exactly
  * in any IEEE-754 engine (the q177 oracle unrolls it in DuckDB).
  */
object Coreset {

  /** One selected center: traversal position (1-based), id, and the
    * coverage radius at selection — the max-min squared distance the
    * pick reduced (0 for the seed). Radii are non-increasing; after k
    * picks, radius_k bounds every point's distance to its nearest
    * center at most 2× the optimal k-center value.
    */
  final case class Center(iter: Int, id: Long, vec: Seq[Float],
                          radiusSq: Double)

  private def d2(vecCol: Column, center: Seq[Float]): Column =
    aggregate(
      zip_with(vecCol, typedlit(center), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Greedy k-center selection. Seed: the minimum id (deterministic).
    * Returns the picks in traversal order — FEWER than k when the
    * corpus has fewer than k distinct vectors (the traversal stops
    * when the coverage radius hits zero rather than emitting
    * duplicate centers).
    */
  def kCenter(corpus: DataFrame, idCol: String, vecCol: String,
              k: Int): Seq[Center] = {
    require(k >= 1, s"k must be >= 1: $k")
    val base = corpus.select(col(idCol).cast("long").as("_id"),
      col(vecCol).as("_v"))
    val seedRow = base.orderBy(col("_id").asc).limit(1)
      .collect().headOption
      .getOrElse(throw new IllegalArgumentException("empty corpus"))
    val seed = Center(1, seedRow.getLong(0),
      seedRow.getSeq[Float](1), 0.0)

    var picks = Vector(seed)
    var cur = base
      .withColumn("_mind", d2(col("_v"), seed.vec))
      .persist()
    cur.count()
    var prev = cur
    var i = 2
    var exhausted = false
    while (i <= k && !exhausted) {
      val top = cur.orderBy(col("_mind").desc, col("_id").asc).limit(1)
        .collect().head
      // max min-distance 0 ⇒ every remaining vector IS a center
      // already — further picks would be silent duplicates (and
      // downstream k-means seeds would collapse cells). Return the
      // distinct prefix instead.
      if (top.getDouble(2) == 0.0) exhausted = true
      else {
        val c = Center(i, top.getLong(0), top.getSeq[Float](1),
          top.getDouble(2))
        picks = picks :+ c
        if (i < k) {
          cur = cur.withColumn("_mind",
            least(col("_mind"), d2(col("_v"), c.vec))).persist()
          cur.count()
          prev.unpersist()
          prev = cur
        }
        i += 1
      }
    }
    prev.unpersist()
    picks
  }

  /** Assign every corpus row to its nearest pick (squared-L2 asc, then
    * traversal order asc — the deterministic tiebreak). Output:
    * idCol's values as `point_id`, `iter` (the winning pick's
    * traversal position), `center_id`, `d2` (raw double). Narrow
    * projection over a k-literal — no shuffle.
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             picks: Seq[Center]): DataFrame = {
    require(picks.nonEmpty, "no picks")
    val lits = typedlit(picks.map(_.vec))
    val iters = typedlit(picks.map(_.iter.toLong))
    val ids = typedlit(picks.map(_.id))
    corpus
      .select(col(idCol).cast("long").as("point_id"), col(vecCol).as("_v"))
      .withColumn("_ds", zip_with(lits, iters, (c, it) =>
        struct(aggregate(zip_with(col("_v"), c, (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, x) => acc + x).as("d2"), it.as("iter"))))
      .withColumn("_best", array_min(col("_ds")))
      .select(col("point_id"), col("_best.iter").cast("int").as("iter"),
        element_at(ids, col("_best.iter").cast("int")).as("center_id"),
        col("_best.d2").as("d2"))
  }
}
