package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an `array<float>` embedding column, expressed
  * as iterated DataFrame plans — the centroid trainer for the IVF /
  * SemDeDup cell decomposition ([[Similarity]]).
  *
  * Plan shape per iteration:
  *   - ASSIGN: centroids ship as a broadcast literal (k·dim floats —
  *     KBs); the argmin is a narrow projection, the corpus never
  *     shuffles for it.
  *   - UPDATE: per-(cell, dimension) mean = one posexplode + ONE
  *     partial+final agg shuffle of k·dim groups; the k·dim result
  *     collects to the driver and becomes the next broadcast. That
  *     round-trip is fine up to k·dim in the millions (MBs); for
  *     IVF-scale k·dim beyond that, keep centroids as a joined table
  *     instead of a literal.
  *
  * So `iters` iterations cost `iters` aggregation shuffles over
  * (corpus × dim) rows — linear, no pairwise work, no corpus cache
  * requirement (though callers should `.cache()` the input when the
  * scan is expensive). Empty clusters keep their previous centroid.
  * Seeding: the first k vectors by id (deterministic); swap for
  * k-means++ driver-side if initialization quality matters.
  */
object KMeans {

  /** Cell assignment for a fixed centroid set: id, cell (argmin L2,
    * first-min tie-break). The centroids ship as ONE array literal
    * walked by a higher-order transform — plan size stays O(1) in k
    * (an `array(k distance exprs)` build grows the plan and the
    * generated code linearly with k, which breaks down for IVF-scale
    * cell counts).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Float]]): DataFrame = {
    val centArr = typedlit(centroids)
    corpus.select(col(idCol), col(vecCol))
      .withColumn("_d", transform(centArr, c =>
        aggregate(
          zip_with(col(vecCol), c, (x, y) => {
            val d = x.cast("double") - y.cast("double"); d * d
          }),
          lit(0.0), (acc, x) => acc + x)))
      .withColumn("cell",
        (array_position(col("_d"), array_min(col("_d"))) - 1).cast("int"))
      .drop("_d")
  }

  /** Train centroids: returns (centroids, final assignment). */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): (Seq[Seq[Float]], DataFrame) = {
    var cents: Seq[Seq[Float]] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val means = assign(corpus, idCol, vecCol, cents)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cell", "dim").agg(avg(col("v").cast("double")).as("m"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getAs[Int]("dim"))
            .map(_.getAs[Double]("m").toFloat).toSeq
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    (cents, assign(corpus, idCol, vecCol, cents))
  }
}
