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
  *     collects to the driver (tiny) and becomes the next broadcast.
  *
  * So `iters` iterations cost `iters` aggregation shuffles over
  * (corpus × dim) rows — linear, no pairwise work, no corpus cache
  * requirement (though callers should `.cache()` the input when the
  * scan is expensive). Empty clusters keep their previous centroid.
  * Seeding: the first k vectors by id (deterministic); swap for
  * k-means++ driver-side if initialization quality matters.
  */
object KMeans {

  /** Squared-L2 distance of a vector column to a centroid literal. */
  private def sqDist(vec: org.apache.spark.sql.Column, c: Seq[Float]) =
    aggregate(
      zip_with(vec, typedlit(c), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Cell assignment for a fixed centroid set: id, cell (argmin L2,
    * first-min tie-break).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Float]]): DataFrame = {
    val dists = array(centroids.map(c => sqDist(col(vecCol), c)): _*)
    corpus.select(col(idCol), col(vecCol))
      .withColumn("_d", dists)
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
