package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Seeding: the first k vectors by id (deterministic) by default;
  * [[seedParallel]] is the k-means|| initialization (Bahmani et al.,
  * "Scalable k-means++", VLDB 2012) when seed quality matters.
  */
object KMeans {

  /** Per-centroid squared-L2 distances as one array column: the
    * centroid set rides a single literal walked by a higher-order
    * transform, so plan size stays O(1) in k.
    */
  private def distSqArray(vecCol: String, centroids: Seq[Seq[Float]]): Column =
    transform(typedlit(centroids), c =>
      aggregate(
        zip_with(col(vecCol), c, (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }),
        lit(0.0), (acc, x) => acc + x))

  /** Cell assignment for a fixed centroid set: id, cell (argmin L2,
    * first-min tie-break). The centroids ship as ONE array literal
    * walked by a higher-order transform — plan size stays O(1) in k
    * (an `array(k distance exprs)` build grows the plan and the
    * generated code linearly with k, which breaks down for IVF-scale
    * cell counts).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Float]]): DataFrame = {
    corpus.select(col(idCol), col(vecCol))
      .withColumn("_d", distSqArray(vecCol, centroids))
      .withColumn("cell",
        (array_position(col("_d"), array_min(col("_d"))) - 1).cast("int"))
      .drop("_d")
  }

  /** Within-cluster sum of squares (Σ min-distance²) for a centroid
    * set — the standard seeding-quality metric. One scan, no shuffle.
    */
  def wcss(corpus: DataFrame, vecCol: String,
           centroids: Seq[Seq[Float]]): Double =
    corpus.select(array_min(distSqArray(vecCol, centroids)).as("d2"))
      .agg(coalesce(sum("d2"), lit(0.0))).head().getDouble(0)

  /** k-means|| seeding (Bahmani et al., "Scalable k-means++", VLDB
    * 2012) — the distributed form of k-means++: instead of k strictly
    * sequential D²-weighted draws (k cluster-wide passes), each of
    * `rounds` passes OVERSAMPLES ~`l` points independently with
    * probability l·d²(x,C)/ψ, then the O(rounds·l) candidate set is
    * weighted by cell population and reduced to k driver-side.
    *
    * Cost: `rounds` corpus scans (each a narrow projection against a
    * broadcast candidate literal + one sum) plus one counting
    * aggregation — no corpus shuffle anywhere. Draws are derandomized
    * through xxhash64(id, seed, round), so seeding is reproducible
    * cluster-wide regardless of partitioning — no RNG-per-partition
    * nondeterminism.
    *
    * May return fewer than k centroids when the corpus has fewer than
    * k distinct points (ψ hits 0); callers get exactly what the data
    * supports.
    */
  def seedParallel(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, rounds: Int = 3, oversample: Int = 0,
                   seed: Long = 42L): Seq[Seq[Float]] = {
    val l = if (oversample > 0) oversample else math.max(2 * k, 2)
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // deterministic "uniform" first candidate: minimum id-hash
    val first = base.withColumn("h", xxhash64(col("id"), lit(seed)))
      .orderBy(col("h"), col("id")).limit(1)
      .select("v").collect()
    if (first.isEmpty) return Seq.empty
    var cands = Vector(first.head.getAs[scala.collection.Seq[Float]](0).toSeq)
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val withD = base.withColumn("d2", array_min(distSqArray("v", cands)))
      val psi = withD.agg(coalesce(sum("d2"), lit(0.0))).head().getDouble(0)
      if (psi <= 0) exhausted = true // every point already a candidate
      else {
        val h = xxhash64(col("id"), lit(seed), lit(r))
        val u = pmod(h, lit(1000000000L)).cast("double") / 1e9
        // collect (hash, v) and sort driver-side: collect() returns
        // partition order, and candidate ORDER feeds the seeded-Random
        // reduction below — unsorted, the result would depend on
        // partitioning despite the derandomized draws
        val fresh = withD
          .filter(col("d2") > 0.0 &&
            u < least(lit(1.0), lit(l.toDouble) * col("d2") / lit(psi)))
          .select(h.as("h"), col("v")).collect()
          .map(r0 => (r0.getLong(0),
            r0.getAs[scala.collection.Seq[Float]](1).toSeq))
          .sortBy { case (hv, v) => (hv, v.mkString(",")) }
          .map(_._2)
        // distinct: two identical vectors drawn in the same round both
        // pass the d2>0 freshness check against PRIOR candidates only
        cands = (cands ++ fresh).distinct
      }
    }
    if (cands.length <= k) return cands
    // weight candidates by the population they'd absorb, then reduce
    // to k with driver-side weighted k-means++ (candidate set is tiny)
    val counts = assign(corpus, idCol, vecCol, cands)
      .groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count")).toMap
    val weights = cands.indices.map(i => counts.getOrElse(i, 0L).toDouble.max(1.0))
    driverWeightedKMeans(cands, weights, k, seed)
  }

  /** Weighted k-means++ seeding + Lloyd refinement over an in-memory
    * candidate set (the k-means|| reduction step — inputs are
    * O(rounds·oversample) points, never the corpus).
    */
  private def driverWeightedKMeans(pts: Seq[Seq[Float]], w: Seq[Double],
                                   k: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    def d2(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    def weightedPick(prob: Seq[Double]): Int = {
      var x = rnd.nextDouble() * prob.sum
      var i = 0
      while (i < prob.length - 1 && x >= prob(i)) { x -= prob(i); i += 1 }
      i
    }
    val centers = scala.collection.mutable.ArrayBuffer(pts(weightedPick(w)))
    while (centers.length < k) {
      val probs = pts.zip(w).map { case (p, wt) =>
        centers.map(c => d2(p, c)).min * wt }
      if (probs.sum <= 0) centers += pts(rnd.nextInt(pts.length))
      else centers += pts(weightedPick(probs))
    }
    var cs: Seq[Seq[Float]] = centers.toSeq
    for (_ <- 0 until 5) {
      val assignIdx = pts.map(p => cs.indices.minBy(i => d2(p, cs(i))))
      cs = cs.indices.map { ci =>
        val members = pts.indices.filter(assignIdx(_) == ci)
        if (members.isEmpty) cs(ci)
        else {
          val dim = pts.head.length
          val acc = new Array[Double](dim)
          var tw = 0.0
          members.foreach { mi =>
            val wt = w(mi); tw += wt
            val p = pts(mi)
            var j = 0; while (j < dim) { acc(j) += p(j) * wt; j += 1 }
          }
          acc.map(v => (v / tw).toFloat).toSeq
        }
      }
    }
    cs
  }

  /** Mini-batch k-means (Sculley, "Web-scale k-means clustering", WWW
    * 2010): each iteration assigns only a hash-sampled fraction of the
    * corpus and moves every centroid toward its batch mean with a
    * per-cell learning rate 1/n_c (n_c = points that cell has absorbed
    * across all batches so far) — the standard per-center step size
    * that makes the update a running mean over everything the cell has
    * ever seen.
    *
    * Cost per iteration: one narrow projection over the SAMPLE (the
    * hash filter evaluates scan-side, so `fraction` of the corpus is
    * touched) + one k·dim agg shuffle of sample rows only — the
    * full-batch [[fit]] pass costs 1/fraction times more. Use when the
    * corpus is huge relative to k·dim and per-iteration full scans
    * dominate (the NEXT.md trade-off).
    *
    * Sampling is derandomized through xxhash64(id, seed, iter): the
    * batch membership is a pure function of the row id, so training is
    * reproducible regardless of partitioning or cluster layout.
    */
  def fitMiniBatch(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, fraction: Double,
                   init: Seq[Seq[Float]] = Nil,
                   seed: Long = 42L): (Seq[Seq[Float]], DataFrame) = {
    require(fraction > 0 && fraction <= 1.0, s"fraction must be in (0,1]: $fraction")
    var cents: Seq[Seq[Float]] =
      if (init.nonEmpty) init
      else corpus.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).toSeq).toSeq
    val dim = if (cents.nonEmpty) cents.head.length else 0
    val seen = new Array[Long](cents.length)
    for (it <- 0 until iters) {
      val u = pmod(xxhash64(col(idCol), lit(seed), lit(it)), lit(1000000000L))
        .cast("double") / 1e9
      val batch = corpus.filter(u < fraction)
      // per-cell batch sums and counts in ONE agg over sample×dim rows
      val stats = assign(batch, idCol, vecCol, cents)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
        .map { case (cell, rows) =>
          val sorted = rows.sortBy(_.getAs[Int]("dim"))
          cell -> (sorted.map(_.getAs[Double]("s")), sorted.head.getAs[Long]("n"))
        }
      cents = cents.indices.map { ci =>
        stats.get(ci) match {
          case Some((sums, n)) if n > 0 =>
            seen(ci) += n
            val eta = n.toDouble / seen(ci)
            val old = cents(ci)
            (0 until dim).map(j =>
              ((1 - eta) * old(j) + eta * (sums(j) / n)).toFloat)
          case _ => cents(ci) // empty batch cell keeps its centroid
        }
      }
    }
    (cents, assign(corpus, idCol, vecCol, cents))
  }

  /** Train centroids: returns (centroids, final assignment). `init`
    * overrides the default first-k-by-id seeding (pass
    * [[seedParallel]]'s output for k-means|| initialization).
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int,
          init: Seq[Seq[Float]] = Nil): (Seq[Seq[Float]], DataFrame) = {
    var cents: Seq[Seq[Float]] =
      if (init.nonEmpty) init
      else corpus.orderBy(col(idCol)).limit(k)
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
