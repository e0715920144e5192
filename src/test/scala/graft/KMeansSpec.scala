package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated blobs around (0,0), (10,10), (-10,5)
  private def blobs = {
    val rnd = new scala.util.Random(7)
    val centers = Seq((0f, 0f), (10f, 10f), (-10f, 5f))
    (0 until 90).map { i =>
      val (cx, cy) = centers(i % 3)
      (i.toLong, Array(cx + rnd.nextFloat() * 0.5f, cy + rnd.nextFloat() * 0.5f))
    }.toDF("id", "vec")
  }

  test("kmeans separates well-formed blobs into pure clusters") {
    val (cents, asgn) = KMeans.fit(blobs, "id", "vec", k = 3, iters = 5)
    assert(cents.length == 3 && cents.forall(_.length == 2))
    // each blob (id % 3) maps to exactly one cell and cells are distinct
    val cellsByBlob = asgn.withColumn("blob", col("id") % 3)
      .select("blob", "cell").distinct()
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(cellsByBlob.values.forall(_.size == 1), cellsByBlob.toMap.toString)
    assert(cellsByBlob.values.flatten.toSet.size == 3)
    // centroids sit near the true centers
    val near = Seq((0.25, 0.25), (10.25, 10.25), (-9.75, 5.25)).forall {
      case (x, y) => cents.exists(c =>
        math.abs(c(0) - x) < 0.5 && math.abs(c(1) - y) < 0.5)
    }
    assert(near, cents.toString)
  }

  test("assign is deterministic and ties break to the first centroid") {
    val df = Seq((1L, Array(0f, 0f))).toDF("id", "vec")
    // equidistant centroids: first index wins
    val a = KMeans.assign(df, "id", "vec", Seq(Seq(1f, 0f), Seq(-1f, 0f)))
      .select("cell").as[Int].head()
    assert(a == 0)
  }

  test("k-means|| seeding beats degenerate first-k seeds and is deterministic") {
    // ids ordered so the first k=3 vectors all sit in ONE blob — the
    // worst case for first-k seeding
    val rnd = new scala.util.Random(13)
    val centers = Seq((0f, 0f), (10f, 10f), (-10f, 5f))
    val pts = (0 until 90).map { i =>
      val (cx, cy) = centers(i / 30) // sorted by blob, not round-robin
      (i.toLong, Array(cx + rnd.nextFloat() * 0.5f, cy + rnd.nextFloat() * 0.5f))
    }.toDF("id", "vec").cache()

    val seeds = KMeans.seedParallel(pts, "id", "vec", k = 3, seed = 5L)
    assert(seeds.length == 3)
    // one seed lands in each blob: seeded single-iteration fit already
    // separates what first-k seeding cannot
    val (fromSeeds, _) = KMeans.fit(pts, "id", "vec", k = 3, iters = 1,
      init = seeds)
    val (fromFirstK, _) = KMeans.fit(pts, "id", "vec", k = 3, iters = 1)
    val w1 = KMeans.wcss(pts, "vec", fromSeeds)
    val w2 = KMeans.wcss(pts, "vec", fromFirstK)
    assert(w1 < w2 / 10, s"wcss seeded=$w1 firstK=$w2")

    // derandomized draws: same seed → identical centroids
    assert(seeds == KMeans.seedParallel(pts, "id", "vec", k = 3, seed = 5L))
  }

  test("seedParallel degrades gracefully below k distinct points") {
    val tiny = Seq((1L, Array(1f, 1f)), (2L, Array(1f, 1f)))
      .toDF("id", "vec")
    val seeds = KMeans.seedParallel(tiny, "id", "vec", k = 5)
    assert(seeds == Seq(Seq(1f, 1f))) // one distinct point → one seed
  }

  test("trained centroids feed semanticDedupPairs' cell decomposition") {
    val planted = blobs.unionByName(
      blobs.filter($"id" === 4).withColumn("id", lit(900L)))
    val (cents, _) = KMeans.fit(planted, "id", "vec", k = 3, iters = 3)
    // assignment with trained centroids groups the planted copy with
    // its original — same vector, same cell
    val asgn = KMeans.assign(planted, "id", "vec", cents)
    val cells = asgn.filter($"id" === 4 || $"id" === 900L)
      .select("cell").as[Int].collect().toSet
    assert(cells.size == 1)
  }

  test("mini-batch fit converges like full-batch on separated blobs") {
    val pts = blobs.cache()
    val seeds = KMeans.seedParallel(pts, "id", "vec", k = 3, seed = 5L)
    val (mb, asgn) = KMeans.fitMiniBatch(pts, "id", "vec", k = 3,
      iters = 8, fraction = 0.4, init = seeds)
    val (fb, _) = KMeans.fit(pts, "id", "vec", k = 3, iters = 5, init = seeds)
    val wMb = KMeans.wcss(pts, "vec", mb)
    val wFb = KMeans.wcss(pts, "vec", fb)
    // mini-batch lands within 2x of the full-batch objective on clean data
    assert(wMb < wFb * 2 + 1.0, s"miniBatch=$wMb fullBatch=$wFb")
    // and still produces pure clusters
    val cellsByBlob = asgn.withColumn("blob", col("id") % 3)
      .select("blob", "cell").distinct()
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(cellsByBlob.values.forall(_.size == 1), cellsByBlob.toMap.toString)
  }

  test("mini-batch fit is deterministic across reruns and repartitioning") {
    val pts = blobs
    val a = KMeans.fitMiniBatch(pts, "id", "vec", 3, 4, 0.5)._1
    val b = KMeans.fitMiniBatch(pts.repartition(7), "id", "vec", 3, 4, 0.5)._1
    assert(a == b)
  }
}
