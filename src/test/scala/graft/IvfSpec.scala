package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF ANN: plan shape (no corpus shuffle for assignment) and recall
  * against the exact brute-force baseline.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    // 8 well-separated clusters on coordinate axes + noise dims
    val rows = (0 until 256).map { i =>
      val cluster = i % 8
      val v = Array.tabulate(16)(d =>
        (if (d == cluster) 10f else 0f) + (i * 31 + d * 7) % 5 * 0.1f)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("native probe_buckets == the composed Column form, incl. ties, negatives, short/null vectors") {
    import graft.functions.VectorFunctions
    graft.plans.GraftExtensions.register(spark)
    // adversarial rows: duplicate |components| (tie-break by dim),
    // zeros, negatives, a short vector, an all-null-ish shape, and NaN
    // components (Spark sorts NaN LAST among doubles and NaN > 0 is
    // TRUE under Spark's comparison semantics — both must match)
    val rows = (0 until 300).map { i =>
      val v = Array.tabulate(16) { d =>
        val u = ((i * 37 + d * 29 + 5) % 19) - 9
        if (i % 13 == 0 && d % 5 == 2) Float.NaN
        else if (i % 7 == 0) math.abs(u).toFloat * 0.1f // many |ties|
        else u * 0.1f
      }
      (i.toLong, (if (i % 11 == 0) v.take(9) else v).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    // nProbe > bits+1: the kernel clamps at the bits+1 distinct probes
    // (the Column form ANSI-throws there — graceful beats crash)
    val clamped = df.limit(4).select(
      VectorFunctions.probeBuckets(col("embedding"), 4, 99).as("p")).collect()
    clamped.foreach { r =>
      val p = r.getSeq[String](0)
      assert(p.length == 5 && p.distinct.length == 5, s"clamp broke: $p")
    }
    for (nProbe <- Seq(1, 2, 4, 8); bits <- Seq(8, 16)) {
      val both = df.select(
          VectorFunctions.probeBuckets(col("embedding"), bits, nProbe)
            .as("native"),
          VectorFunctions.probeBucketsColumnForm(col("embedding"), bits,
            nProbe).as("column"))
        .collect()
      both.zipWithIndex.foreach { case (r, ri) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"row $ri bits=$bits nProbe=$nProbe: " +
            s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("ivfTopK: full-probe IVF equals brute force; few-probe is a subset") {
    val queries = corpus.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .select("q_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    // probing every cell must recover the exact answer
    val full = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      nCells = 8, nProbe = 8, k = 3)
      .select("q_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(full == exact)
    // 2-probe: each query still gets k results (clusters are separable)
    // and every result is drawn from the exact candidate relation
    val approx = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      nCells = 8, nProbe = 2, k = 3)
    assert(approx.groupBy("q_id").count().collect().forall(_.getLong(1) == 3))
  }

  test("ivfTopK is deterministic across runs") {
    val queries = corpus.filter($"vec_id" < 16)
    def run() = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      nCells = 8, nProbe = 3, k = 3).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(run() == run())
  }

  test("ivf cell assignment requires no corpus-side exchange") {
    val queries = corpus.filter($"vec_id" < 2)
    val df = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      nCells = 8, nProbe = 2, k = 3)
    df.collect()
    // only the two query-side windows shuffle (probe top-nProbe + final
    // top-k); the corpus→cells assignment must stay a narrow projection.
    // Count within the AQE final-plan section only (the printed Initial
    // Plan repeats every node).
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(n <= 2, s"expected at most 2 shuffles, got $n:\n$finalSection")
  }

  test("semanticDedupPairs finds planted copies inside their cell, skips cross-cell") {
    val planted = corpus.unionByName(
      corpus.filter($"vec_id" % 7 === 0)
        .withColumn("vec_id", $"vec_id" + 1000))
    val pairs = Similarity.semanticDedupPairs(planted, "vec_id", "embedding",
        nCells = 4, minCosine = 0.99)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("cosine"))).toSeq
    // every planted copy is an identical vector: same argmax cell,
    // cosine exactly 1.0 — must all surface
    val plantedIds = corpus.filter($"vec_id" % 7 === 0)
      .select("vec_id").as[Long].collect()
    plantedIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 1000 && p._3 == 1.0),
        s"missing planted pair for $id")
    }
    // and nothing below the threshold leaks through
    assert(pairs.forall(_._3 >= 0.99))
  }
}
