package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Error-bound contract for the sketch aggregates (q63): approximate
  * answers must sit within their configured tolerance of the exact
  * ones — the property that licenses swapping them in at 100 TB. q63
  * now emits the exact answers plus in-bounds verdict columns (the
  * DuckDB-hashable surface); this spec asserts the verdicts hold and
  * cross-checks the exact columns against an independent computation.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sketch verdicts all in-bounds; exact columns match independent recompute") {
    val rows = Catalog.byName("q63_sketch_aggs").run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[String]("o_orderstatus")
      assert(r.getAs[Long]("hll_ok") == 1L, s"$k: HLL out of 3-sigma bounds")
      assert(r.getAs[Long]("p50_ok") == 1L, s"$k: p50 sketch outside rank tolerance")
      assert(r.getAs[Long]("p95_ok") == 1L, s"$k: p95 sketch outside rank tolerance")
    }
    val got = rows.map(r => r.getAs[String]("o_orderstatus") ->
      (r.getAs[Long]("n_cust_exact"), r.getAs[Double]("p50_exact"),
        r.getAs[Double]("p95_exact"))).toMap
    val exact = graft.core.Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"),
           expr("percentile(o_totalprice, array(0.5, 0.95))").as("q"))
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Double]]("q")))
      .toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (n, q)) =>
      val (nGot, p50, p95) = got(k)
      assert(nGot == n, s"$k: exact distinct $nGot vs $n")
      // rank-based discrete percentile vs interpolated: same element
      // neighborhood, so within a small relative distance
      assert(math.abs(p50 - q(0)) / q(0) <= 0.05, s"$k p50: $p50 vs ${q(0)}")
      assert(math.abs(p95 - q(1)) / q(1) <= 0.05, s"$k p95: $p95 vs ${q(1)}")
    }
  }
}
