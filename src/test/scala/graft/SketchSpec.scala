package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Error-bound contract for the sketch aggregates (q63): approximate
  * answers must sit within their configured tolerance of the exact
  * ones — the property that licenses swapping them in at 100 TB.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("HLL distinct counts within 3×rsd of exact; quantiles within rank tolerance") {
    val sketch = Catalog.byName("q63_sketch_aggs").run(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n_cust_hll"), r.getAs[Double]("p50"), r.getAs[Double]("p95")))
      .toMap
    val exact = graft.core.Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"),
           expr("percentile(o_totalprice, array(0.5, 0.95))").as("q"))
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Double]]("q")))
      .toMap
    assert(sketch.keySet == exact.keySet)
    exact.foreach { case (k, (n, q)) =>
      val (hll, p50, p95) = sketch(k)
      assert(math.abs(hll - n).toDouble / n <= 0.06, s"$k: hll=$hll exact=$n")
      // approx_percentile(accuracy=1000) guarantees rank error <= n/1000;
      // on skew-free uniform prices that lands within ~2% of the value
      assert(math.abs(p50 - q(0)) / q(0) <= 0.05, s"$k p50: $p50 vs ${q(0)}")
      assert(math.abs(p95 - q(1)) / q(1) <= 0.05, s"$k p95: $p95 vs ${q(1)}")
    }
  }
}
