package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 100L, "l3"))
    .toDF("k", "ts", "lid")
  private val right = Seq((1L, 90L, "r1"), (1L, 150L, "r2"), (2L, 300L, "r3"))
    .toDF("k", "ts", "rid")

  test("backward join picks most recent right ≤ left time") {
    val out = AsOf.backward(left, right, "k", "ts", "ts",
      Seq("lid"), Seq("rid"), tolerance = 1000L)
      .orderBy("k", "ts").collect()
    assert(out.length == 2) // l3 has no earlier right row
    assert(out(0).getAs[String]("lid") == "l1" && out(0).getAs[String]("rid") == "r1")
    assert(out(0).getAs[Long]("asof_lag_ns") == 10L)
    assert(out(1).getAs[String]("lid") == "l2" && out(1).getAs[String]("rid") == "r2")
  }

  test("tolerance excludes stale matches strictly") {
    val out = AsOf.backward(left, right, "k", "ts", "ts",
      Seq("lid"), Seq("rid"), tolerance = 10L).collect()
    assert(out.map(_.getAs[String]("lid")).toSet == Set("l1")) // lag 10 ≤ 10
  }

  test("nearest join picks the closer side, ties to the earlier right") {
    val out = AsOf.nearest(left, right, "k", "ts", "ts",
      Seq("lid"), Seq("rid"), tolerance = 1000L)
      .orderBy("k", "ts").collect()
    assert(out.length == 3)
    // l1@100: prev r1@90 (d=10) vs next r2@150 (d=50) → r1
    assert(out(0).getAs[String]("rid") == "r1" &&
           out(0).getAs[Long]("asof_abs_diff_ns") == 10L)
    // l2@200: prev r2@150 (d=50) → r2
    assert(out(1).getAs[String]("rid") == "r2")
    // l3@100 (k=2): only r3@300 ahead (d=200) → r3 — backward would miss it
    assert(out(2).getAs[String]("rid") == "r3" &&
           out(2).getAs[Long]("asof_abs_diff_ns") == 200L)
  }

  test("nearest tolerance is inclusive and strict beyond") {
    val out = AsOf.nearest(left, right, "k", "ts", "ts",
      Seq("lid"), Seq("rid"), tolerance = 50L).collect()
    assert(out.map(_.getAs[String]("lid")).toSet == Set("l1", "l2"))
  }

  test("same-instant right row is visible to the left row") {
    val l = Seq((1L, 100L, "l")).toDF("k", "ts", "lid")
    val r = Seq((1L, 100L, "r")).toDF("k", "ts", "rid")
    val out = AsOf.backward(l, r, "k", "ts", "ts", Seq("lid"), Seq("rid"), 100L)
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("asof_lag_ns") == 0L)
  }
}
