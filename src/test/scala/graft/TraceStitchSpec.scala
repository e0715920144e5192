package graft

import graft.operators.TraceStitch

class TraceStitchSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Long, Long, Seq[Double])]) =
    rows.map { case (s, p, t, xs) => (s, p, t, xs.toArray) }
      .toDF("seed_id", "sampling_period", "starttime", "samples")

  test("adjacent segments merge onto one grid") {
    val out = TraceStitch.mergeTraces(spark, df(Seq(
      ("N.S..Z", 10L, 0L, Seq(1.0, 2.0, 3.0)),
      ("N.S..Z", 10L, 30L, Seq(4.0, 5.0))))).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("starttime") == 0L && r.getAs[Long]("endtime") == 50L)
    assert(r.getAs[scala.collection.Seq[Double]]("samples").toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("overlapping segments: later trace wins the overlap") {
    val out = TraceStitch.mergeTraces(spark, df(Seq(
      ("N.S..Z", 10L, 0L, Seq(1.0, 1.0, 1.0)),
      ("N.S..Z", 10L, 10L, Seq(9.0, 9.0, 9.0))))).collect()
    assert(out.length == 1)
    assert(out(0).getAs[scala.collection.Seq[Double]]("samples").toSeq == Seq(1.0, 9.0, 9.0, 9.0))
  }

  test("a gap larger than one period splits merge groups") {
    val out = TraceStitch.mergeTraces(spark, df(Seq(
      ("N.S..Z", 10L, 0L, Seq(1.0, 2.0)),
      ("N.S..Z", 10L, 50L, Seq(3.0)))))
      .orderBy("starttime").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("endtime") == 20L)
    assert(out(1).getAs[Long]("starttime") == 50L)
  }

  test("different sampling periods never merge (sort includes rate)") {
    val out = TraceStitch.mergeTraces(spark, df(Seq(
      ("N.S..Z", 10L, 0L, Seq(1.0, 2.0)),
      ("N.S..Z", 20L, 20L, Seq(3.0)))))
    assert(out.count() == 2)
  }

  test("different seeds never merge") {
    val out = TraceStitch.mergeTraces(spark, df(Seq(
      ("N.S..Z", 10L, 0L, Seq(1.0)),
      ("N.S..E", 10L, 10L, Seq(2.0)))))
    assert(out.count() == 2)
  }
}
