package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.Point

class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionization closes sessions across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Point]
    val q = SessionizeStream.sessionize(input.toDS(), tolNs = 10L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    input.addData(Point("a", 0L), Point("a", 5L), Point("b", 100L))
    q.processAllAvailable() // batch 1: sessions still open → nothing emitted
    assert(spark.table("sessions").count() == 0)

    input.addData(Point("a", 50L)) // gap > tol → closes [0,5]
    q.processAllAvailable()
    val closed = spark.table("sessions")
      .as[SessionizeStream.ClosedSession].collect()
    assert(closed.length == 1)
    assert(closed(0).key == "a" && closed(0).seg_start == 0L &&
           closed(0).seg_end == 5L && closed(0).n_members == 2L)

    input.addData(Point("a", 55L), Point("a", 200L)) // extends then closes [50,55]
    q.processAllAvailable()
    val closed2 = spark.table("sessions")
      .as[SessionizeStream.ClosedSession].collect()
    assert(closed2.length == 2)
    q.stop()
  }

  test("batch flush emits open sessions and matches window sessionization") {
    val pts = Seq(Point("a", 0L), Point("a", 5L), Point("a", 50L),
      Point("b", 7L)).toDS()
    val out = SessionizeStream.sessionizeBatch(spark, pts, 10L)
      .collect().sortBy(s => (s.key, s.seg_start))
    assert(out.length == 3)
    assert(out(0).seg_start == 0L && out(0).seg_end == 5L && out(0).n_members == 2)
    assert(out(1).seg_start == 50L && out(2).key == "b")
  }
}
