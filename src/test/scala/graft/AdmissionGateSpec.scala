package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Lexical
import graft.streaming.{AdmissionGate, StreamingLexical}

/** Per-trigger admission bounding: the gate admits at most N query
  * rows per trigger (oldest event-time first), defers the overflow in
  * query-sized state, drains on later triggers, and the gated serving
  * stream still emits the batch results bit for bit — burst arrival
  * rate and per-trigger serving state decouple.
  */
class AdmissionGateSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1_600_000_000_000_000_000L

  test("gate: bursts spread across triggers, <= N per trigger, " +
       "oldest-first, nothing lost") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val gated = AdmissionGate.perTrigger(
      ms.toDF().toDF("q_id", "qtext", "ts"),
      maxPerTrigger = 100, "q_id", "qtext", "ts")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += df.select("q_id").as[Long].collect().toSeq
        ()
      }.start()
    // one burst of 1000 queries lands in a single trigger
    ms.addData((0L until 1000L).map(i => (i, s"q$i", t0 + i * 1000L)))
    q.processAllAvailable()
    // heartbeats tick the engine; the gate consumes them un-admitted
    for (_ <- 1 to 12) {
      ms.addData(Seq((Long.MinValue, "hb", t0 + 2_000_000L)))
      q.processAllAvailable()
    }
    q.stop()
    val nonEmpty = batches.filter(_.nonEmpty).toSeq
    assert(nonEmpty.forall(_.size <= 100),
      s"a trigger admitted ${nonEmpty.map(_.size).max} > 100 rows")
    assert(nonEmpty.size >= 10, s"burst not spread: ${nonEmpty.size}")
    assert(nonEmpty.flatten.sorted == (0L until 1000L),
      "deferred rows lost or duplicated")
    // oldest-first admission: emission order is globally ts-ascending
    assert(nonEmpty.flatten == (0L until 1000L),
      "admission was not oldest-first")
  }

  test("gated MaxScore stream: results are the ungated batch rows, " +
       "spread across triggers") {
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry durian"),
      (3L, "elderberry fig"),
      (4L, "apple durian banana fig")
    ).toDF("doc_id", "text")
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val trunc = Lexical.truncateByImpact(store, 2).persist()
    trunc.count()
    val queries = Seq(
      (100L, "apple cherry"), (101L, "fig"), (102L, "banana"),
      (103L, "cherry durian"), (104L, "elderberry"), (105L, "apple fig"))
    val ms = MemoryStream[(Long, String, Long)]
    val out = StreamingLexical.bm25StreamMaxScore(
      ms.toDF().toDF("q_id", "qtext", "ts"), store, trunc,
      "q_id", "qtext", "ts", k = 3, maxQueriesPerTrigger = Some(2))
    val sink = "gatestream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    ms.addData(queries.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, t0 + i * 1_000_000L)
    } :+ ((999L, "zz flush", t0 + 8L * 3600L * 1_000_000_000L)))
    q.processAllAvailable()
    for (_ <- 1 to 6) {
      ms.addData(Seq((Long.MinValue, "hb", t0)))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table(sink).filter(col("q_id") < 999L)
      .select("q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    spark.catalog.dropTempView(sink)
    val batch = Lexical.bm25TopKFromContribStore(store,
        queries.toDF("q_id", "qtext"), "qtext", "q_id", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == batch)
    store.unpersist(); trunc.unpersist()
    ()
  }
}
