package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Lexical
import graft.streaming.StreamingLexical

/** Streaming BM25 serving must emit the batch derivation bit for bit
  * (scores, ranks, and the candidate set), window-stamped, through the
  * chained windowed-fold → bounded-top-k plan.
  */
class StreamingLexicalSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1_600_000_000_000_000_000L

  test("stream ≡ batch bm25TopK per window; empty-overlap query silent") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry durian"),
      (3L, "elderberry fig"),
      (4L, "apple durian banana fig")
    ).toDF("doc_id", "text")
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()

    val qs = Seq(
      (100L, "apple cherry", t0 + 1_000_000L),
      (101L, "fig", t0 + 2_000_000L),
      (102L, "nomatch tokens", t0 + 3_000_000L), // shares nothing
      (999L, "zz flush", t0 + 8L * 3600L * 1_000_000_000L)
    ).toDF("q_id", "qtext", "ts")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lexstream").toString
    qs.repartition(2).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)

    val out = StreamingLexical.bm25Stream(stream, store,
      "q_id", "qtext", "ts", k = 3)
    val sink = "lexstream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink)
      .select("window_ns", "q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sink)

    val batch = Lexical.bm25TopK(docs, "text", "doc_id",
        Seq((100L, "apple cherry"), (101L, "fig"), (102L, "nomatch tokens"))
          .toDF("q_id", "qtext"),
        "qtext", "q_id", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))

    val windowNs = t0 - t0 % 21_600_000_000_000L
    assert(got.nonEmpty)
    assert(got.forall(_._1 == windowNs))
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      batch.map(r => (r._1, r._2, r._3, r._4)))
    assert(!got.exists(_._2 == 102L)) // no shared terms ⇒ nothing emitted
    store.unpersist()
  }
}
