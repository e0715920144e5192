package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Lexical
import graft.streaming.StreamingLexical

/** Streaming SDM rerank serving must emit the batch rerank derivation
  * bit for bit — unigram top-n selection, positional pair probes on
  * survivors only, subset-df semantics — window-stamped, through the
  * three-deep chain of windowed stateful aggregations.
  */
class SdmStreamSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1_600_000_000_000_000_000L

  // the SdmSpec corpus: every feature decides something
  private val docs = Seq(
    (0L, "a b c a b"),
    (1L, "b a x y z a"),
    (2L, "a q q q q q q q b"),
    (3L, "c c"),
    (4L, "z z z")
  ).toDF("doc_id", "text")

  test("stream ≡ batch sdm rerank per window, incl duplicate terms, " +
       "m=1, absent term, whitespace") {
    val post = Lexical.postingsPositional(docs, "text", "doc_id")
      .persist()
    post.count()
    val queries = Seq(
      (100L, "a b"), (101L, "b a"), (102L, "a a"), (103L, "c"),
      (104L, "nope"), (105L, "   "), (106L, "a q b"))
    val qs = queries.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, t0 + i * 1_000_000L)
    } :+ ((999L, "zz flush", t0 + 8L * 3600L * 1_000_000_000L))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sdmstream").toFile
    tmp.deleteOnExit()
    qs.toDF("q_id", "qtext", "ts").repartition(2)
      .write.mode("overwrite").parquet(tmp.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp.toString).schema)
      .parquet(tmp.toString)
    val out = StreamingLexical.sdmRerankStream(stream, post,
      "q_id", "qtext", "ts", k = 2, n = 3)
    val sink = "sdmstream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).filter(col("q_id") < 999L)
      .select("window_ns", "q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sink)
    val batch = Lexical.sdmTopKFromPostings(post,
        queries.toDF("q_id", "qtext"), "qtext", "q_id", k = 2,
        rerank = Some(3))
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    val windowNs = t0 - t0 % 21_600_000_000_000L
    assert(got.nonEmpty)
    assert(got.forall(_._1 == windowNs))
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      batch.map(r => (r._1, r._2, r._3, r._4)))
    assert(!got.exists(r => r._2 == 104L || r._2 == 105L))
    post.unpersist()
    ()
  }
}
