package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Lexical, Similarity}
import graft.streaming.{StreamingHybrid, StreamingSimilarity}

/** Streaming hybrid retrieval (one query stream → both tiers → RRF
  * per window) must emit the batch fusion of the batch tiers bit for
  * bit — scores, ranks, and the fused candidate set — through the
  * four-deep chain of windowed stateful aggregations.
  */
class StreamingHybridSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1_600_000_000_000_000_000L

  /** Round 17: the four-deep window chain groups by the WINDOW COLUMN
    * directly instead of re-windowing (`window(col("w"), dur)` inlined
    * the full event-time derivation once per chaining level —
    * exponential growth that overflowed JVM codegen's 64 KB method
    * limit and dropped the fused stage to interpreted execution).
    * This appender pins the fix: any CodeGenerator compile failure
    * during the hybrid run fails the test.
    */
  private val codegenErrors =
    new java.util.concurrent.atomic.AtomicInteger(0)

  private class CodegenErrorTrap extends
      org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-codegen-trap", null,
        org.apache.logging.log4j.core.layout.PatternLayout
          .createDefaultLayout(),
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
      val m = e.getMessage.getFormattedMessage
      if (e.getLoggerName.contains("CodeGenerator") &&
          m.contains("Failed to compile")) {
        codegenErrors.incrementAndGet()
      }
      ()
    }
  }

  test("hybrid stream ≡ batch rrfFuse(bm25TopK, ivfTopKWith) per window") {
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val trap = new CodegenErrorTrap
    trap.start()
    ctx.getConfiguration.getRootLogger.addAppender(trap,
      org.apache.logging.log4j.Level.ERROR, null)
    ctx.updateLoggers()
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry durian"),
      (3L, "elderberry fig apple"),
      (4L, "apple durian banana fig"),
      (5L, "fig banana")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.1f, 0.0f, 0.2f)),
      (1L, Seq(0.9f, 0.2f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.3f, 0.1f)),
      (3L, Seq(0.1f, 0.9f, 0.2f, 0.4f)),
      (4L, Seq(0.2f, 0.1f, 1.0f, 0.3f)),
      (5L, Seq(0.3f, 0.0f, 0.9f, 0.1f))
    ).toDF("doc_id", "vec")

    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val index = StreamingSimilarity.ivfIndex(vecs, "doc_id", "vec", nCells = 2)
    index.cells.persist().count()

    // queries carry BOTH modalities; q102 matches no lexical term but
    // still fuses (dense-only contributions), the flush closes windows
    val qtexts = Seq((100L, "apple cherry"), (101L, "fig banana"),
      (102L, "nomatch tokens"))
    val qvecs = Map(
      100L -> Seq(1.0f, 0.0f, 0.1f, 0.1f),
      101L -> Seq(0.1f, 0.2f, 0.9f, 0.2f),
      102L -> Seq(0.0f, 1.0f, 0.1f, 0.0f))
    val qs = qtexts.zipWithIndex.map { case ((id, txt), i) =>
      (id, txt, qvecs(id), t0 + (i + 1) * 1_000_000L)
    }.toDF("q_id", "qtext", "q_vec", "ts")
    val flush = Seq((999_999_999L, "zz flush", Seq(0.5f, 0.5f, 0.5f, 0.5f),
      t0 + 8L * 3600L * 1_000_000_000L)).toDF("q_id", "qtext", "q_vec", "ts")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-hybridstream").toString
    qs.unionByName(flush).repartition(2).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)

    val out = StreamingHybrid.rrfStream(stream, store, index,
      "q_id", "qtext", "q_vec", "ts", nProbe = 2, kTier = 3, k = 3)
    val sink = "hybridstream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val windowNs = t0 - t0 % 21_600_000_000_000L
    val got = spark.table(sink)
      .filter(col("q_id") < 999_999_999L)
      .select("window_ns", "q_id", "doc_id", "rrf", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sink)

    val batchQs = qtexts.map { case (id, txt) => (id, txt, qvecs(id)) }
      .toDF("q_id", "qtext", "vec")
    val lex = Lexical.bm25TopK(docs, "text", "doc_id",
        batchQs, "qtext", "q_id", k = 3)
      .select("q_id", "doc_id", "rank")
    val den = Similarity.ivfTopKWith(vecs,
        batchQs.select(col("q_id").as("doc_id"), col("vec")),
        "doc_id", "vec", index.centroids, nProbe = 2, k = 3)
      .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val batch = Lexical.rrfFuse(Seq(lex, den), k = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))

    assert(got.nonEmpty)
    assert(got.forall(_._1 == windowNs))
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      batch.map(r => (r._1, r._2, r._3, r._4)))
    // q102 shares no lexical term: its fused rows are dense-only
    assert(got.exists(_._2 == 102L))

    // MaxScore-pruned lexical tier (round 17): passing the truncated
    // store switches bm25RankedW → bm25MaxScoreRankedW — rows must be
    // bit-identical to the unpruned hybrid (and hence to batch)
    val trunc = Lexical.truncateByImpact(store, 2).persist()
    trunc.count()
    val outP = StreamingHybrid.rrfStream(
      spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp),
      store, index, "q_id", "qtext", "q_vec", "ts",
      nProbe = 2, kTier = 3, k = 3, truncated = Some(trunc))
    val sinkP = "hybridstreamp_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val qP = outP.writeStream.format("memory").queryName(sinkP)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qP.awaitTermination()
    val gotP = spark.table(sinkP)
      .filter(col("q_id") < 999_999_999L)
      .select("window_ns", "q_id", "doc_id", "rrf", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sinkP)
    assert(gotP == got, "pruned lexical tier diverged from unpruned")
    trunc.unpersist()

    // score-space fusion over the same tiers: combStream ≡ batch
    // combFuse (CombMNZ — normalization extrema per (tier, query,
    // window) must match the batch window form bit for bit)
    val outC = StreamingHybrid.combStream(
      spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp),
      store, index, "q_id", "qtext", "q_vec", "ts",
      nProbe = 2, kTier = 3, k = 3, mnz = true)
    val sinkC = "hybridcomb_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val qc = outC.writeStream.format("memory").queryName(sinkC)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination()
    val gotC = spark.table(sinkC)
      .filter(col("q_id") < 999_999_999L)
      .select("window_ns", "q_id", "doc_id", "comb", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sinkC)

    val lexS = Lexical.bm25TopK(docs, "text", "doc_id",
        batchQs, "qtext", "q_id", k = 3)
      .select("q_id", "doc_id", "score")
    val denS = Similarity.ivfTopKWith(vecs,
        batchQs.select(col("q_id").as("doc_id"), col("vec")),
        "doc_id", "vec", index.centroids, nProbe = 2, k = 3)
      .select(col("q_id"), col("neighbor_id").as("doc_id"),
        col("cosine").as("score"))
    val batchC = Lexical.combFuse(Seq(lexS, denS), k = 3, mnz = true)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))

    assert(gotC.nonEmpty)
    assert(gotC.forall(_._1 == windowNs))
    assert(gotC.map(r => (r._2, r._3, r._4, r._5)) ==
      batchC.map(r => (r._1, r._2, r._3, r._4)))
    store.unpersist()
    index.cells.unpersist()
    ctx.getConfiguration.getRootLogger.removeAppender("graft-codegen-trap")
    ctx.updateLoggers()
    assert(codegenErrors.get() == 0,
      s"${codegenErrors.get()} whole-stage codegen compile failures " +
        "during the hybrid run — the fused stage fell back to " +
        "interpreted execution")
  }
}
