package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Lexical
import graft.streaming.StreamingLexical

/** MaxScore-pruned streaming BM25 serving: bit-identical to the batch
  * full traversal (and hence to the unpruned bm25Stream) across
  * truncation choices including the θ-free degenerate, window-stamped,
  * while the per-trigger stateful-operator state stays a fraction of
  * the full candidate volume (Σ df) the unpruned stream holds.
  */
class StreamingMaxScoreSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1_600_000_000_000_000_000L

  /** The MaxScoreSpec geometry: a ~90%-df stopword, a mid tier, rare
    * high-idf terms.
    */
  private def skewed(n: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    val mids = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (0 until n).map { i =>
      val sb = Vector.newBuilder[String]
      if (rnd.nextDouble() < 0.9) sb += "the"
      sb += mids(rnd.nextInt(mids.size))
      if (rnd.nextDouble() < 0.3) sb += mids(rnd.nextInt(mids.size))
      if (rnd.nextDouble() < 0.04) sb += s"rare${rnd.nextInt(8)}"
      (i.toLong, rnd.shuffle(sb.result()).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private val queryRows = Seq(
    (1L, "the alpha rare3"),   // common + mid + rare
    (2L, "the beta"),          // common + mid
    (3L, "rare1 rare5"),       // rare only — typically < k docs ⇒ no θ
    (4L, "the"),               // degenerate all-common query
    (5L, "gamma delta eps"),   // mids
    (6L, "notinthecorpus"),    // no store terms → no rows
    (7L, "   ")                // whitespace → no terms
  )

  private def streamOf(rows: Seq[(Long, String, Long)]) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-msstream").toFile
    tmp.deleteOnExit()
    rows.toDF("q_id", "qtext", "ts").repartition(2)
      .write.mode("overwrite").parquet(tmp.toString)
    spark.readStream
      .schema(spark.read.parquet(tmp.toString).schema)
      .parquet(tmp.toString)
  }

  private def runStream(out: org.apache.spark.sql.DataFrame)
      : (Seq[(Long, Long, Long, Double, Int)], Long) = {
    val sink = "msstream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val maxState = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal)).foldLeft(0L)(_ max _)
    val got = spark.table(sink)
      .select("window_ns", "q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._2, r._5))
    spark.catalog.dropTempView(sink)
    (got, maxState)
  }

  test("stream ≡ batch full traversal across truncations (incl the " +
       "θ-free m=1 degenerate), window-stamped") {
    val docs = skewed(400)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val k = 3
    val batch = Lexical.bm25TopKFromContribStore(store,
        queryRows.toDF("q_id", "qtext"), "qtext", "q_id", k)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    val windowNs = t0 - t0 % 21_600_000_000_000L
    for (m <- Seq(10, 1)) {
      val trunc = Lexical.truncateByImpact(store, m).persist()
      trunc.count()
      val qs = queryRows.zipWithIndex.map { case ((id, tx), i) =>
        (id, tx, t0 + i * 1_000_000L)
      } :+ ((999L, "zz flush", t0 + 8L * 3600L * 1_000_000_000L))
      val out = StreamingLexical.bm25StreamMaxScore(streamOf(qs),
        store, trunc, "q_id", "qtext", "ts", k)
      val (got0, _) = runStream(out)
      val got = got0.filter(_._2 != 999L)
      assert(got.nonEmpty)
      assert(got.forall(_._1 == windowNs))
      assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
        batch.map(r => (r._1, r._2, r._3, r._4)), s"mismatch at m=$m")
      trunc.unpersist()
    }
    store.unpersist()
    ()
  }

  test("per-trigger state is a fraction of the full candidate volume " +
       "on the stopword geometry") {
    val docs = skewed(2000)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val trunc = Lexical.truncateByImpact(store, 10).persist()
    trunc.count()
    val hot = queryRows.filter(_._1 <= 2) // the stopword-laden queries
    val qs = hot.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, t0 + i * 1_000_000L)
    } :+ ((999L, "zz flush", t0 + 8L * 3600L * 1_000_000_000L))
    val fullVolume = store.join(
      broadcast(hot.toDF("q_id", "qtext")
        .select(explode(split(col("qtext"), "\\s+")).as("term"))
        .distinct()), Seq("term")).count()
    val out = StreamingLexical.bm25StreamMaxScore(streamOf(qs),
      store, trunc, "q_id", "qtext", "ts", k = 3)
    val (got, maxState) = runStream(out)
    assert(got.exists(_._2 <= 2L))
    // the unpruned stream's first fold holds ~fullVolume state rows;
    // every stateful operator here must stay well under it
    assert(maxState < fullVolume / 2,
      s"state $maxState not a fraction of full candidate volume $fullVolume")
    store.unpersist(); trunc.unpersist()
    ()
  }
}
