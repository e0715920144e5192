package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage- and trigger-level profile of the streaming IVFADC serving
  * plan at the candidate-heavy ADCSTREAM geometry — the "where do the
  * seconds go" answer the bench row's one wall number cannot give:
  * per-stage wall/CPU (join+partial-agg vs state-store stages) plus
  * the per-trigger durationMs breakdown (queryPlanning vs addBatch).
  *
  *   sbt "runMain graft.tools.AdcStreamDebug [corpus] [queries] [cells] [nprobe] [filesPerTrigger]"
  */
object AdcStreamDebug {
  def main(args: Array[String]): Unit = {
    val nc = if (args.length > 0) args(0).toLong else 1000000L
    val nq = if (args.length > 1) args(1).toLong else 1000L
    val cells = if (args.length > 2) args(2).toInt else 64
    val nprobe = if (args.length > 3) args(3).toInt else 8
    val filesPerTrigger = if (args.length > 4) args(4).toInt else 8
    val spark = graft.core.GraftSession.local()
    // arg 6 "rocksdb": swap the state store provider — the stage
    // profile attributes the candidate-heavy residual to per-trigger
    // HDFS-backed state commits (CPU ≪ wall), which RocksDB's
    // changelog-free local commits should cut
    if (args.length > 5 && args(5) == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    import graft.operators.{KMeans, ProductQuantizer}
    val root = java.nio.file.Files
      .createTempDirectory("adcstream-debug").toString
    val (corpus, _) = (ScaleBench.embCorpus(spark, nc), ())._1
    val rawDir = s"$root/raw"
    corpus.write.mode("overwrite").parquet(rawDir)
    val e = spark.read.parquet(rawDir)
    val trainFrac = math.min(1.0, 2e5 / nc)
    val trainSet = ProductQuantizer.sampleByHash(e, "doc_id", trainFrac)
    val (coarse, _) = KMeans.fit(trainSet, "doc_id", "embedding",
      k = cells, iters = 2)
    val resid = KMeans.assign(trainSet, "doc_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select(col("doc_id"), col("r"))
    val pq = ProductQuantizer.fit(resid, "doc_id", "r",
      m = 8, k = 256, iters = 2)
    val store = ProductQuantizer.encodeIvf(
      e, "doc_id", "embedding", coarse, pq)
      .repartition(col("cell")).sortWithinPartitions("cell")
      .persist()
    store.count()
    val t0 = 1_600_000_000_000_000_000L
    val qs = ScaleBench.embQueries(spark, nq)
      .withColumn("ts", lit(t0) + (col("doc_id") - 2_000_000_000L)
        * lit(1_000_000L))
    val flush = ScaleBench.embQueries(spark, 1)
      .select(lit(999999999L).as("doc_id"), col("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
    val dir = s"$root/stream"
    qs.unionByName(flush).repartitionByRange(64, col("ts"))
      .write.mode("overwrite").parquet(dir)

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lsnr = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        rows.add(f"  stage=${si.stageId}%4d wall=$wall%6d ms " +
          f"cpu=${tm.executorCpuTime / 1000000L}%7d ms tasks=${si.numTasks}%3d " +
          f"in=${tm.inputMetrics.recordsRead}%9d " +
          f"shRdRec=${tm.shuffleReadMetrics.recordsRead}%8d " +
          f"shRd=${tm.shuffleReadMetrics.totalBytesRead / 1048576.0}%7.1f MB " +
          f"shWr=${tm.shuffleWriteMetrics.bytesWritten / 1048576.0}%7.1f MB")
      }
    }
    spark.sparkContext.addSparkListener(lsnr)
    // arg 7: shuffle partitions for the STREAM only (state partition
    // count fixes at checkpoint creation from this) — the "fewer state
    // commits per trigger" operational lever, quantified. Applied
    // AFTER the store build: the cached store keeps its 32-way cell
    // layout (the heavy broadcast-join stage parallelizes on it), only
    // the stream's exchanges/stateful operators shrink.
    if (args.length > 6)
      spark.conf.set("spark.sql.shuffle.partitions", args(6))
    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString).parquet(dir)
    val out = graft.streaming.StreamingSimilarity.ivfAdcStream(
      stream, store, "doc_id", "embedding", "ts", coarse, pq,
      nprobe = nprobe, k = 10)
    val s0 = System.nanoTime()
    val q = out.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - s0) / 1e9
    Thread.sleep(1000)
    println(f"== stream wall $wall%.2f s over ${q.recentProgress.length} batches")
    println("-- per-trigger durationMs --")
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"  batch ${p.batchId}: " +
        Seq("queryPlanning", "getBatch", "addBatch", "walCommit",
          "commitOffsets", "triggerExecution")
          .map(k => s"$k=${Option(d.get(k)).getOrElse("-")}").mkString(" "))
    }
    println("-- stages in completion order --")
    import scala.jdk.CollectionConverters._
    rows.asScala.foreach(println)
    spark.stop()
  }
}
