package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.bank.TxTable
import graft.operators.{KMeans, ProductQuantizer}
import graft.streaming.StreamingAnnIndex

/** Incremental IVFADC serving-store maintenance: the streamed store
  * must be row-identical to a from-scratch rebuild under any batching
  * (encode is a pure per-row function; appendOnce makes batches
  * exactly-once), served results identical, and the drift probe must
  * move under a planted distribution shift while staying at parity on
  * an in-distribution stream.
  */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered corpus: 4 well-separated axis clusters + small noise. */
  private def corpus(ids: Range, shift: Float = 0f) = {
    val rows = ids.map { i =>
      val cluster = i % 4
      val v = Array.tabulate(16)(d =>
        (if (d == cluster * 4) 10f else 0f) +
          ((i * 31 + d * 7) % 5) * 0.1f + shift)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def trainedOn(df: org.apache.spark.sql.DataFrame) = {
    val (coarse, _) = KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 2)
    val resid = KMeans.assign(df, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    (coarse, ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 4, iters = 2))
  }

  private def writeBatches(dir: String,
                           dfs: Seq[org.apache.spark.sql.DataFrame]): Unit =
    // distinct subfile per slice with increasing mtimes so the file
    // source sees a stable order (the multi-batch replay contract)
    dfs.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5)
    }

  test("streamed store == from-scratch encodeIvfStore rebuild; serving identical") {
    val base = corpus(0 until 120)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annidx").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")

    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)

    // arrivals in 3 files -> forced multi-batch (maxFilesPerTrigger=1)
    val arrivals = Seq(corpus(200 until 240), corpus(240 until 270),
      corpus(270 until 300))
    val vecsDir = s"$root/vecs"
    writeBatches(vecsDir, arrivals)
    val q = StreamingAnnIndex.run(spark, vecsDir, coarse, model,
      storeTx, driftTx, s"$root/ckpt", maxFilesPerTrigger = 1)
    q.awaitTermination()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq,
        r.getAs[scala.collection.Seq[Float]]("vec").toSeq)
    val streamed = storeTx.read().collect().map(key).toSet
    val full = base.unionByName(arrivals.reduce(_ unionByName _))
    val rebuilt = ProductQuantizer.encodeIvfStore(
      full, "vec_id", "embedding", coarse, model).collect().map(key).toSet
    assert(streamed == rebuilt,
      "maintained store must equal the from-scratch rebuild")

    // and the composed serving pipeline reads the tx store unchanged
    val queries = base.filter($"vec_id" < 4).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    def served(store: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
        coarse, model, queries, k = 3, nprobe = 2, candidates = 8)
        .collect().map(_.toSeq).toSet
    assert(served(storeTx.read()) ==
      served(ProductQuantizer.encodeIvfStore(
        full, "vec_id", "embedding", coarse, model)))
  }

  /** Full-rank corpus for the OPQ leg (the clustered one above is
    * near-rank-deficient at d=16 and trips fitOpq's loud gate — by
    * design; OPQ wants a full-rank second moment).
    */
  private def denseCorpus(ids: Range, shift: Float = 0f) = {
    val rows = ids.map { i =>
      (i.toLong, (0 until 16).map(j =>
        (((i * 31 + j * 17 + 7) % 2000) / 1000.0f) - 1.0f + shift))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("OPQ store maintenance: rotation fused into the streamed encode == bulk rotate-then-encode") {
    val base = denseCorpus(0 until 120)
    val opq = ProductQuantizer.fitOpq(base, "vec_id", "embedding",
      m = 4, k = 4, iters = 2, powerIters = 16)
    val rotated = ProductQuantizer.rotateVectors(
      base, "vec_id", "embedding", opq.rotation)
    val (coarse, _) = graft.operators.KMeans.fit(
      rotated, "vec_id", "remb", k = 4, iters = 2)
    val resid = graft.operators.KMeans
      .assign(rotated, "vec_id", "remb", coarse)
      .withColumn("r", zip_with(col("remb"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 4, iters = 2)
    val root = Files.createTempDirectory("graft-annopq").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base.filter($"vec_id" < 60),
      "vec_id", "embedding", coarse, pq, storeTx, driftTx,
      rotation = Some(opq.rotation))
    val vecsDir = s"$root/vecs"
    writeBatches(vecsDir,
      Seq(denseCorpus(200 until 230), denseCorpus(230 until 260)))
    StreamingAnnIndex.run(spark, vecsDir, coarse, pq, storeTx, driftTx,
      s"$root/ckpt", maxFilesPerTrigger = 1,
      rotation = Some(opq.rotation)).awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq,
        r.getAs[scala.collection.Seq[Float]]("vec").toSeq)
    val full = base.filter($"vec_id" < 60)
      .unionByName(denseCorpus(200 until 260))
    val rebuilt = ProductQuantizer.encodeIvfStore(
        ProductQuantizer.rotateVectors(full, "vec_id", "embedding",
          opq.rotation),
        "vec_id", "remb", coarse, pq)
      .collect().map(key).toSet
    assert(storeTx.read().collect().map(key).toSet == rebuilt,
      "OPQ maintained store must equal bulk rotate-then-encode")
  }

  test("int8 tier maintenance: streamed vec8 store == encodeIvfStoreInt8 rebuild; serving identical; backfill refuses") {
    val base = corpus(0 until 120)
    val (coarse, model) = trainedOn(base)
    val sc = ProductQuantizer.int8Scale(base, "embedding")
    val root = Files.createTempDirectory("graft-anni8").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx, int8Scale = Some(sc))
    val vecsDir = s"$root/vecs"
    writeBatches(vecsDir, Seq(corpus(200 until 240), corpus(240 until 280)))
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt", maxFilesPerTrigger = 1,
      int8Scale = Some(sc)).awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq,
        r.getAs[Array[Byte]]("vec8").toSeq)
    val full = base.unionByName(corpus(200 until 280))
    val rebuilt = ProductQuantizer.encodeIvfStoreInt8(
      full, "vec_id", "embedding", coarse, model, sc)
      .collect().map(key).toSet
    assert(storeTx.read().collect().map(key).toSet == rebuilt,
      "maintained int8 store must equal the bulk rebuild")
    // serving through the int8 rerank reads the maintained store as-is
    val queries = base.filter($"vec_id" < 4).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val served = ProductQuantizer.ivfAdcRerankTopK8(storeTx.read(),
        "vec_id", coarse, model, sc, queries, k = 3, nprobe = 2,
        candidates = 8).collect().map(_.toSeq).toSet
    val servedBulk = ProductQuantizer.ivfAdcRerankTopK8(
      ProductQuantizer.encodeIvfStoreInt8(full, "vec_id", "embedding",
        coarse, model, sc),
      "vec_id", coarse, model, sc, queries, k = 3, nprobe = 2,
      candidates = 8).collect().map(_.toSeq).toSet
    assert(served == servedBulk)
    // the exact-backfill path refuses the tier it cannot honestly serve
    val e = intercept[IllegalArgumentException] {
      StreamingAnnIndex.driftBackfill(storeTx, coarse, model, "baseline")
    }
    assert(e.getMessage.contains("float tier"), e.getMessage)
  }

  test("ivfAdcStream emits exactly the batch ivfAdcTopK result, window-stamped") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingSimilarity
    val base = corpus(0 until 150)
    val (coarse, model) = trainedOn(base)
    val store = ProductQuantizer.encodeIvfStore(
      base, "vec_id", "embedding", coarse, model).persist()
    store.count()
    val t0 = 1_600_000_000_000_000_000L
    val qs = base.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding",
        (lit(t0) + $"vec_id" * lit(1_000_000L)).as("ts"))
    val flushVec = base.orderBy("vec_id")
      .select("embedding").head().getSeq[Float](0)
    val flush = spark.range(1).select(lit(999999999L).as("vec_id"),
      typedlit(flushVec.toSeq).as("embedding"),
      lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
    val tmp = Files.createTempDirectory("graft-adcstream").toString
    qs.unionByName(flush).repartition(4)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val changes = StreamingSimilarity.ivfAdcStream(stream, store,
      "vec_id", "embedding", "ts", coarse, model, nprobe = 2, k = 3)
    val sink = "adcstream_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = changes.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(sink)
      .select("q_id", "nn_id", "adc_micro", "rank")
      .collect().map(_.toSeq).toSet
    spark.catalog.dropTempView(sink)
    val queries = base.filter($"vec_id" < 10).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val batch = ProductQuantizer.ivfAdcTopK(store, "vec_id", coarse,
        model, queries, k = 3, nprobe = 2)
      .select(col("q_id"), col("nn_id"),
        floor(col("dist") * 1e6).cast("long").as("adc_micro"), col("rank"))
      .collect().map(_.toSeq).toSet
    store.unpersist()
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
  }

  test("statePartitions option: the cached store layout survives, the " +
       "state partition count matches the option, output ≡ batch") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingSimilarity
    val savedConf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = corpus(0 until 150)
      val (coarse, model) = trainedOn(base)
      val store = ProductQuantizer.encodeIvfStore(
        base, "vec_id", "embedding", coarse, model).persist()
      store.count()
      val storeParts = store.rdd.getNumPartitions
      assert(storeParts > 2, s"test needs a wide store layout: $storeParts")

      // an UNPERSISTED store must be refused loudly (the 65 s footgun)
      val bare = ProductQuantizer.encodeIvfStore(
        base, "vec_id", "embedding", coarse, model)
      val e = intercept[IllegalArgumentException] {
        StreamingSimilarity.ivfAdcStream(
          spark.readStream.schema(base.schema.add("ts", "long"))
            .parquet(Files.createTempDirectory("graft-sp-x").toString),
          bare, "vec_id", "embedding", "ts", coarse, model,
          nprobe = 2, k = 3, statePartitions = Some(2))
      }
      assert(e.getMessage.contains("persisted"))

      val t0 = 1_600_000_000_000_000_000L
      val qs = base.filter($"vec_id" < 10)
        .select($"vec_id", $"embedding",
          (lit(t0) + $"vec_id" * lit(1_000_000L)).as("ts"))
      val flushVec = base.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0)
      val flush = spark.range(1).select(lit(999999999L).as("vec_id"),
        typedlit(flushVec.toSeq).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Files.createTempDirectory("graft-sp").toString
      qs.unionByName(flush).repartition(4)
        .write.mode("overwrite").parquet(tmp)
      val stream = spark.readStream
        .schema(spark.read.parquet(tmp).schema).parquet(tmp)
      val changes = StreamingSimilarity.ivfAdcStream(stream, store,
        "vec_id", "embedding", "ts", coarse, model, nprobe = 2, k = 3,
        statePartitions = Some(3))
      val sink = "sp_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the state width is the option's value, not the session default
      val stateParts = q.recentProgress
        .flatMap(_.stateOperators).map(_.numShufflePartitions)
      assert(stateParts.nonEmpty && stateParts.forall(_ == 3L),
        s"state partitions ${stateParts.toSeq} != 3")
      // the cached store layout survived the narrowed conf
      assert(store.rdd.getNumPartitions == storeParts,
        s"store layout collapsed: ${store.rdd.getNumPartitions}")
      // and the served rows are the batch derivation's
      val streamed = spark.table(sink)
        .select("q_id", "nn_id", "adc_micro", "rank")
        .collect().map(_.toSeq).toSet
      spark.catalog.dropTempView(sink)
      val queries = base.filter($"vec_id" < 10).orderBy("vec_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val batch = ProductQuantizer.ivfAdcTopK(store, "vec_id", coarse,
          model, queries, k = 3, nprobe = 2)
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("adc_micro"), col("rank"))
        .collect().map(_.toSeq).toSet
      store.unpersist()
      assert(streamed == batch)
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedConf)
  }

  test("drift probe: parity on in-distribution arrivals, moves under a planted shift") {
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-anndrift").toString

    def probe(stream: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long, Long)] = {
      val storeTx = new TxTable(spark, s"$root/s${System.nanoTime()}")
      val driftTx = new TxTable(spark, s"$root/d${System.nanoTime()}")
      StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
        storeTx, driftTx)
      val vecsDir = s"$root/v${System.nanoTime()}"
      stream.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
        s"$root/c${System.nanoTime()}").awaitTermination()
      StreamingAnnIndex.driftReport(driftTx).collect().map(r =>
        r.getAs[Int]("cell") -> ((r.getAs[Long]("p_base"),
          r.getAs[Long]("p_stream"), r.getAs[Long]("drift_permille")))).toMap
    }

    // in-distribution arrivals: same generator, new ids -> parity-ish
    val inDist = probe(corpus(1000 until 1160))
    assert(inDist.nonEmpty)
    inDist.foreach { case (cell, (pb, ps, permille)) =>
      assert(permille > 500 && permille < 2000,
        s"in-distribution cell $cell drifted: base $pb stream $ps ($permille)")
    }
    // planted shift: +3.0 on every dim — residuals leave the trained
    // codebook's neighborhoods, error quantiles jump
    val shifted = probe(corpus(1000 until 1160, shift = 3.0f))
    assert(shifted.values.forall(_._3 > 2000),
      s"planted shift must move the probe: $shifted")
  }

  test("population drift: arrivals concentrated in one cluster move pop_permille, error stays at parity") {
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annpop").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)
    // arrivals from cluster 0 ONLY (ids ≡ 0 mod 4), in-distribution
    // vectors — per-vector error is parity, population share is not
    val hot = corpus(1000 until 1640).filter($"vec_id" % 4 === 0)
    val vecsDir = s"$root/vecs"
    hot.coalesce(1).write.mode("overwrite").parquet(vecsDir)
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt").awaitTermination()
    val rep = StreamingAnnIndex.driftReport(driftTx).collect().map(r =>
      r.getAs[Int]("cell") ->
        ((Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    val hotCells = rep.filter(_._2._2.exists(_ > 2000))
    assert(hotCells.nonEmpty,
      s"the concentrated cluster's cell must show population drift: $rep")
    // and the error axis stays quiet on those same cells (the two
    // axes are independent signals)
    hotCells.foreach { case (cell, (err, _)) =>
      err.foreach(e => assert(e > 500 && e < 2000,
        s"cell $cell error drifted ($e) on in-distribution arrivals"))
    }
  }

  test("retrain loop: under-bar drift is a no-op; planted shift fires, new store resets the probe to parity") {
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annrt").toString
    def maintain(stream: org.apache.spark.sql.DataFrame, tag: String) = {
      val storeTx = new TxTable(spark, s"$root/$tag/store")
      val driftTx = new TxTable(spark, s"$root/$tag/drift")
      StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse,
        model, storeTx, driftTx)
      val vecsDir = s"$root/$tag/vecs"
      stream.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx,
        driftTx, s"$root/$tag/ckpt").awaitTermination()
      (storeTx, driftTx)
    }
    // in-distribution arrivals: the loop must NOT fire
    val (s1, d1) = maintain(corpus(1000 until 1100), "indist")
    val quiet = StreamingAnnIndex.retrainIfDrifted(s1, d1,
      new TxTable(spark, s"$root/q/store"), new TxTable(spark, s"$root/q/drift"),
      cells = 4, m = 4, k = 4, iters = 2)
    assert(quiet.isEmpty, "parity drift must not trigger a retrain")
    // planted shift: fires, and the REBUILT store's own baseline
    // absorbs the shifted population — re-streaming the same shifted
    // arrivals against the new models reads parity, not drift
    val shifted = corpus(1000 until 1100, shift = 3.0f)
    val (s2, d2) = maintain(shifted, "shift")
    val newStore = new TxTable(spark, s"$root/n/store")
    val newDrift = new TxTable(spark, s"$root/n/drift")
    val fired = StreamingAnnIndex.retrainIfDrifted(s2, d2,
      newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2)
    assert(fired.isDefined, "planted shift must trigger the retrain")
    assert(fired.get.rotation.isEmpty && fired.get.int8Scale.isEmpty,
      "a plain float store retrains with no tier config attached")
    val (c2, pq2) = (fired.get.coarse, fired.get.pq)
    // probe the new store with the SAME shifted arrivals
    val vecsDir2 = s"$root/n/vecs"
    shifted.select($"vec_id" + 500000L as "vec_id", $"embedding")
      .coalesce(1).write.mode("overwrite").parquet(vecsDir2)
    StreamingAnnIndex.run(spark, vecsDir2, c2, pq2, newStore, newDrift,
      s"$root/n/ckpt").awaitTermination()
    val rep = StreamingAnnIndex.driftReport(newDrift).collect()
      .flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Long]))
    assert(rep.nonEmpty && rep.forall(p => p > 300 && p < 3000),
      s"retrained store must read the shifted population near parity: ${rep.toSeq}")
  }

  test("OPQ retrain: parity arrivals are a no-op; a planted shift refits the rotation and the new store reads the shift at parity") {
    val base = denseCorpus(0 until 160)
    val opq = ProductQuantizer.fitOpq(base, "vec_id", "embedding",
      m = 4, k = 4, iters = 2, powerIters = 16)
    val rotated = ProductQuantizer.rotateVectors(
      base, "vec_id", "embedding", opq.rotation)
    val (coarse, _) = KMeans.fit(rotated, "vec_id", "remb", k = 4, iters = 2)
    val resid = KMeans.assign(rotated, "vec_id", "remb", coarse)
      .withColumn("r", zip_with(col("remb"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 4, iters = 2)
    val root = Files.createTempDirectory("graft-annrtopq").toString
    def maintain(stream: org.apache.spark.sql.DataFrame, tag: String) = {
      val storeTx = new TxTable(spark, s"$root/$tag/store")
      val driftTx = new TxTable(spark, s"$root/$tag/drift")
      StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, pq,
        storeTx, driftTx, rotation = Some(opq.rotation))
      val vecsDir = s"$root/$tag/vecs"
      stream.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(spark, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/$tag/ckpt", rotation = Some(opq.rotation)).awaitTermination()
      (storeTx, driftTx)
    }
    // no-op under parity
    val (s1, d1) = maintain(denseCorpus(1000 until 1100), "indist")
    assert(StreamingAnnIndex.retrainIfDrifted(s1, d1,
      new TxTable(spark, s"$root/q/store"),
      new TxTable(spark, s"$root/q/drift"),
      cells = 4, m = 4, k = 4, iters = 2, rotation = Some(opq.rotation),
      opqPowerIters = 16).isEmpty,
      "parity drift on an OPQ store must not trigger a retrain")
    // planted shift fires; the rotation is REFIT, returned explicitly
    val shifted = denseCorpus(1000 until 1100, shift = 3.0f)
    val (s2, d2) = maintain(shifted, "shift")
    val newStore = new TxTable(spark, s"$root/n/store")
    val newDrift = new TxTable(spark, s"$root/n/drift")
    val fired = StreamingAnnIndex.retrainIfDrifted(s2, d2,
      newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2,
      rotation = Some(opq.rotation), opqPowerIters = 16)
    assert(fired.isDefined, "planted shift must trigger the OPQ retrain")
    val rm = fired.get
    assert(rm.rotation.isDefined && rm.int8Scale.isEmpty,
      "an OPQ store's retrain must return the refit rotation")
    assert(rm.rotation.get != opq.rotation,
      "the rotation must be refit on the drifted corpus, not recycled")
    // post-retrain parity: the SAME shifted population probes the new
    // store under the NEW rotation
    val vecsDir2 = s"$root/n/vecs"
    shifted.select($"vec_id" + 500000L as "vec_id", $"embedding")
      .coalesce(1).write.mode("overwrite").parquet(vecsDir2)
    StreamingAnnIndex.run(spark, vecsDir2, rm.coarse, rm.pq, newStore,
      newDrift, s"$root/n/ckpt", rotation = rm.rotation).awaitTermination()
    val rep = StreamingAnnIndex.driftReport(newDrift).collect()
      .flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Long]))
    assert(rep.nonEmpty && rep.forall(p => p > 300 && p < 3000),
      s"retrained OPQ store must read the shift near parity: ${rep.toSeq}")
  }

  test("int8 retrain: dequantized refit + re-scale under a caller idCol; parity no-op; new store reads the shift at parity") {
    // shift NEGATIVE so arrivals stay inside the baseline max-abs (a
    // +3 shift would clamp the hot dim at ±127 and the clamp distortion
    // — not the codebooks — would dominate the post-retrain probe)
    val base = corpus(0 until 160).withColumnRenamed("vec_id", "emb_id")
    val (coarse, model) = trainedOn(
      base.withColumnRenamed("emb_id", "vec_id"))
    val sc = ProductQuantizer.int8Scale(base, "embedding")
    val root = Files.createTempDirectory("graft-annrti8").toString
    def maintain(stream: org.apache.spark.sql.DataFrame, tag: String) = {
      val storeTx = new TxTable(spark, s"$root/$tag/store")
      val driftTx = new TxTable(spark, s"$root/$tag/drift")
      StreamingAnnIndex.bootstrap(base, "emb_id", "embedding", coarse,
        model, storeTx, driftTx, int8Scale = Some(sc))
      val vecsDir = s"$root/$tag/vecs"
      stream.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx,
        driftTx, s"$root/$tag/ckpt", idCol = "emb_id",
        int8Scale = Some(sc)).awaitTermination()
      (storeTx, driftTx)
    }
    def embIdd(df: org.apache.spark.sql.DataFrame) =
      df.withColumnRenamed("vec_id", "emb_id")
    val (s1, d1) = maintain(embIdd(corpus(1000 until 1100)), "indist")
    assert(StreamingAnnIndex.retrainIfDrifted(s1, d1,
      new TxTable(spark, s"$root/q/store"),
      new TxTable(spark, s"$root/q/drift"),
      cells = 4, m = 4, k = 4, iters = 2, idCol = "emb_id",
      int8Scale = Some(sc)).isEmpty,
      "parity drift on an int8 store must not trigger a retrain")
    val shifted = embIdd(corpus(1000 until 1100, shift = -3.0f))
    val (s2, d2) = maintain(shifted, "shift")
    val newStore = new TxTable(spark, s"$root/n/store")
    val newDrift = new TxTable(spark, s"$root/n/drift")
    val fired = StreamingAnnIndex.retrainIfDrifted(s2, d2,
      newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2,
      idCol = "emb_id", int8Scale = Some(sc))
    assert(fired.isDefined, "planted shift must trigger the int8 retrain")
    val rm = fired.get
    assert(rm.int8Scale.isDefined && rm.rotation.isEmpty,
      "an int8 store's retrain must return the recomputed scale")
    assert(rm.int8Scale.get > 0f && java.lang.Float.isFinite(rm.int8Scale.get))
    assert(newStore.read().columns.contains("vec8"),
      "the retrained store must keep the int8 tier")
    val vecsDir2 = s"$root/n/vecs"
    shifted.select($"emb_id" + 500000L as "emb_id", $"embedding")
      .coalesce(1).write.mode("overwrite").parquet(vecsDir2)
    StreamingAnnIndex.run(spark, vecsDir2, rm.coarse, rm.pq, newStore,
      newDrift, s"$root/n/ckpt", idCol = "emb_id",
      int8Scale = rm.int8Scale).awaitTermination()
    val rep = StreamingAnnIndex.driftReport(newDrift).collect()
      .flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Long]))
    assert(rep.nonEmpty && rep.forall(p => p > 300 && p < 3000),
      s"retrained int8 store must read the shift near parity: ${rep.toSeq}")
  }

  test("decision quantile: a 20% drifted subpopulation hides from the p50 decision and fires the p95 one") {
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annsub").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)
    // arrivals: 80% in-distribution, 20% (id % 5 == 0) shifted +3.0 —
    // every cell receives its slice, so per-cell error p50 stays in the
    // parity band while p95 lands inside the shifted tail
    val arrivals = corpus(1000 until 1400)
      .select($"vec_id", when($"vec_id" % 5 === 0,
        transform($"embedding",
          x => (x.cast("double") + lit(3.0)).cast("float")))
        .otherwise($"embedding").as("embedding"))
    val vecsDir = s"$root/vecs"
    arrivals.coalesce(1).write.mode("overwrite").parquet(vecsDir)
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt").awaitTermination()
    val atP50 = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
      new TxTable(spark, s"$root/a/store"), new TxTable(spark, s"$root/a/drift"),
      cells = 4, m = 4, k = 4, iters = 2, decisionQuantile = 0.5)
    assert(atP50.isEmpty,
      "the median hides a 20% drifted subpopulation — p50 must not fire")
    val atP95 = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
      new TxTable(spark, s"$root/b/store"), new TxTable(spark, s"$root/b/drift"),
      cells = 4, m = 4, k = 4, iters = 2, decisionQuantile = 0.95)
    assert(atP95.isDefined,
      "p95 sits inside the shifted 20% tail — it must fire the retrain")
  }

  test("population bar: concentrated in-distribution arrivals fire the pop axis at error parity; None disables it") {
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annpopbar").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)
    // all arrivals from cluster 0 — in-distribution vectors, so the
    // error axis reads parity; the hot cell's pop_permille is exactly
    // (1/1)·(160/40)·1000 = 4000 (share-of-stream over share-of-base)
    val hot = corpus(1000 until 1640).filter($"vec_id" % 4 === 0)
    val vecsDir = s"$root/vecs"
    hot.coalesce(1).write.mode("overwrite").parquet(vecsDir)
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt").awaitTermination()
    val disabled = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
      new TxTable(spark, s"$root/a/store"), new TxTable(spark, s"$root/a/drift"),
      cells = 4, m = 4, k = 4, iters = 2, popBarPermille = None)
    assert(disabled.isEmpty,
      "with the pop axis off, in-distribution errors must not fire")
    val fired = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
      new TxTable(spark, s"$root/b/store"), new TxTable(spark, s"$root/b/drift"),
      cells = 4, m = 4, k = 4, iters = 2, popBarPermille = Some(3000L))
    assert(fired.isDefined,
      "a 4000-permille concentration must fire a 3000-permille bar")
  }

  test("compaction policy: scheduled sorted compact is content-neutral, collapses to disjoint cell slices, keeps exactly-once tags") {
    val base = corpus(0 until 120)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-anncompact").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)
    val vecsDir = s"$root/vecs"
    writeBatches(vecsDir, Seq(corpus(200 until 240), corpus(240 until 280),
      corpus(280 until 320), corpus(320 until 360)))
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt", maxFilesPerTrigger = 1, compactEvery = 2)
      .awaitTermination()
    // content-neutral under the policy: still the from-scratch rebuild
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq,
        r.getAs[scala.collection.Seq[Float]]("vec").toSeq)
    val full = base.unionByName(corpus(200 until 360))
    val rebuilt = ProductQuantizer.encodeIvfStore(
      full, "vec_id", "embedding", coarse, model).collect().map(key).toSet
    assert(storeTx.read().collect().map(key).toSet == rebuilt,
      "compaction must be content-neutral")
    // batches 0..3 compacted after 1 and 3: the live set is ONE rewrite
    // commit (bootstrap + 4 appends collapsed), not five commits' files
    val files = storeTx.snapshot().map(_.path)
    val dirs = files.map(p => p.substring(0, p.lastIndexOf('/'))).toSet
    assert(dirs.size == 1,
      s"post-compact live set must be one rewrite commit, got $dirs")
    // the global cell sort leaves non-interleaved per-file cell ranges —
    // the file-level pruning partitionBy-grade layout
    val ranges = files.map { p =>
      val r = spark.read.parquet(p)
        .agg(min(col("cell")), max(col("cell"))).head()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case scala.collection.Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file cell ranges interleave: $ranges")
      case _ => ()
    }
    // exactly-once survives compaction: a replayed batch tag still no-ops
    assert(storeTx.appendOnce(storeTx.read().limit(1),
      tag = "ann-batch-0").isEmpty,
      "a compacted store must still refuse a replayed batch tag")
  }

  test("generation pointer: atomic idempotent monotonic publish; mid-swap readers stay complete; retrainAndSwap composes the loop") {
    import graft.streaming.AnnGenerations
    val base = corpus(0 until 160)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-anngen").toString
    val gens = new AnnGenerations(spark, root)
    assert(gens.currentGen().isEmpty)
    val (g0, s0, d0) = gens.next()
    assert(g0 == 0L)
    // a crashed build that COMMITTED into its generation but never
    // published must not have its directory reused: appendOnce tags in
    // the leftover would silently swallow the fresh build's commits
    // and publish() would then serve the crashed run's stale rows
    s0.append(corpus(0 until 4))
    val (gRetry, _, _) = gens.next()
    assert(gRetry == 1L, "next() must skip the crashed unpublished gen-0")
    val rootFs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.delete(new org.apache.hadoop.fs.Path(s"$root/gen-0"), true)
    assert(gens.next()._1 == 0L) // clean slate again for the rest
    // publishing an empty generation is refused — publish AFTER commits
    val eEarly = intercept[IllegalArgumentException] { gens.publish(g0) }
    assert(eEarly.getMessage.contains("no committed store"), eEarly.getMessage)
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      s0, d0)
    gens.publish(g0)
    assert(gens.currentGen().contains(0L))
    gens.publish(g0) // idempotent
    assert(gens.currentGen().contains(0L))
    // maintain the CURRENT generation with a planted shift
    val (_, storeTx, driftTx) = gens.current().get
    val shifted = corpus(1000 until 1100, shift = 3.0f)
    val vecsDir = s"$root/vecs"
    shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
    StreamingAnnIndex.run(spark, vecsDir, coarse, model, storeTx, driftTx,
      s"$root/ckpt").awaitTermination()
    // a reader binds BEFORE the swap
    val boundStore = gens.current().get._2
    val preRows = boundStore.read().count()
    // under-bar decision: nothing written, pointer untouched
    assert(StreamingAnnIndex.retrainAndSwap(gens, cells = 4, m = 4, k = 4,
      iters = 2, thresholdPermille = Long.MaxValue,
      popBarPermille = None).isEmpty)
    assert(gens.currentGen().contains(0L))
    // fired: retrains into gen 1 and publishes it
    val fired = StreamingAnnIndex.retrainAndSwap(gens, cells = 4, m = 4,
      k = 4, iters = 2)
    assert(fired.isDefined && fired.get._1 == 1L)
    assert(gens.currentGen().contains(1L))
    // the mid-swap reader keeps serving its COMPLETE old generation
    assert(boundStore.read().count() == preRows)
    // the new generation re-encodes the full union corpus
    assert(gens.current().get._2.read().count() == preRows)
    // rollback is refused loudly
    val eBack = intercept[IllegalArgumentException] { gens.publish(0L) }
    assert(eBack.getMessage.contains("roll"), eBack.getMessage)
  }

  test("driftBackfill from the store matches the inline stream partials") {
    val base = corpus(0 until 120)
    val (coarse, model) = trainedOn(base)
    val root = Files.createTempDirectory("graft-annbf").toString
    val storeTx = new TxTable(spark, s"$root/store")
    val driftTx = new TxTable(spark, s"$root/drift")
    StreamingAnnIndex.bootstrap(base, "vec_id", "embedding", coarse, model,
      storeTx, driftTx)
    import graft.operators.Sketches
    def rolled(parts: org.apache.spark.sql.DataFrame) = parts
      .groupBy("cell")
      .agg(Sketches.quantileMerge(col("sk"), 128).as("rsk"))
      .select(col("cell"), Sketches.quantileN(col("rsk")).as("n"),
        Sketches.quantileEstimate(col("rsk"), 0.5).as("p50"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val inline = rolled(driftTx.read().filter(col("phase") === "baseline"))
    val backfill = rolled(StreamingAnnIndex.driftBackfill(
      storeTx, coarse, model, phase = "baseline"))
    assert(inline == backfill,
      "store-derived partials must reproduce the inline statistic")
  }
}
