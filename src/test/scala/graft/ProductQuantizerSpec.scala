package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantizer

/** Properties the PQ layer must hold beyond the q152/q153 oracles:
  * training is a pure function of the value set (partitioning
  * invisible), encode/decode geometry is consistent, ADC equals the
  * explicit reconstructed distance, and more centroids never hurt
  * reconstruction on the training set.
  */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic embeddings: dim 16, values in [-1, 1). */
  private def corpus(n: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, (0 until 16).map { j =>
        (((i * 31 + j * 17 + 7) % 2000) / 1000.0f) - 1.0f
      })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fit is partitioning-invariant and codes are deterministic") {
    val c1 = corpus(200).repartition(1)
    val c7 = corpus(200).repartition(7, col("vec_id"))
    val m1 = ProductQuantizer.fit(c1, "vec_id", "embedding", m = 4, k = 4, iters = 3)
    val m7 = ProductQuantizer.fit(c7, "vec_id", "embedding", m = 4, k = 4, iters = 3)
    assert(m1.codebooks == m7.codebooks,
      "codebooks must not depend on partitioning")
    val codes1 = ProductQuantizer.encode(c1, "vec_id", "embedding", m1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val codes7 = ProductQuantizer.encode(c7, "vec_id", "embedding", m7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes1 == codes7)
    assert(codes1.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 4)))
  }

  test("fit with a too-thin sample falls back to the full corpus (seed AND iterations)") {
    // 40 rows at 1% sample ~ 0 sampled rows: before the fallback this
    // threw at seeding even though the unsampled corpus has >= k rows
    val c = corpus(40)
    val sampled = ProductQuantizer.fit(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, sampleFraction = 0.01)
    val full = ProductQuantizer.fit(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 2)
    assert(sampled.codebooks == full.codebooks,
      "thin-sample fallback must train exactly like sampleFraction = 1")
  }

  test("reconstruction: decode(encode(v)) concatenates the assigned centroids; error is argmin-optimal per subspace") {
    val c = corpus(100)
    val model = ProductQuantizer.fit(c, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val out = c
      .withColumn("codes", ProductQuantizer.codesColumn(col("embedding"), model))
      .withColumn("recon", ProductQuantizer.reconstructColumn(col("codes"), model))
      .withColumn("err", ProductQuantizer.reconErrColumn(
        col("embedding"), col("codes"), model))
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Float](1); val codes = r.getSeq[Int](2)
      val recon = r.getSeq[Float](3); val err = r.getDouble(4)
      // recon = concat of the coded centroids
      val expected = (0 until 4).flatMap(s => model.codebooks(s)(codes(s)))
      assert(recon == expected)
      // the assigned code minimizes the subspace distance (argmin)
      (0 until 4).foreach { s =>
        val sub = v.slice(s * 4, s * 4 + 4)
        def d2(c0: Seq[Float]) = sub.zip(c0)
          .map { case (x, y) => val d = x.toDouble - y; d * d }.sum
        val best = (0 until 8).map(j => d2(model.codebooks(s)(j))).min
        assert(math.abs(d2(model.codebooks(s)(codes(s))) - best) < 1e-12)
      }
      assert(err >= 0.0)
    }
    // k=16 codebooks reconstruct the TRAINING set at least as well
    val err8 = c.withColumn("codes",
        ProductQuantizer.codesColumn(col("embedding"), model))
      .select(ProductQuantizer.reconErrColumn(
        col("embedding"), col("codes"), model).as("e"))
      .agg(sum("e")).head().getDouble(0)
    val model16 = ProductQuantizer.fit(c, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val err16 = c.withColumn("codes",
        ProductQuantizer.codesColumn(col("embedding"), model16))
      .select(ProductQuantizer.reconErrColumn(
        col("embedding"), col("codes"), model16).as("e"))
      .agg(sum("e")).head().getDouble(0)
    assert(err16 <= err8 + 1e-9, s"k=16 err $err16 vs k=8 err $err8")
  }

  test("adcTopK == explicit distance to the reconstructed vectors; plan reads codes only") {
    val c = corpus(150)
    val model = ProductQuantizer.fit(c, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val codes = ProductQuantizer.encode(c, "vec_id", "embedding", model)
      .localCheckpoint(true)
    val queries = c.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val adc = ProductQuantizer.adcTopK(codes, "vec_id", model, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // reference: explicit ||q - recon(codes)||^2 over all rows
    val reconByized = codes.select(col("vec_id"),
        ProductQuantizer.reconstructColumn(col("codes"), model).as("recon"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val expected = reconByized.toSeq.map { case (id, rec) =>
        val d = q.zip(rec).map { case (x, y) =>
          val dd = x.toDouble - y.toDouble; dd * dd }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(5)
      val got = adc.filter(_._1 == qid).sortBy(_._4).map(t => (t._2, t._3))
      assert(got.map(_._1).toSeq == expected.map(_._1),
        s"q$qid neighbor ids: $got vs $expected")
      got.zip(expected).foreach { case ((_, gd), (_, ed)) =>
        assert(math.abs(gd - ed) < 1e-9, s"q$qid dist $gd vs $ed")
      }
    }
    // the query side never touches the float vectors
    val plan = ProductQuantizer.adcTopK(codes, "vec_id", model, queries, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"),
      s"ADC must read codes only:\n$plan")
  }

  test("DataFrame-batch query paths are bit-identical to the Seq paths") {
    import graft.operators.KMeans
    val c = corpus(200)
    val model = ProductQuantizer.fit(c, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val codes = ProductQuantizer.encode(c, "vec_id", "embedding", model)
    val qDf = c.filter(col("vec_id") % 13 === 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val qSeq = qDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // flat ADC: same neighbors, same exact doubles, same ranks
    assert(rows(ProductQuantizer.adcTopKBatch(codes, "vec_id", model,
        qDf, "q_id", "qv", k = 5)) ==
      rows(ProductQuantizer.adcTopK(codes, "vec_id", model, qSeq, k = 5)))
    // IVFADC: batch plans built in-task must equal driver-built plans
    val (coarse, _) = KMeans.fit(c, "vec_id", "embedding", k = 4, iters = 2)
    val resid = KMeans.assign(c, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 8, iters = 2)
    val index = ProductQuantizer.encodeIvf(c, "vec_id", "embedding", coarse, pq)
    assert(rows(ProductQuantizer.ivfAdcTopKBatch(index, "vec_id", coarse,
        pq, qDf, "q_id", "qv", k = 5, nprobe = 2)) ==
      rows(ProductQuantizer.ivfAdcTopK(index, "vec_id", coarse, pq,
        qSeq, k = 5, nprobe = 2)))
    // the bounded gather is loud, not an OOM
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.adcTopKBatch(codes, "vec_id", model,
        qDf, "q_id", "qv", k = 5, maxQueryRows = 3)
    }
    assert(e.getMessage.contains("maxQueryRows"), e.getMessage)
    // and the DEFAULT bound is the modest 10^5 (a ~25 MB float block
    // at d=64): an over-sized batch fails loudly at the default too
    val wide = spark.range(100001)
      .select(col("id").as("q_id"),
        typedlit(Seq.fill(16)(0.5f)).as("qv"))
    val e2 = intercept[IllegalArgumentException] {
      ProductQuantizer.adcTopKBatch(codes, "vec_id", model,
        wide, "q_id", "qv", k = 5)
    }
    assert(e2.getMessage.contains("maxQueryRows=100000"), e2.getMessage)
    // composed rerank batch form == Seq form
    val store = ProductQuantizer.encodeIvfStore(
      c, "vec_id", "embedding", coarse, pq)
    assert(rows(ProductQuantizer.ivfAdcRerankTopKBatch(store, "vec_id",
        "vec", coarse, pq, qDf, "q_id", "qv", k = 5, nprobe = 2,
        candidates = 20)) ==
      rows(ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
        coarse, pq, qSeq, k = 5, nprobe = 2, candidates = 20)))
    // int8 tier batch twin (round 14) == Seq form, and the same loud
    // bounded-gather contract
    val sc8 = ProductQuantizer.int8Scale(c, "embedding")
    val store8 = ProductQuantizer.encodeIvfStoreInt8(
      c, "vec_id", "embedding", coarse, pq, sc8)
    assert(rows(ProductQuantizer.ivfAdcRerankTopK8Batch(store8, "vec_id",
        coarse, pq, sc8, qDf, "q_id", "qv", k = 5, nprobe = 2,
        candidates = 20)) ==
      rows(ProductQuantizer.ivfAdcRerankTopK8(store8, "vec_id",
        coarse, pq, sc8, qSeq, k = 5, nprobe = 2, candidates = 20)))
    val e8 = intercept[IllegalArgumentException] {
      ProductQuantizer.ivfAdcRerankTopK8Batch(store8, "vec_id",
        coarse, pq, sc8, qDf, "q_id", "qv", k = 5, nprobe = 2,
        candidates = 20, maxQueryRows = 3)
    }
    assert(e8.getMessage.contains("maxQueryRows"), e8.getMessage)
  }

  test("composed IVFADC -> rerank: exact at full probe width; probe scan never reads floats; float fetch partition-pruned") {
    import graft.operators.KMeans
    val c = corpus(200)
    val (coarse, _) = KMeans.fit(c, "vec_id", "embedding", k = 4, iters = 2)
    val resid = KMeans.assign(c, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfstore").toString
    ProductQuantizer.encodeIvfStore(c, "vec_id", "embedding", coarse, pq)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val store = spark.read.parquet(dir)
    val queries = c.filter(col("vec_id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    // full probe width + corpus-wide candidates == the exact float top-k
    val got = ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
        coarse, pq, queries, k = 5, nprobe = 4, candidates = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = c.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val want = queries.flatMap { case (qid, q) =>
      rows.map { case (id, v) =>
        val d = q.zip(v).map { case (a, b) =>
          val dd = a.toDouble - b.toDouble; dd * dd }.sum
        (qid, id, d)
      }.sortBy { case (_, id, d) => (d, id) }.take(5).map(t => (t._1, t._2))
    }.toSet
    assert(got == want)
    // narrow probe: the PROBE plan reads codes only, the FLOAT fetch is
    // partition-pruned to the probed cells
    val narrow = ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
      coarse, pq, queries, k = 5, nprobe = 2, candidates = 20)
    val plan = narrow.queryExecution.executedPlan.toString
    // one header line per scan: "... ReadSchema: struct<...>"
    val scanHeads = plan.split("Scan parquet").toSeq.tail
      .map(_.linesIterator.next())
    assert(scanHeads.nonEmpty)
    val codeScans = scanHeads.filter(_.contains("codes"))
    assert(codeScans.nonEmpty && codeScans.forall(!_.contains("vec:")),
      s"probe scan must not read the float column:\n$plan")
    assert(scanHeads.exists(s => s.contains("vec:array") &&
        s.contains("PartitionFilters: [cell")),
      s"float fetch must carry cell PartitionFilters:\n$plan")
    narrow.collect() // and it runs
  }

  /** Anisotropic corpus: dim 16 with energy decaying 0.72^j — the PCA-
    * spectrum shape OPQ exists for. A fixed split gives subspace 0
    * nearly all the variance; the learned rotation rebalances it.
    */
  private def skewedCorpus(n: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, (0 until 16).map { j =>
        val u = (((i * 37 + j * 23 + 11) % 2000) / 1000.0f) - 1.0f
        (u * math.pow(0.72, j).toFloat)
      })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("OPQ: rotation is orthonormal, training partitioning-invariant, encode consistent with rotate-then-encode") {
    val c1 = skewedCorpus(300).repartition(1)
    val c5 = skewedCorpus(300).repartition(5, col("vec_id"))
    val o1 = ProductQuantizer.fitOpq(c1, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    val o5 = ProductQuantizer.fitOpq(c5, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    assert(o1.rotation == o5.rotation,
      "rotation must not depend on partitioning")
    assert(o1.pq.codebooks == o5.pq.codebooks)
    // R·Rᵀ = I to float32 precision
    val r = o1.rotation.map(_.map(_.toDouble).toArray).toArray
    for (a <- r.indices; b <- r.indices) {
      val dot = r(a).zip(r(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"R row $a · row $b = $dot")
    }
    // fused encodeOpq == rotate-then-encode (one arithmetic)
    val viaFused = ProductQuantizer.encodeOpq(c1, "vec_id", "embedding", o1)
      .collect().map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    val viaTwo = ProductQuantizer.encode(
        ProductQuantizer.rotateVectors(c1, "vec_id", "embedding", o1.rotation),
        "vec_id", "remb", o1.pq)
      .collect().map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    assert(viaFused == viaTwo)
  }

  test("fitOpq(sampleFraction): moment + Lloyd's read exactly the md5-sample rows; thin sample falls back") {
    val c = skewedCorpus(600)
    // the ground truth: manually pre-filter the SAME hash sample and
    // train unsampled on it — rotation AND codebooks must be identical
    graft.plans.GraftExtensions.register(spark)
    val handSample = c.filter(expr(
      "md5_long60(concat('pqs:', cast(vec_id as string))) % 1000000 < 500000"))
    val viaParam = ProductQuantizer.fitOpq(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24, sampleFraction = 0.5)
    val viaFilter = ProductQuantizer.fitOpq(handSample, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    assert(viaParam.rotation == viaFilter.rotation,
      "sampled moment pass must see exactly the hash-sample rows")
    assert(viaParam.pq.codebooks == viaFilter.pq.codebooks,
      "sampled inner fit must train on exactly the hash-sample rows")
    // and the sample genuinely moved the model (it's not a no-op)
    val full = ProductQuantizer.fitOpq(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    assert(full.rotation != viaParam.rotation)
    // thin sample (40 rows at 1%): falls back to unsampled, like fit
    val tiny = skewedCorpus(40)
    val fb = ProductQuantizer.fitOpq(tiny, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24, sampleFraction = 0.01)
    val fullTiny = ProductQuantizer.fitOpq(tiny, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    assert(fb.rotation == fullTiny.rotation
      && fb.pq.codebooks == fullTiny.pq.codebooks)
  }

  test("non-parametric OPQ: orthonormal, partitioning-invariant, lowers the objective vs parametric") {
    // non-Gaussian corpus: two interleaved populations whose principal
    // directions disagree — the eigenbasis (one global second moment)
    // can't serve both, which is exactly the regime Ge §4.2 exists for
    val rows = (0 until 400).map { i =>
      val base = (0 until 16).map { j =>
        val u = (((i * 37 + j * 23 + 11) % 2000) / 1000.0f) - 1.0f
        u * math.pow(0.72, j).toFloat
      }
      val v = if (i % 2 == 0) base
              else base.reverse.map(x => x * 0.9f + 0.05f)
      (i.toLong, v)
    }
    val c = rows.toDF("vec_id", "embedding")
    val np1 = ProductQuantizer.fitOpqNp(c.repartition(1), "vec_id",
      "embedding", m = 4, k = 8, iters = 2, powerIters = 24,
      alternations = 2)
    val np5 = ProductQuantizer.fitOpqNp(c.repartition(5, col("vec_id")),
      "vec_id", "embedding", m = 4, k = 8, iters = 2, powerIters = 24,
      alternations = 2)
    assert(np1.rotation == np5.rotation,
      "non-parametric rotation must not depend on partitioning")
    assert(np1.pq.codebooks == np5.pq.codebooks)
    val r = np1.rotation.map(_.map(_.toDouble).toArray).toArray
    for (a <- r.indices; b <- r.indices) {
      val dot = r(a).zip(r(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"R row $a . row $b = $dot")
    }
    // the alternation minimizes total ROTATED-space recon error — the
    // one objective both variants share; np must not lose to its own
    // init, and on this corpus it strictly improves
    def objective(model: ProductQuantizer.OPQModel): Double = {
      val rotated = ProductQuantizer.rotateVectors(
        c, "vec_id", "embedding", model.rotation)
      rotated
        .withColumn("codes",
          ProductQuantizer.codesColumn(col("remb"), model.pq))
        .select(sum(ProductQuantizer.reconErrColumn(
          col("remb"), col("codes"), model.pq)))
        .head().getDouble(0)
    }
    val param = ProductQuantizer.fitOpq(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, powerIters = 24)
    val errParam = objective(param)
    val errNp = objective(np1)
    assert(errNp < errParam,
      s"non-parametric must improve the objective here: $errNp vs $errParam")
  }

  test("OPQ refuses a rank-deficient corpus loudly (zero-padded dim breaks the rotation identity)") {
    // dim 7 is exactly 0 in every row: the second moment is rank 15,
    // power stages can't span dim 7, and past rank the CGS2 residual
    // is rounding noise — the orthonormality gate must catch it
    val rows = (0 until 120).map { i =>
      (i.toLong, (0 until 16).map { j =>
        if (j == 7) 0.0f
        else (((i * 53 + j * 29 + 3) % 2000) / 1000.0f) - 1.0f
      })
    }
    val degenerate = rows.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.fitOpq(degenerate, "vec_id", "embedding",
        m = 4, k = 8, iters = 1, powerIters = 16)
    }
    assert(e.getMessage.contains("orthonormal"), e.getMessage)
  }

  test("OPQ lifts reconstruction on an anisotropic corpus; ADC serving matches the rotated-space replay") {
    val c = skewedCorpus(300)
    val plain = ProductQuantizer.fit(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 3)
    val opq = ProductQuantizer.fitOpq(c, "vec_id", "embedding",
      m = 4, k = 8, iters = 3, powerIters = 24)
    def totalErr(df: org.apache.spark.sql.DataFrame, vecCol: String,
                 model: ProductQuantizer.PQModel): Double =
      df.withColumn("codes",
          ProductQuantizer.codesColumn(col(vecCol), model))
        .select(sum(ProductQuantizer.reconErrColumn(
          col(vecCol), col("codes"), model)))
        .collect()(0).getDouble(0)
    val errPlain = totalErr(c, "embedding", plain)
    val rotated = ProductQuantizer.rotateVectors(
      c, "vec_id", "embedding", opq.rotation)
    val errOpq = totalErr(rotated, "remb", opq.pq)
    assert(errOpq < errPlain * 0.9,
      s"OPQ must lift the anisotropic regime: $errOpq vs $errPlain")
    // serving: adcTopKOpq == adcTopK on rotated queries + OPQ codes
    val codes = ProductQuantizer.encodeOpq(c, "vec_id", "embedding", opq)
    val qs = c.filter(col("vec_id") < 5).collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).toSeq).toSeq
    val got = ProductQuantizer.adcTopKOpq(codes, "vec_id", opq, qs, k = 4)
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    val rotQs = rotated.filter(col("vec_id") < 5).collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).toSeq).toSeq
    val want = ProductQuantizer.adcTopK(codes, "vec_id", opq.pq, rotQs, k = 4)
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    assert(got == want)
  }

  test("ivfAdcTopK: heaps match a local replay; probed cells prune parquet partitions") {
    import graft.operators.KMeans
    val c = corpus(200)
    val (coarse, _) = KMeans.fit(c, "vec_id", "embedding", k = 4, iters = 2)
    val cLit = org.apache.spark.sql.functions.typedlit(coarse)
    val resid = KMeans.assign(c, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(cLit, col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 8, iters = 2)
    val index = ProductQuantizer.encodeIvf(c, "vec_id", "embedding", coarse, pq)
    // the 100 TB layout: codes partitioned by coarse cell
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    index.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
    val queries = c.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val got = ProductQuantizer.ivfAdcTopK(stored, "vec_id", coarse, pq,
        queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // local replay of probe selection + residual distance tables
    val rows = index.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    queries.foreach { case (qid, q) =>
      val probed = coarse.indices.map { cI =>
        (q.zip(coarse(cI)).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum, cI)
      }.sortBy(identity).take(2).map(_._2).toSet
      val expected = rows.filter(t => probed.contains(t._2)).map {
        case (id, cell, codes) =>
          val qr = q.zip(coarse(cell)).map { case (x, y) => x - y }
          var acc = 0.0
          (0 until pq.m).foreach { s =>
            var a2 = 0.0
            (0 until pq.subDim).foreach { i =>
              val d = qr(s * pq.subDim + i).toDouble -
                pq.codebooks(s)(codes(s))(i).toDouble
              a2 += d * d
            }
            acc += a2
          }
          (id, acc)
      }.sortBy { case (id, dd) => (dd, id) }.take(5)
      val g = got.filter(_._1 == qid).sortBy(t => (t._3, t._2))
        .map(t => (t._2, t._3)).toSeq
      assert(g.map(_._1) == expected.map(_._1).toSeq,
        s"q$qid ids: $g vs ${expected.toSeq}")
      g.zip(expected).foreach { case ((_, gd), (_, ed)) =>
        assert(math.abs(gd - ed) < 1e-9) }
    }
    // nprobe=1: the scan must prune unprobed cell partitions
    val plan = ProductQuantizer.ivfAdcTopK(stored, "vec_id", coarse, pq,
        queries.take(1), k = 5, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell.*"),
      s"probe filter must reach the partition scan:\n$plan")
  }

  test("int8 tier: quantization bounded by s/254 per dim; rerank ranks within quantization noise of float") {
    import graft.operators.KMeans
    val c = corpus(200)
    val (coarse, _) = KMeans.fit(c, "vec_id", "embedding", k = 4, iters = 2)
    val resid = KMeans.assign(c, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 8, iters = 2)
    val s = ProductQuantizer.int8Scale(c, "embedding")
    assert(s > 0f)
    val store8 = ProductQuantizer.encodeIvfStoreInt8(
      c, "vec_id", "embedding", coarse, pq, s)
    // every dequantized component within half an int8 step of the float
    // (collect: 200 rows — checked driver-side since the tier is BINARY)
    val inv = s.toDouble / 127.0
    val worst = store8.join(c, "vec_id")
      .select(col("embedding"), col("vec8")).collect().map { r =>
        val v = r.getSeq[Float](0)
        val v8 = r.getAs[Array[Byte]](1)
        v.zip(v8).map { case (x, b) =>
          math.abs(x.toDouble - b.toDouble * inv) }.max
      }.max
    assert(worst <= s / 254.0 + 1e-9, s"dequant error $worst > ${s / 254.0}")
    // int8 rerank with candidates = corpus: each returned neighbor's
    // TRUE float distance is within the quantization noise bound of
    // the float-rerank winner at the same rank (rank flips are allowed
    // only inside the noise band — the honest int8 contract)
    val queries = c.filter(col("vec_id") < 4).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val store = ProductQuantizer.encodeIvfStore(
      c, "vec_id", "embedding", coarse, pq)
    def trueDist(q: Seq[Float], id: Long): Double = {
      val v = c.filter(col("vec_id") === id).head().getSeq[Float](1)
      q.zip(v).map { case (a, b) =>
        val d = a.toDouble - b.toDouble; d * d }.sum
    }
    val f = ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
        coarse, pq, queries, k = 3, nprobe = 4, candidates = 200)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val i8 = ProductQuantizer.ivfAdcRerankTopK8(store8, "vec_id",
        coarse, pq, s, queries, k = 3, nprobe = 4, candidates = 200)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // 64 dims, each |err| <= s/254 -> dist error <= 2*|q-v|*err + err^2
    // per dim; bound loosely via measured distances
    val qm = queries.toMap
    i8.foreach { case ((qid, rank), nnId) =>
      val fNn = f((qid, rank))
      if (fNn != nnId) {
        val dI8 = trueDist(qm(qid), nnId)
        val dF = trueDist(qm(qid), fNn)
        // a flip is legitimate only between near-tied neighbors
        assert(math.abs(dI8 - dF) < 0.05 * (dF + 1e-9),
          s"q$qid rank $rank: int8 picked $nnId (d=$dI8) vs float $fNn (d=$dF)")
      }
    }
  }

  test("int8 rerank fetch prunes to probed cells (PartitionFilters on a partitioned store)") {
    import graft.operators.KMeans
    val c = corpus(200)
    val (coarse, _) = KMeans.fit(c, "vec_id", "embedding", k = 4, iters = 2)
    val resid = KMeans.assign(c, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(col("embedding"),
        element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
      .select("vec_id", "r")
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m = 4, k = 8, iters = 2)
    val s = ProductQuantizer.int8Scale(c, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-i8store").toString
    ProductQuantizer.encodeIvfStoreInt8(c, "vec_id", "embedding",
        coarse, pq, s)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val store8 = spark.read.parquet(dir)
    val queries = c.filter(col("vec_id") < 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val df = ProductQuantizer.ivfAdcRerankTopK8(store8, "vec_id",
      coarse, pq, s, queries, k = 3, nprobe = 1, candidates = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the rerank fetch (the scan reading vec8) must carry the probed-
    // cell partition filter — at nprobe 1 with 2 queries that is at
    // most 2 of the 4 cell partitions
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"expected cell PartitionFilters on the int8 store scan:\n$plan")
  }

  test("adcRerankTopK with candidates = corpus recovers the EXACT float top-k") {
    val c = corpus(120)
    val model = ProductQuantizer.fit(c, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val codes = ProductQuantizer.encode(c, "vec_id", "embedding", model)
    val queries = c.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val rr = ProductQuantizer.adcRerankTopK(codes, c, "vec_id", "embedding",
        model, queries, k = 5, candidates = 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val all = c.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    queries.foreach { case (qid, q) =>
      val expect = all.toSeq.map { case (id, v) =>
        (id, q.zip(v).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum)
      }.sortBy { case (id, dd) => (dd, id) }.take(5).map(_._1)
      val got = rr.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(got == expect, s"q$qid rerank: $got vs $expect")
    }
  }

  test("completeStage picks the argmax residual — a delocalized complement (all |w_j| = 1/8) completes instead of crashing") {
    // 63 recorded rows of the order-64 Sylvester-Hadamard basis
    // (H[i][j] = (-1)^popcount(i&j), normalized by 1/8): the orthogonal
    // complement is row 0 = (1/8, ..., 1/8) — every standard basis
    // vector's CGS2 residual norm is exactly 1/8 = 0.125, UNDER the old
    // fixed 0.25 bar (the round-13 advisory crash input) but exactly the
    // 1/sqrt(d) floor the argmax pick is guaranteed
    val d = 64
    def had(i: Int, j: Int): Float =
      (if (java.lang.Integer.bitCount(i & j) % 2 == 0) 0.125f else -0.125f)
    val recorded = Array.tabulate(d - 1, d)((i, j) => had(i + 1, j))
    val w = ProductQuantizer.completeStage(recorded, d - 1, d, "spec")
    val n2 = w.map(x => x.toDouble * x.toDouble).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"completion must be unit norm: $n2")
    recorded.zipWithIndex.foreach { case (ev, i) =>
      val dot = w.zip(ev).map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(dot) < 1e-5, s"completion not orthogonal to row $i: $dot")
    }
    // deterministic: the complement is ±row0/|row0| up to sign; every
    // component must be ±0.125
    assert(w.forall(x => math.abs(math.abs(x) - 0.125f) < 1e-6f),
      s"expected the delocalized complement, got ${w.take(8).toSeq}...")
    // and a genuinely exhausted space still fails loudly: all 64 rows
    // recorded leaves residuals at rounding noise
    val full = Array.tabulate(d, d)((i, j) => had(i, j))
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.completeStage(full, d, d, "spec-full")
    }
    assert(e.getMessage.contains("degenerate"), e.getMessage)
  }
}
