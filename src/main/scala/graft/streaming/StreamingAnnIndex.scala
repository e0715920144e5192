package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.bank.TxTable
import graft.operators.{ProductQuantizer, Sketches}
import graft.operators.ProductQuantizer.PQModel

/** Incremental maintenance for the IVFADC serving store — the q147
  * exactly-once machinery applied to ANN (round-12 verdict item):
  * arriving vectors are coarse-assigned + residual-PQ-encoded
  * SCAN-LOCALLY (a pure per-row projection against the broadcast
  * codebook literals — no shuffle, no streaming state) and committed
  * to a [[graft.bank.TxTable]] once per micro-batch via `appendOnce`'s
  * batchId tag, so `foreachBatch`'s at-least-once replays collapse to
  * exactly-once rows. Because the encode is a pure function of
  * (vector, coarse, model), the maintained store is row-identical to a
  * from-scratch [[ProductQuantizer.encodeIvfStore]] rebuild under ANY
  * batching — the property the q161 oracle pins.
  *
  * Layout: each batch is sorted by `cell` before the commit, so every
  * data file carries tight (cell) min/max row-group stats and a probe's
  * `cell IN (...)` filter skips non-probed row groups — the append-only
  * analog of the bulk store's `partitionBy("cell")` pruning (an
  * append-per-batch store cannot partition-by without rewriting
  * history; periodic `TxTable.compact()` keeps file counts flat, the
  * WaveBank contract).
  *
  * DRIFT PROBE: alongside the rows, each batch appends one per-cell
  * quantile-sketch partial (capacity `errC`) of the residual's PQ
  * reconstruction error (floor(err·1e6) — [[ProductQuantizer
  * .ivfCodeErr]]'s exactly-replayable statistic) into a second
  * TxTable, tagged with the same batchId. [[driftReport]] rolls the
  * partials up per cell (kilobytes — no store scan) and compares the
  * streamed error distribution against the `baseline` phase written at
  * bulk-load time: codebooks quantize what they were trained on, so a
  * distribution shift in arriving vectors shows up as the streamed
  * error quantiles drifting above baseline — the "retrain now" signal.
  * The partials are an OPERATIONAL estimate: a crash between the two
  * commits can drop one batch's partial (the store row commit is the
  * one that is exactly-once), and [[driftBackfill]] recomputes partials
  * from the store itself when the probe must be exact — the
  * lag-never-lie contract the WaveBank sidecar uses.
  */
object StreamingAnnIndex {

  /** Vector-file schema expected on the stream (under the caller's
    * column names — [[run]] builds it from its idCol/vecCol, so
    * non-default names actually work).
    */
  def vectorSchema(idCol: String = "vec_id",
                   vecCol: String = "embedding"): StructType =
    StructType.fromDDL(s"$idCol BIGINT, $vecCol ARRAY<FLOAT>")

  /** Store rows + error: (id, cell, codes, vec, err_micro) — ONE
    * primitive pass, [[ProductQuantizer.ivfCodeErr]]'s arithmetic
    * (shared with the bulk store, so the two can never diverge).
    * With a `rotation` (the OPQ serving shape) each vector rotates
    * FIRST, fused into the same pass — the stored `vec` is the
    * ROTATED vector, matching `encodeIvfStore(rotateVectors(...))`
    * row for row, so probe, rerank, and the drift statistic all live
    * in rotated space where the Ge §3 identity makes them exact.
    * With an `int8Scale` the rerank tier is stored SCALAR-QUANTIZED
    * (`vec8` BINARY, d bytes/row — the q165 tier maintained live,
    * matching `encodeIvfStoreInt8` row for row); the drift statistic
    * still comes from the full-precision residual, so probe quality
    * is independent of the storage tier.
    */
  private[graft] def encodeRows(df: DataFrame, idCol: String, vecCol: String,
                                coarse: Seq[Seq[Float]],
                                model: PQModel,
                                rotation: Option[Seq[Seq[Float]]] = None,
                                int8Scale: Option[Float] = None)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val coarseArr = coarse.map(_.toArray).toArray
    val cbArr = ProductQuantizer.toArrays(model.codebooks)
    val m = model.m
    val subDim = model.subDim
    val rot = rotation.map(_.map(_.toArray).toArray)
    val typed = df.select(col(idCol), col(vecCol)).as[(Long, Seq[Float])]
    def enc(v0: Seq[Float]): (Int, Array[Int], Long, Seq[Float]) = {
      val v: Seq[Float] = rot match {
        case Some(r) => ProductQuantizer.rotateArr(v0, r).toSeq
        case None => v0
      }
      val (cell, codes, err) =
        ProductQuantizer.ivfCodeErr(v, coarseArr, cbArr, m, subDim)
      (cell, codes, err, v)
    }
    int8Scale match {
      case None =>
        typed.mapPartitions(it => it.map { case (id, v0) =>
          val (cell, codes, err, v) = enc(v0)
          (id, cell, codes, v, err)
        }).toDF(idCol, "cell", "codes", "vec", "err_micro")
      case Some(sc) =>
        // the int8 serving tier maintained live: same quantization
        // arithmetic as encodeIvfStoreInt8, scale FIXED at bootstrap
        // (arrivals past the baseline max-abs clamp at ±127 — the
        // documented int8 contract; re-scale at retrain time)
        val scD = sc.toDouble
        typed.mapPartitions(it => it.map { case (id, v0) =>
          val (cell, codes, err, v) = enc(v0)
          (id, cell, codes, ProductQuantizer.quant8Arr(v, scD), err)
        }).toDF(idCol, "cell", "codes", "vec8", "err_micro")
    }
  }

  /** One quantile partial per cell over `rows`' err_micro, stamped
    * with the phase ("baseline" | "stream") and the batch tag.
    */
  private def partials(rows: DataFrame, errC: Int, phase: String,
                       tag: String): DataFrame =
    rows.groupBy("cell")
      .agg(Sketches.quantileSketch(col("err_micro"), errC).as("sk"))
      .withColumn("phase", lit(phase))
      .withColumn("src_tag", lit(tag))

  /** Bulk-load the store (the train-time corpus) and stamp the
    * BASELINE drift partials — the distribution the probe compares
    * against. Both commits are tagged, so a re-run is a no-op.
    */
  def bootstrap(corpus: DataFrame, idCol: String, vecCol: String,
                coarse: Seq[Seq[Float]], model: PQModel,
                storeTx: TxTable, driftTx: TxTable,
                errC: Int = 128,
                rotation: Option[Seq[Seq[Float]]] = None,
                int8Scale: Option[Float] = None): Unit = {
    // one encode feeds both commits (the run() device — a second full
    // encode pass at bulk-load size is real money at 10^6+)
    val rows = encodeRows(corpus, idCol, vecCol, coarse, model, rotation,
      int8Scale).localCheckpoint(true)
    // disjoint tables: the two commits' jobs overlap (guide §2.6)
    ParallelCommits.inParallel(
      storeTx.appendOnce(rows.drop("err_micro").sort("cell"),
        tag = "ann-baseline"),
      driftTx.appendOnce(
        partials(rows, errC, "baseline", "ann-baseline"),
        tag = "ann-drift-baseline"))
    rows.unpersist()
    ()
  }

  /** Start (by default drain) the incremental maintainer: parquet
    * vector files under `vecsDir` → encoded store rows (exactly-once)
    * + per-batch drift partials. Append-only dirs only — the file
    * source keys processed files by path (the q147/runBank contract).
    *
    * COMPACTION POLICY (`compactEvery` > 0, round 14): every N-th
    * micro-batch, after its commits land, the store is compacted with
    * a GLOBAL cell sort ([[graft.bank.TxTable.compact]]) and the drift
    * sidecar with a plain file-merge. A long-lived maintained store
    * otherwise accumulates one file set per batch whose cell ranges
    * all overlap (each batch is cell-sorted WITHIN itself), so a
    * probe's `cell IN (...)` touches every batch's files; the sorted
    * compact restores store-wide disjoint cell slices — file-level
    * pruning at partitionBy grade (BASELINE's ann_store row measures
    * the probe wall against batch count before/after). Content-neutral
    * and commit-atomic, so the maintained-≡-rebuilt invariant and the
    * appendOnce exactly-once tags are untouched; it runs INSIDE
    * foreachBatch (the single-writer seat), so no concurrent append
    * can land in the generation being replaced.
    */
  def run(spark: SparkSession, vecsDir: String,
          coarse: Seq[Seq[Float]], model: PQModel,
          storeTx: TxTable, driftTx: TxTable,
          checkpointDir: String, idCol: String = "vec_id",
          vecCol: String = "embedding", errC: Int = 128,
          availableNow: Boolean = true,
          maxFilesPerTrigger: Int = 1000,
          rotation: Option[Seq[Seq[Float]]] = None,
          int8Scale: Option[Float] = None,
          compactEvery: Int = 0): StreamingQuery = {
    val stream = spark.readStream
      .schema(vectorSchema(idCol, vecCol))
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(vecsDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = encodeRows(batch, idCol, vecCol, coarse, model,
          rotation, int8Scale)
          .localCheckpoint(true) // one encode feeds both commits
        ParallelCommits.inParallel(
          storeTx.appendOnce(rows.drop("err_micro").sort("cell"),
            tag = s"ann-batch-$batchId"),
          driftTx.appendOnce(
            partials(rows, errC, "stream", s"ann-batch-$batchId"),
            tag = s"ann-drift-$batchId"))
        rows.unpersist()
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          ParallelCommits.inParallel(
            storeTx.compact(Seq("cell")), driftTx.compact())
          ()
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** The drift probe: per-cell rollup of the persisted partials
    * (kilobytes in, one row per cell out — the store is never
    * scanned), baseline vs streamed phases side by side. Emits, per
    * cell: rows seen and the q-quantile of the error distribution for
    * each phase, plus `drift_permille` = ⌊1000·p_stream/p_base⌋
    * (1000 = parity; a planted distribution shift pushes it up — the
    * retrain signal; see the spec + BASELINE drift row for where the
    * bar belongs). Cells with no streamed rows yet carry nulls on the
    * stream side, never a fabricated parity.
    */
  def driftReport(driftTx: TxTable, errC: Int = 128,
                  q: Double = 0.5): DataFrame = {
    val rolled = driftTx.read()
      .groupBy("cell", "phase")
      .agg(Sketches.quantileMerge(col("sk"), errC).as("rsk"))
      .select(col("cell"), col("phase"),
        Sketches.quantileN(col("rsk")).as("n"),
        Sketches.quantileEstimate(col("rsk"), q).as("p"))
    val base = rolled.filter(col("phase") === "baseline")
      .select(col("cell"), col("n").as("n_base"), col("p").as("p_base"))
    val stream = rolled.filter(col("phase") === "stream")
      .select(col("cell"), col("n").as("n_stream"), col("p").as("p_stream"))
    val joined = base.join(stream, Seq("cell"), "full_outer")
    // the SECOND drift axis, free from the same partials: population
    // share per cell, stream vs baseline — arrivals CONCENTRATING in
    // few cells skew probe cost and starve the others' codebooks even
    // when per-vector error stays at parity. Totals via a window over
    // the per-cell frame (≤ cells rows — no extra scan of anything).
    val wAll = Window.partitionBy()
    joined
      .withColumn("_tb", sum(coalesce(col("n_base"), lit(0L))).over(wAll))
      .withColumn("_ts", sum(coalesce(col("n_stream"), lit(0L))).over(wAll))
      .select(col("cell"), col("n_base"), col("p_base"),
        col("n_stream"), col("p_stream"),
        // a zero-error baseline cell (tiny cell PQ-reconstructing
        // exactly) makes the ratio undefined — null, never
        // Infinity→Long.MaxValue (and the replay's CAST would error)
        when(col("p_base") > 0L,
          floor(col("p_stream") * 1000.0 / col("p_base")).cast("long"))
          .otherwise(lit(null).cast("long"))
          .as("drift_permille"),
        // share-of-stream over share-of-baseline, permille: 1000 =
        // the cell receives arrivals in proportion to its baseline
        // population; same null-not-Infinity contract
        when(col("n_base") > 0L && col("_ts") > 0L,
          floor(col("n_stream") * 1000.0 * col("_tb")
            / (col("_ts").cast("double") * col("n_base"))).cast("long"))
          .otherwise(lit(null).cast("long"))
          .as("pop_permille"))
  }

  /** A fired retrain's result: the retrained models PLUS the tier
    * configuration the fresh store was bootstrapped with. Returning
    * the rotation / scale makes the serving contract EXPLICIT (the
    * round-13 advisory: a rotated-space model with no rotation
    * attached invites raw-space queries with no error): future
    * arrivals maintain the new store via [[run]] with exactly these
    * `rotation` / `int8Scale` values, and serving queries rotate by
    * `rotation` (when set) before probing.
    */
  final case class RetrainedModels(coarse: Seq[Seq[Float]], pq: PQModel,
                                   rotation: Option[Seq[Seq[Float]]] = None,
                                   int8Scale: Option[Float] = None)

  /** The retrain decision CLOSED INTO A LOOP, across the full tier
    * matrix (plain float, OPQ-rotated, int8, and their composition):
    * read the drift probe; when it fires, rebuild every model the
    * store serves with — rotation (OPQ stores), coarse cells, residual
    * codebooks, and int8 scale — from the CURRENT store's rows alone
    * (baseline ∪ arrivals), and bulk-load a FRESH store + baseline
    * partials into the new TxTables. The caller swaps serving to the
    * new tables at its convenience ([[AnnGenerations]] makes that swap
    * a crash-safe pointer publish) and the probe starts over at
    * parity. Returns the new models + tier config, or None when drift
    * is under both bars (nothing written).
    *
    * DECISION — two axes from the same kilobyte partials:
    *   - error: fire when the MEDIAN across cells of `drift_permille`
    *     at per-cell error quantile `decisionQuantile` exceeds
    *     `thresholdPermille`. 2000 means "streamed reconstruction
    *     error is 2× baseline at that quantile", far above the parity
    *     band (~1000 ± a few %, BASELINE's ann_store row) and far
    *     below a real shift (1.5M‰ measured). The DEFAULT quantile is
    *     the median; pass 0.95 to catch a drifted SUBPOPULATION — a
    *     20% slice of arrivals off-distribution leaves every cell's
    *     p50 at parity while its p95 sits in the shifted tail
    *     (spec-pinned: p50 misses it, p95 fires).
    *   - population: fire when ANY cell's `pop_permille` exceeds
    *     `popBarPermille` (default 4000 = a cell receiving 4× its
    *     proportional share) — arrival concentration starves the other
    *     cells' codebooks and skews probe cost even at error parity.
    *     None disables the axis. Tiny cells make the ratio noisy; the
    *     bar is per-store tuning, not a universal constant.
    *
    * TIERS — the store is the only input, so each tier reconstructs
    * its training corpus from what the store holds:
    *   - float (`vec`): used as-is.
    *   - int8 (`vec8`, pass the store's `int8Scale`): DEQUANTIZED
    *     (v8·s/127 per component, float32) — carries ≤ s/254-per-dim
    *     quantization noise into training, orders under codebook cell
    *     radii (recall parity measured in BASELINE); the new scale is
    *     recomputed from the dequantized corpus (the documented
    *     "re-scale at retrain time" contract) and the fresh tier is
    *     quantized with it.
    *   - OPQ (pass the store's `rotation`): stored vectors live in
    *     rotated space, so they are UNROTATED through Rᵀ (orthonormal
    *     inverse; float32 round-trip noise ~1e-7), the rotation is
    *     REFIT with the non-parametric alternation
    *     ([[ProductQuantizer.fitOpqNp]] — Ge §4.2, exactly replayable)
    *     on the recovered corpus, and coarse + residual codebooks
    *     train in the NEW rotated space (the q166 composition).
    * Every step is a deterministic defined-order fold, so a DuckDB
    * oracle replays both retrained stores from the union corpus alone
    * (q169/q170) exactly as q168 replays the float tier.
    */
  def retrainIfDrifted(storeTx: TxTable, driftTx: TxTable,
                       newStoreTx: TxTable, newDriftTx: TxTable,
                       cells: Int, m: Int, k: Int, iters: Int,
                       thresholdPermille: Long = 2000L,
                       sampleFraction: Double = 1.0,
                       errC: Int = 128,
                       idCol: String = "vec_id",
                       decisionQuantile: Double = 0.5,
                       popBarPermille: Option[Long] = Some(4000L),
                       rotation: Option[Seq[Seq[Float]]] = None,
                       int8Scale: Option[Float] = None,
                       opqPowerIters: Int = 32,
                       opqAlternations: Int = 1)
      : Option[RetrainedModels] = {
    import org.apache.spark.sql.functions.{col => c}
    val spark = storeTx.read().sparkSession
    import spark.implicits._
    val rep = driftReport(driftTx, errC, q = decisionQuantile)
      .select(c("drift_permille"), c("pop_permille")).collect()
    val drifts = rep.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .sorted
    val pops = rep.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    val errFired = drifts.nonEmpty &&
      drifts(drifts.length / 2) > thresholdPermille
    val popFired = popBarPermille.exists(bar => pops.exists(_ > bar))
    if (!errFired && !popFired) return None

    val all = storeTx.read()
    // 1. reconstruct a float corpus from the store's own tier
    val floats: DataFrame = int8Scale match {
      case None =>
        require(all.columns.contains("vec"),
          "retrainIfDrifted: store has no float tier ('vec') — an int8 " +
            "store needs its int8Scale passed so the tier can dequantize")
        all.select(c(idCol), c("vec").as("embedding"))
      case Some(sc) =>
        require(all.columns.contains("vec8"),
          "retrainIfDrifted: int8Scale passed but the store has no 'vec8' " +
            "tier")
        val inv = sc.toDouble / 127.0
        all.select(c(idCol), c("vec8")).as[(Long, Array[Byte])]
          .mapPartitions(it => it.map { case (id, b) =>
            val out = new Array[Float](b.length)
            var i = 0
            while (i < b.length) { out(i) = (b(i) * inv).toFloat; i += 1 }
            (id, out.toSeq)
          }).toDF(idCol, "embedding")
    }
    // 2. back to ORIGINAL space when the store is rotation-fused
    //    (orthonormal R: inverse = transpose; same rotate arithmetic)
    val vecs = rotation match {
      case None => floats
      case Some(rot) =>
        ProductQuantizer.rotateVectors(floats, idCol, "embedding",
            rot.transpose.map(_.toSeq).toSeq)
          .withColumnRenamed("remb", "embedding")
    }
    // 3. refit the rotation (OPQ stores) on the recovered corpus
    val newRot: Option[Seq[Seq[Float]]] = rotation.map { _ =>
      ProductQuantizer.fitOpqNp(vecs, idCol, "embedding", m,
        k = k, iters = iters, powerIters = opqPowerIters,
        alternations = opqAlternations,
        sampleFraction = sampleFraction).rotation
    }
    val work = newRot match {
      case None => vecs
      case Some(r2) =>
        ProductQuantizer.rotateVectors(vecs, idCol, "embedding", r2)
          .withColumnRenamed("remb", "embedding")
    }
    // 4. coarse cells + residual codebooks in the (new) serving space
    val train = ProductQuantizer.sampleByHash(work, idCol, sampleFraction)
    val (coarse, _) = graft.operators.KMeans.fit(
      train, idCol, "embedding", cells, iters)
    val resid = graft.operators.KMeans
      .assign(train, idCol, "embedding", coarse)
      .withColumn("r", zip_with(c("embedding"),
        element_at(typedlit(coarse), c("cell") + 1), (x, y) => x - y))
      .select(c(idCol), c("r"))
    val pq = ProductQuantizer.fit(resid, idCol, "r", m, k, iters)
    // 5. re-scale at retrain time (int8 stores): max-abs of the vectors
    //    as STORED (post-rotation), the quantity the tier clamps against
    val newScale = int8Scale.map(_ =>
      ProductQuantizer.int8Scale(work, "embedding"))
    bootstrap(vecs, idCol, "embedding", coarse, pq,
      newStoreTx, newDriftTx, errC, rotation = newRot,
      int8Scale = newScale)
    Some(RetrainedModels(coarse, pq, newRot, newScale))
  }

  /** The loop composed end to end over a generation pointer
    * ([[AnnGenerations]]): resolve the CURRENT generation, retrain
    * into a fresh UNPUBLISHED one, and swap the pointer only when the
    * retrain fired — the crash-safe serving swap q168 left to "the
    * caller's convenience". A crash before publish leaves serving on
    * the old generation with the new one as invisible garbage; a crash
    * after publish leaves the swap complete — there is no torn state.
    * Returns (published generation, models) when fired; None (nothing
    * written, pointer untouched) under parity.
    */
  def retrainAndSwap(gens: AnnGenerations,
                     cells: Int, m: Int, k: Int, iters: Int,
                     thresholdPermille: Long = 2000L,
                     sampleFraction: Double = 1.0,
                     errC: Int = 128,
                     idCol: String = "vec_id",
                     decisionQuantile: Double = 0.5,
                     popBarPermille: Option[Long] = Some(4000L),
                     rotation: Option[Seq[Seq[Float]]] = None,
                     int8Scale: Option[Float] = None,
                     opqPowerIters: Int = 32,
                     opqAlternations: Int = 1)
      : Option[(Long, RetrainedModels)] = {
    val (_, storeTx, driftTx) = gens.current().getOrElse(
      throw new IllegalArgumentException(
        "retrainAndSwap needs a published generation — bootstrap into " +
          "gens.next() and publish it first"))
    val (gen2, newStore, newDrift) = gens.next()
    retrainIfDrifted(storeTx, driftTx, newStore, newDrift,
      cells, m, k, iters, thresholdPermille, sampleFraction, errC,
      idCol, decisionQuantile, popBarPermille, rotation, int8Scale,
      opqPowerIters, opqAlternations).map { rm =>
      gens.publish(gen2)
      (gen2, rm)
    }
  }

  /** Exact recomputation of ONE consolidated partial set from the
    * store rows themselves (an O(store) scan — the backfill path when
    * a crash between the two batch commits left the estimate short;
    * results come from the store, the probe only ever lags).
    * `phase` tags which side of [[driftReport]] the rebuilt partials
    * feed. Vectors re-encode through the same [[ProductQuantizer
    * .ivfCodeErr]] arithmetic, so the rebuilt statistic is identical
    * to what the inline partials summarized. No rotation parameter:
    * an OPQ store's `vec` column is ALREADY rotated (encode fuses the
    * rotation), so the backfill re-encodes it directly. Float-tier
    * stores only: an int8 store's dequantized vectors would yield a
    * DIFFERENT error statistic than the inline partials summarized —
    * refused loudly rather than silently biased.
    */
  def driftBackfill(storeTx: TxTable, coarse: Seq[Seq[Float]],
                    model: PQModel, phase: String,
                    idCol: String = "vec_id",
                    errC: Int = 128): DataFrame = {
    val all = storeTx.read()
    require(all.columns.contains("vec"),
      "driftBackfill needs the float tier ('vec'): an int8 store's " +
        "dequantized vectors would bias the error statistic — keep the " +
        "inline partials or rebuild from source vectors")
    val rows = all.select(col(idCol), col("vec"))
    partials(encodeRows(rows, idCol, "vec", coarse, model),
      errC, phase, "backfill")
  }
}
