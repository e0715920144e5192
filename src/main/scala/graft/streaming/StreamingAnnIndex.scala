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
    storeTx.appendOnce(rows.drop("err_micro").sort("cell"),
      tag = "ann-baseline")
    driftTx.appendOnce(
      partials(rows, errC, "baseline", "ann-baseline"),
      tag = "ann-drift-baseline")
    rows.unpersist()
    ()
  }

  /** Start (by default drain) the incremental maintainer: parquet
    * vector files under `vecsDir` → encoded store rows (exactly-once)
    * + per-batch drift partials. Append-only dirs only — the file
    * source keys processed files by path (the q147/runBank contract).
    */
  def run(spark: SparkSession, vecsDir: String,
          coarse: Seq[Seq[Float]], model: PQModel,
          storeTx: TxTable, driftTx: TxTable,
          checkpointDir: String, idCol: String = "vec_id",
          vecCol: String = "embedding", errC: Int = 128,
          availableNow: Boolean = true,
          maxFilesPerTrigger: Int = 1000,
          rotation: Option[Seq[Seq[Float]]] = None,
          int8Scale: Option[Float] = None): StreamingQuery = {
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
        storeTx.appendOnce(rows.drop("err_micro").sort("cell"),
          tag = s"ann-batch-$batchId")
        driftTx.appendOnce(partials(rows, errC, "stream", s"ann-batch-$batchId"),
          tag = s"ann-drift-$batchId")
        rows.unpersist()
        ()
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

  /** The retrain decision CLOSED INTO A LOOP: read the drift probe;
    * when the median per-cell drift exceeds `thresholdPermille`,
    * retrain the coarse cells + residual codebooks on the CURRENT
    * store's vectors (baseline ∪ arrivals — optionally hash-sampled,
    * the fit/fitOpq device) and bulk-load a FRESH store + baseline
    * partials into the new TxTables; the caller swaps serving to the
    * new tables at its convenience (the EventBank time-travel refresh
    * contract) and the probe starts over at parity. Returns the new
    * models, or None when drift is under the bar (nothing written).
    *
    * The threshold is a permille ratio of error medians — 2000 means
    * "the streamed median reconstruction error is 2× baseline", far
    * above the in-distribution parity band (~1000 ± a few %,
    * BASELINE's ann_store row) and far below a real shift (1.5M‰
    * measured) — the decision is not a judgment call on this
    * separation. Float-tier stores only (retraining needs vectors).
    */
  def retrainIfDrifted(storeTx: TxTable, driftTx: TxTable,
                       newStoreTx: TxTable, newDriftTx: TxTable,
                       cells: Int, m: Int, k: Int, iters: Int,
                       thresholdPermille: Long = 2000L,
                       sampleFraction: Double = 1.0,
                       errC: Int = 128)
      : Option[(Seq[Seq[Float]], PQModel)] = {
    import org.apache.spark.sql.functions.{col => c}
    val drifts = driftReport(driftTx, errC)
      .select(c("drift_permille")).collect()
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).sorted
    if (drifts.isEmpty || drifts(drifts.length / 2) <= thresholdPermille)
      return None
    val all = storeTx.read()
    require(all.columns.contains("vec"),
      "retrainIfDrifted needs the float tier ('vec') to retrain on")
    val vecs = all.select(c("vec_id"), c("vec").as("embedding"))
    val train = ProductQuantizer.sampleByHash(vecs, "vec_id", sampleFraction)
    val (coarse, _) = graft.operators.KMeans.fit(
      train, "vec_id", "embedding", cells, iters)
    val resid = graft.operators.KMeans
      .assign(train, "vec_id", "embedding", coarse)
      .withColumn("r", zip_with(c("embedding"),
        element_at(typedlit(coarse), c("cell") + 1), (x, y) => x - y))
      .select(c("vec_id"), c("r"))
    val pq = ProductQuantizer.fit(resid, "vec_id", "r", m, k, iters)
    bootstrap(vecs, "vec_id", "embedding", coarse, pq,
      newStoreTx, newDriftTx, errC)
    Some((coarse, pq))
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
