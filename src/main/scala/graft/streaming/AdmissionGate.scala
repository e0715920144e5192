package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-trigger admission bounding for streaming query serving (round
  * 17): a stateful gate that admits at most `maxPerTrigger` query rows
  * into a trigger and DEFERS the overflow to subsequent triggers, so an
  * arriving query burst can never inflate the serving fold's
  * per-trigger state past what the executor heap holds. The measured
  * failure this closes: the lexical tier's first fold keeps one state
  * row per (window, query, candidate doc) — Σ df over the admitted
  * queries' terms — and 10³ stopword-laden queries landing in ONE
  * AvailableNow trigger blew a 28 GiB heap (BASELINE "Streaming hybrid
  * fusion"); the mitigation lived in the bench harness, not the
  * operator. This gate makes the bound first-class: burst arrival rate
  * and per-trigger memory decouple, whatever the source's batching.
  *
  * SHAPE: one flatMapGroupsWithState on a constant key (the admission
  * queue is a global decision; its state and traffic are query-sized —
  * rows, not candidates, so the single-task group is kilobytes/trigger).
  * Arrivals merge with the deferred buffer, sort by (event-ts, id) —
  * admission is OLDEST-FIRST, which keeps deferral watermark-safe: the
  * emitted stream's event times stay non-decreasing across triggers
  * (late ARRIVALS keep exactly the lateness risk they already had), so
  * a `withWatermark` placed downstream of the gate never sees a row
  * the gate itself made late. The first `maxPerTrigger` rows emit; the
  * rest wait in state and flush on the NEXT trigger that carries any
  * row — under a sustained burst (the scenario the gate exists for)
  * every trigger has arrivals, so the buffer drains continuously. The
  * gate deliberately uses NO state timeout: Spark's processing-time
  * timeout forces the engine to run no-data batches forever
  * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
  * unconditionally true under ProcessingTimeTimeout), which livelocks
  * drain-to-idle harnesses (processAllAvailable / AvailableNow). A
  * replay harness that must flush a tail after its last real row sends
  * `heartbeatId` rows — consumed un-admitted, they tick the engine.
  *
  * EXACTNESS: rows pass through the gate through Catalyst encoders —
  * ids, text, timestamps, and float vectors round-trip bit-exactly;
  * the serving results are the ungated results, just spread across
  * triggers (same windows — the window stamp derives from the row's
  * event time, which the gate never touches).
  *
  * Rows whose id equals `heartbeatId` are consumed by the gate without
  * being admitted — a drain device for sources that must tick the
  * engine to flush the buffer (tests, file-replay harnesses).
  */
/** The gate's canonical row shape (top-level: Catalyst codegen needs
  * public accessors on encoder targets).
  */
case class AdmissionRow(id: Long, text: String,
                        vec: Option[Seq[Float]], ts: Long)

/** Deferred-buffer state of [[AdmissionGate.perTrigger]]. */
case class AdmissionState(buf: Array[AdmissionRow])

object AdmissionGate {

  /** Gate a query stream carrying (`idCol` long, `textCol` string,
    * optionally `vecCol` array&lt;float&gt;, `tsCol` epoch-ns long) —
    * the lexical / hybrid serving shapes. Returns the same columns.
    */
  def perTrigger(queries: DataFrame, maxPerTrigger: Int,
                 idCol: String, textCol: String, tsCol: String,
                 vecCol: Option[String] = None,
                 heartbeatId: Long = Long.MinValue): DataFrame = {
    require(maxPerTrigger >= 1,
      s"maxPerTrigger must be >= 1: $maxPerTrigger")
    val spark = queries.sparkSession
    import spark.implicits._
    val vecExpr = vecCol match {
      case Some(v) => col(v).cast("array<float>")
      case None => lit(null).cast("array<float>")
    }
    val ds = queries.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"), vecExpr.as("vec"),
        col(tsCol).cast("long").as("ts"))
      .as[AdmissionRow]
    implicit val stateEnc = Encoders.product[AdmissionState]
    val gated = ds.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: Int, rows: Iterator[AdmissionRow], state: GroupState[AdmissionState]) => {
          val buffered = state.getOption.map(_.buf).getOrElse(
            Array.empty[AdmissionRow])
          val arrivals = rows.filter(_.id != heartbeatId).toArray
          val all = (buffered ++ arrivals).sortBy(r => (r.ts, r.id))
          val (emit, defer) = all.splitAt(maxPerTrigger)
          if (defer.nonEmpty) state.update(AdmissionState(defer))
          else if (state.exists) state.remove()
          emit.iterator
        })
    val out = gated.toDF()
      .select(col("id").as(idCol), col("text").as(textCol),
        col("vec").as("_vec"), col("ts").as(tsCol))
    vecCol match {
      case Some(v) => out.withColumnRenamed("_vec", v)
      case None => out.drop("_vec")
    }
  }
}
