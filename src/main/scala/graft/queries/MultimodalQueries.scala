package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline queries beyond q35's metadata decode: feature
  * extraction (payload → fixed-dim float vector, the embedding-model
  * shape) and video frame sampling (payload → rows of frame binaries).
  * The codecs are deterministic stubs (container has no media libs);
  * the oracle mirrors them from the same md5-derived payload bytes, so
  * the whole Spark-side plumbing — binary columns, partition-local
  * batch decode, explode shape, schema — is hash-checked end to end.
  */
object MultimodalQueries {

  /** DuckDB: 16-bit big-endian word j of the md5(text) payload. */
  private def wordSql(j: Int) =
    s"('0x' || substr(md5(text), ${4 * j + 1}, 4))::BIGINT"

  val all: Seq[Q] = Seq(

    // ---- payload → 8-dim feature vector; exact per-dim doubles
    //      (integer word / 65535.0 is one IEEE division, engine-exact)
    Q("q54_multimodal_features", (s, dir) => {
      val withPayload = Multimodal.withSyntheticPayload(Tables.documents(s, dir))
      val feats = Multimodal.extractFeatures(s, withPayload, dim = 8).toDF()
      feats.select(col("doc_id") +:
        (0 until 8).map(j =>
          col("features")(j).cast("double").as(s"f$j")): _*)
    }, Some(s"""
      SELECT doc_id,
             ${(0 until 8).map(j =>
               s"CAST(CAST(${wordSql(j)} / 65535.0 AS FLOAT) AS DOUBLE) AS f$j")
               .mkString(",\n             ")}
      FROM documents""")),

    // ---- video payload → every-2nd 4-byte frame, one row per frame
    Q("q55_frame_sample", (s, dir) => {
      val vids = Multimodal.withSyntheticPayload(Tables.documents(s, dir))
        .filter(col("media_type") === "video")
      Multimodal.frameSample(s, vids, frameBytes = 4, everyN = 2).toDF()
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
                upper(hex(col("frame"))).as("frame_hex"))
    }, Some("""
      SELECT doc_id, (f - 1) * 2 AS frame_idx,
             upper(substr(md5(text), (f - 1) * 16 + 1, 8)) AS frame_hex
      FROM documents, unnest(range(1, 3)) AS t(f)
      WHERE doc_id % 3 = 2"""))
  )
}
