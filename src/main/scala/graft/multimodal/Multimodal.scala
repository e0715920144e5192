package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata extracted by a
  * partition-local decoder.
  *
  * The real decode (libjpeg/ffmpeg/...) is NOT available in this
  * container, so `decodeStub` derives deterministic fake metadata from
  * the payload's leading bytes — clearly marked; swap `decodeStub` for
  * a real codec binding in production. Everything around it — the
  * binary schema, the `mapPartitions` batch shape (decoder init once
  * per partition, like a Pandas-UDF batch), partition sizing — is the
  * real pipeline and is what gets tested.
  */
object Multimodal {

  case class MediaMeta(width: Long, height: Long, n_bytes: Long)
  case class DecodedRow(doc_id: Long, media_type: String,
                        width: Long, height: Long, n_bytes: Long)

  /** STUB decoder: reads "dimensions" from the first four payload
    * bytes, big-endian 16-bit each — a stand-in for a header parse.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    def u(i: Int): Long =
      if (i < bytes.length) bytes(i).toLong & 0xFFL else 0L // short payloads → 0 dims
    MediaMeta(
      width = (u(0) << 8) | u(1),
      height = (u(2) << 8) | u(3),
      n_bytes = bytes.length.toLong)
  }

  /** Decode metadata for a DataFrame with (doc_id: long, media_type:
    * string, payload: binary). Partition-local: the decoder is
    * instantiated once per partition and streams rows — the shape a
    * native codec binding needs (batch init cost amortized, no
    * per-row JNI setup).
    */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    df.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec handle)
        it.map { case (id, mt, payload) =>
          val m = decodeStub(payload)
          DecodedRow(id, mt, m.width, m.height, m.n_bytes)
        }
      }
  }

  /** Attach a synthetic binary payload (md5 of the text) to documents —
    * the driver tables carry no real media; the payload path (binary
    * column through shuffle/parquet) is exercised for real.
    */
  def withSyntheticPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      unhex(md5(col("text"))).as("payload"))
}
