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

  /** Pluggable payload decoder. Implementations ship to executors
    * (Serializable) and get a per-partition lifecycle: `open()` once
    * before a partition's rows, `decode` per row, `close()` registered
    * as a task-completion listener — the shape a native codec binding
    * (JNI handle, ONNX session, ffmpeg context) needs, with init cost
    * amortized across the batch.
    *
    * Instances are created PER PARTITION from a factory
    * ([[decodeMeta]]'s `decoder` parameter), so an implementation may
    * hold non-thread-safe native state: parallel partitions on one
    * executor each get their own instance. The bundled stateless
    * decoders expose singletons behind `() => ...` factories.
    */
  trait Decoder extends Serializable {
    /** Per-partition init (codec handles, caches). */
    def open(): Unit = ()
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta
    /** Per-partition teardown; called once when the rows are drained. */
    def close(): Unit = ()
  }

  /** STUB decoder (default): reads "dimensions" from the first four
    * payload bytes, big-endian 16-bit each — a stand-in for a header
    * parse. The driver tables carry synthetic payloads, so the stub is
    * what the oracle queries (q35/q54/q55) pin.
    */
  object StubDecoder extends Decoder {
    override def decode(mediaType: String, bytes: Array[Byte]): MediaMeta =
      decodeStub(bytes)
  }

  /** Real image decoder on the JDK's own codecs (`javax.imageio`:
    * PNG/JPEG/GIF/BMP — no external deps, works headless). Non-image
    * payloads and undecodable bytes fall back to the stub so a mixed
    * media column never throws mid-partition.
    */
  object ImageIoDecoder extends Decoder {
    override def open(): Unit =
      // no disk-backed stream cache: decode is in-memory per row, and
      // executor temp-dir churn at scale is pure overhead
      javax.imageio.ImageIO.setUseCache(false)
    override def decode(mediaType: String, bytes: Array[Byte]): MediaMeta =
      if (mediaType == "image") {
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        } catch {
          // NonFatal, not just IOException: a corrupt header can drive a
          // codec plugin into ArrayIndexOutOfBounds/NegativeArraySize —
          // the drop-undecodable-rows policy must hold for those too
          case scala.util.control.NonFatal(_) => null
        }
        if (img == null) decodeStub(bytes)
        else MediaMeta(img.getWidth.toLong, img.getHeight.toLong,
          bytes.length.toLong)
      } else decodeStub(bytes)
  }

  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    def u(i: Int): Long =
      if (i < bytes.length) bytes(i).toLong & 0xFFL else 0L // short payloads → 0 dims
    MediaMeta(
      width = (u(0) << 8) | u(1),
      height = (u(2) << 8) | u(3),
      n_bytes = bytes.length.toLong)
  }

  /** Decode metadata for a DataFrame with (doc_id: long, media_type:
    * string, payload: binary). Partition-local: a fresh decoder is
    * built from the factory and opened once per partition.
    *
    * `close()` is registered via `TaskContext.addTaskCompletionListener`
    * rather than hung off iterator exhaustion: a downstream
    * `limit`/`take` never drains the iterator and a task failure never
    * reaches its end, but the completion listener fires on success,
    * early exit, AND failure — so a real native handle cannot leak.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame,
                 decoder: () => Decoder = () => StubDecoder): Dataset[DecodedRow] = {
    import spark.implicits._
    df.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder()
        d.open()
        org.apache.spark.TaskContext.get()
          .addTaskCompletionListener[Unit](_ => d.close())
        it.map { case (id, mt, payload) =>
          val m = d.decode(mt, payload)
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

  case class FeatureRow(doc_id: Long, features: Array[Float])
  case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  case class ResizedRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** STUB feature extractor: 8 features from consecutive 16-bit
    * big-endian words of the payload, scaled to [0, 1] — a stand-in
    * for an image/audio embedding model. Output shape (fixed-dim
    * `Array[Float]`) feeds [[graft.operators.Similarity]] directly.
    */
  def featureStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    def u(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else 0
    Array.tabulate(dim)(j => (((u(2 * j) << 8) | u(2 * j + 1)) / 65535.0).toFloat)
  }

  /** Payload → fixed-dim feature vector, partition-local ("model"
    * loaded once per partition — the real pipeline would hold an ONNX/
    * JNI handle there; batch shape identical).
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      dim: Int = 8): Dataset[FeatureRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model init would go here
        it.map { case (id, p) => FeatureRow(id, featureStub(p, dim)) }
      }
  }

  /** STUB frame sampler: the payload splits into fixed 4-byte "frames";
    * every `everyN`-th frame is kept, exploded one row per frame — the
    * video-keyframe-sampling shape (binary → rows of binary).
    */
  def frameSample(spark: SparkSession, df: DataFrame,
                  frameBytes: Int = 4, everyN: Int = 2): Dataset[FrameRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        (0 until p.length / frameBytes).iterator
          .filter(_ % everyN == 0)
          .map(i => FrameRow(id, i, p.slice(i * frameBytes, (i + 1) * frameBytes)))
      }
  }

  /** STUB resize: rewrites the 4 header "dimension" bytes (the ones
    * [[decodeStub]] reads) and keeps the body — binary → binary, the
    * thumbnailing shape. Round-trips: decodeStub(resize(p, w, h)) =
    * (w, h, n_bytes).
    */
  def resize(spark: SparkSession, df: DataFrame,
             width: Int, height: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    df.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, p) =>
          val out = java.util.Arrays.copyOf(p, math.max(p.length, 4))
          out(0) = ((width >> 8) & 0xFF).toByte
          out(1) = (width & 0xFF).toByte
          out(2) = ((height >> 8) & 0xFF).toByte
          out(3) = (height & 0xFF).toByte
          ResizedRow(id, mt, out)
        }
      }
  }

  case class PHashRow(doc_id: Long, phash: Long)

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual-hash construction (public algorithm; obsplus has no
    * image operators — this extends the engine's dedup pillar to the
    * multimodal column type): area-average the image down to a
    * (cols+1)×rows integer-luma grid, then emit one bit per horizontal
    * gradient sign. Brightness/contrast shifts move all lumas together
    * and leave gradient SIGNS mostly intact, so near-identical images
    * land within a few Hamming bits of each other.
    *
    * Deterministic by construction: integer luma `(299r+587g+114b)/1000`
    * and integer block averaging — no float resampling, no platform
    * Graphics2D — so an oracle can recompute the hash from pixel
    * formulas exactly. An image already at (cols+1)×rows hashes its
    * raw pixels (each block is one pixel).
    */
  def dHash(img: java.awt.image.BufferedImage,
            cols: Int = 8, rows: Int = 8): Long = {
    require(cols >= 1 && rows >= 1 && cols * rows <= 64,
      s"dHash grid $cols x $rows exceeds 64 bits")
    val w = img.getWidth; val h = img.getHeight
    val gw = cols + 1
    val gray = Array.ofDim[Long](rows, gw)
    var gy = 0
    while (gy < rows) {
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        val y0 = gy * h / rows; val y1 = math.max(y0 + 1, (gy + 1) * h / rows)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sum += (299L * r + 587L * g + 114L * b) / 1000L
            n += 1; x += 1
          }
          y += 1
        }
        gray(gy)(gx) = sum / n
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < rows) {
      var gx = 0
      while (gx < cols) {
        if (gray(gy)(gx + 1) > gray(gy)(gx)) hash |= 1L << (gy * cols + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Perceptual hash per image payload, partition-local through the
    * same decode lifecycle as [[decodeMeta]] (real `javax.imageio`
    * decode — PNG/JPEG/GIF/BMP; codec cache off, batch-amortized).
    * Undecodable payloads are DROPPED (flatMap), not hashed: a garbage
    * hash would silently pollute near-dup buckets, while a dropped row
    * surfaces in the row count.
    */
  def perceptualHash(spark: SparkSession, df: DataFrame,
                     cols: Int = 8, rows: Int = 8): Dataset[PHashRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, p) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          } catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) None else Some(PHashRow(id, dHash(img, cols, rows)))
        }
      }
  }

  /** Image near-dup pairs: [[perceptualHash]] signatures fed through
    * the SAME banded-Hamming blocking as text SimHash
    * ([[graft.operators.Dedup.simhashPairs]]) — no new join topology;
    * the scale properties (bucket-local candidates, no self-join,
    * capacity ceiling ~10⁶ docs per the simhashPairs note) carry over
    * unchanged. With `maxHamming < bands` the pigeonhole guarantee
    * makes recall exact: every pair within the threshold shares a full
    * band. Returns (a, b, hamming) with a < b.
    */
  def imageNearDupPairs(spark: SparkSession, df: DataFrame,
                        maxHamming: Int = 3, bands: Int = 4,
                        bandBits: Int = 16): DataFrame =
    graft.operators.Dedup.simhashPairs(
      perceptualHash(spark, df).toDF()
        .withColumnRenamed("phash", "simhash"),
      "doc_id", maxHamming, bands, bandBits)

  /** End-to-end image dedup: [[imageNearDupPairs]] → connected
    * components ([[graft.operators.Dedup.connectedComponents]], the
    * O(log²)-round star contraction) → one KEEPER per component (the
    * min doc_id; for quality-aware canonical selection join the
    * labels against a quality frame — the q75 pattern for text).
    * Returns (doc_id, component, is_keeper 1/0) for EVERY input image
    * rather than just the survivors — the decision stays auditable,
    * and the keep-projection is one filter. Undecodable payloads
    * carry no hash, join no pairs, and survive as their own keeper.
    */
  def dedupImages(spark: SparkSession, df: DataFrame,
                  maxHamming: Int = 3, bands: Int = 4,
                  bandBits: Int = 16): DataFrame = {
    val pairs = imageNearDupPairs(spark, df, maxHamming, bands, bandBits)
    val labels = graft.operators.Dedup.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    df.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("is_keeper",
        (col("component") === col("doc_id")).cast("long"))
  }

  /** Partition sizing for decode jobs: repartition so each task holds
    * roughly `targetBytes` of payload. Decode is CPU-bound per byte —
    * row-count-based splits mis-size badly when payloads are skewed
    * (one 4 GB video vs thousands of thumbnails).
    */
  def repartitionForDecode(df: DataFrame, targetBytes: Long): DataFrame = {
    val total = df.select(coalesce(sum(length(col("payload")).cast("long")), lit(0L)))
      .head.getLong(0)
    // ceiling division: flooring would let a task hold up to 2× the
    // target (total = 2·target − 1 → one oversized partition)
    val t = math.max(1L, targetBytes)
    val parts = math.max(1L, (total + t - 1) / t).toInt
    df.repartition(parts)
  }

  // ==================================================================
  // Audio: real WAV codec on the JDK (`javax.sound.sampled`) — the
  // audio leg of the multimodal pillar. obsplus has no audio operators
  // (its waveform domain is seismic miniSEED); this extends the
  // engine's decode→feature→fingerprint→near-dup lifecycle to a second
  // real media codec, reusing the image family's partition-local batch
  // shape and the SimHash banded-Hamming blocking unchanged.
  // ==================================================================

  /** Encode 16-bit signed PCM mono as a RIFF/WAVE container (the
    * public WAV layout: RIFF header, fmt chunk, data chunk, samples
    * little-endian). Values are clamped to the 16-bit range. Used by
    * tests/oracle fixtures to build REAL files that the JDK codec then
    * decodes — the decode path under test is `javax.sound`, not this.
    */
  def encodeWav16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)            // PCM
      .putShort(1.toShort)            // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2.toShort)            // block align
      .putShort(16.toShort)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** Direct RIFF/WAVE chunk walk for PCM 8/16-bit mono — the hot-path
    * decode. `AudioSystem.getAudioInputStream` costs ~100 µs/call in
    * SPI probing (measured: 10.3k clips/s at 10⁶ — overhead-bound, not
    * IO-bound), which at 10⁹ clips is pure tax; WAV PCM is a public
    * fixed layout the engine can parse directly, exactly as it already
    * hand-parses miniSEED/SEED frames. Anything that is not a plain
    * PCM WAV falls through to the JDK codec in [[decodeAudio]].
    */
  private def parseWavPcm(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    if (bytes.length < 44 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return None
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    var off = 12
    var sampleRate = -1; var bits = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val size = u32(off + 4).toInt
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (bytes(off) == 'f' && bytes(off + 1) == 'm' &&
          bytes(off + 2) == 't' && bytes(off + 3) == ' ') {
        if (size < 16) return None
        fmtOk = u16(off + 8) == 1 && u16(off + 10) == 1 // PCM, mono
        sampleRate = u32(off + 12).toInt
        bits = u16(off + 22)
      } else if (bytes(off) == 'd' && bytes(off + 1) == 'a' &&
          bytes(off + 2) == 't' && bytes(off + 3) == 'a') {
        dataOff = off + 8; dataLen = size
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || (bits != 8 && bits != 16)) return None
    val out =
      if (bits == 16) {
        val n = dataLen / 2
        val arr = new Array[Int](n)
        var i = 0
        while (i < n) {
          arr(i) = ((bytes(dataOff + 2 * i) & 0xFF) |
            (bytes(dataOff + 2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        arr
      } else {
        // 8-bit WAV is unsigned by the format's convention
        val arr = new Array[Int](dataLen)
        var i = 0
        while (i < dataLen) { arr(i) = (bytes(dataOff + i) & 0xFF) - 128; i += 1 }
        arr
      }
    Some((sampleRate, out))
  }

  /** Decode an audio payload: plain PCM WAV takes the direct chunk
    * parse ([[parseWavPcm]] — same public layout, none of the SPI
    * overhead); everything else goes through the REAL JDK codec
    * (`AudioSystem.getAudioInputStream` — AIFF/AU/esoteric WAVs; an
    * ffmpeg/JNI binding would slot in at the same seam for compressed
    * formats). Returns (sampleRate, samples) for 8/16-bit mono PCM,
    * honoring the container's declared endianness and signedness;
    * None for anything undecodable — callers DROP such rows rather
    * than hash garbage, same policy as the image family. The two
    * paths are cross-checked sample-exact in MultimodalSpec.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    val fast = parseWavPcm(bytes)
    if (fast.isDefined) return fast
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ok = fmt.getChannels == 1 && (bits == 16 || bits == 8) &&
          (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
           enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        if (!ok) None
        else {
          val raw = in.readAllBytes()
          val signed =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val out =
            if (bits == 16) {
              val n = raw.length / 2
              val arr = new Array[Int](n)
              val big = fmt.isBigEndian
              var i = 0
              while (i < n) {
                val b0 = raw(2 * i) & 0xFF; val b1 = raw(2 * i + 1) & 0xFF
                val u = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                arr(i) = if (signed) u.toShort.toInt else u - 32768
                i += 1
              }
              arr
            } else {
              val arr = new Array[Int](raw.length)
              var i = 0
              while (i < raw.length) {
                arr(i) = if (signed) raw(i).toInt else (raw(i) & 0xFF) - 128
                i += 1
              }
              arr
            }
          Some((math.round(fmt.getSampleRate).toInt, out))
        }
      } finally in.close()
    } catch {
      // NonFatal (not just UnsupportedAudioFile/IO): a malformed AIFF/AU
      // payload can make a javax.sound SPI reader throw a runtime
      // exception from a corrupt header — those rows must follow the same
      // drop-undecodable policy instead of failing the scan task
      case scala.util.control.NonFatal(_) => None
    }
  }

  case class AudioFeatRow(doc_id: Long, n_samples: Long, sample_rate: Long,
                          peak: Long, zero_crossings: Long, energy: Long)

  /** Audio feature extraction: payload → (n_samples, sample_rate,
    * peak |amplitude|, zero-crossing count, total energy Σs²) through
    * the real JDK decode, partition-local like [[decodeMeta]]. All
    * features are INTEGER arithmetic on the decoded PCM — an oracle
    * recomputes them exactly from the synthesis formula, and at scale
    * nothing depends on float summation order. Undecodable payloads
    * are dropped (flatMap): a zeroed feature row would silently skew
    * any downstream statistic, while a dropped row shows in counts.
    */
  def audioFeatures(spark: SparkSession, df: DataFrame): Dataset[AudioFeatRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          decodeAudio(p).map { case (sr, s) =>
            var peak = 0L; var zc = 0L; var en = 0L
            var i = 0
            while (i < s.length) {
              val v = s(i).toLong
              val a = math.abs(v)
              if (a > peak) peak = a
              if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
              en += v * v
              i += 1
            }
            AudioFeatRow(id, s.length.toLong, sr.toLong, peak, zc, en)
          }
        }
      }
  }

  /** 64-bit energy-gradient audio fingerprint — the dHash construction
    * transplanted to PCM (public idea: Haitsma–Kalker / Shazam-family
    * fingerprints threshold energy DIFFERENCES because gain shifts move
    * all energies together but leave difference signs intact; this is
    * the 1-D time-domain variant). The first `65·blockSize` samples
    * split into 65 blocks; block energy e(b) = Σ s² over the block
    * (blocks past the end are silence, energy 0); bit b of the hash is
    * set iff e(b+1) > e(b). Integer throughout — an oracle recomputes
    * it exactly — and one bit's support is 2·blockSize samples, so a
    * local edit flips at most 2 bits (the planted-pair bound the
    * banded blocking's pigeonhole guarantee needs).
    */
  def audioFingerprint64(samples: Array[Int], blockSize: Int = 4): Long = {
    val e = new Array[Long](65)
    var b = 0
    while (b < 65) {
      var i = b * blockSize
      val end = math.min(samples.length, (b + 1) * blockSize)
      var sum = 0L
      while (i < end) { val v = samples(i).toLong; sum += v * v; i += 1 }
      e(b) = sum
      b += 1
    }
    var hash = 0L
    b = 0
    while (b < 64) {
      if (e(b + 1) > e(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  case class AFingerRow(doc_id: Long, afp: Long)

  /** Fingerprint per audio payload through the real decode lifecycle;
    * undecodable payloads dropped (see [[audioFeatures]]).
    */
  def audioFingerprints(spark: SparkSession, df: DataFrame,
                        blockSize: Int = 4): Dataset[AFingerRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          decodeAudio(p).map { case (_, s) =>
            AFingerRow(id, audioFingerprint64(s, blockSize))
          }
        }
      }
  }

  /** Audio near-dup pairs: [[audioFingerprints]] through the SAME
    * banded-Hamming blocking as text SimHash and image dHash
    * ([[graft.operators.Dedup.simhashPairs]]) — third signature family
    * on one join topology; the scale properties (bucket-local
    * candidates, no self-join) carry over unchanged. With
    * `maxHamming < bands` pigeonhole recall is exact. Returns
    * (a, b, hamming) with a < b.
    */
  def audioNearDupPairs(spark: SparkSession, df: DataFrame,
                        maxHamming: Int = 3, bands: Int = 4,
                        bandBits: Int = 16): DataFrame =
    graft.operators.Dedup.simhashPairs(
      audioFingerprints(spark, df).toDF()
        .withColumnRenamed("afp", "simhash"),
      "doc_id", maxHamming, bands, bandBits)

  /** End-to-end audio dedup: pairs → connected components → min-id
    * keeper per component — [[dedupImages]]'s contract for the audio
    * signature (every input row labeled, undecodable rows their own
    * keeper).
    */
  def dedupAudio(spark: SparkSession, df: DataFrame,
                 maxHamming: Int = 3, bands: Int = 4,
                 bandBits: Int = 16): DataFrame = {
    val pairs = audioNearDupPairs(spark, df, maxHamming, bands, bandBits)
    val labels = graft.operators.Dedup.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    df.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("is_keeper",
        (col("component") === col("doc_id")).cast("long"))
  }

  // ==================================================================
  // VIDEO (round 10): intra-only motion-PNG container — the MJPEG
  // construction with the codec this container actually has. Every
  // frame is an independently-coded still (real `javax.imageio`
  // decode, the q104 codec), length-prefixed inside a 4-byte-magic
  // wrapper; no inter-frame prediction, so frame extraction is a
  // linear walk and each frame rides the EXISTING image machinery.
  // The video signature is the per-bit MAJORITY over the frames'
  // dHashes (the SimHash construction one level up): an edit that
  // re-encodes or perturbs ONE frame moves ≤ its dHash delta votes,
  // so near-dup videos land within a few Hamming bits while unrelated
  // 64-bit signatures sit at ~32 — the same contract as the image and
  // audio families, on the same banded blocking.
  // ==================================================================

  private val MotionPngMagic = Array[Byte]('G', 'M', 'P', '1')

  /** Length-prefixed frame container: magic ++ [4-byte BE length ++
    * PNG bytes]*. Intra-only by construction.
    */
  def encodeMotionPng(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(MotionPngMagic)
    val len = java.nio.ByteBuffer.allocate(4)
    frames.foreach { f =>
      len.clear(); len.putInt(f.length)
      bos.write(len.array()); bos.write(f)
    }
    bos.toByteArray
  }

  /** Frame split (no pixel decode): None on bad magic, truncated
    * length word, or a frame length overrunning the payload — the
    * drop-undecodable-rows policy of the other codecs.
    */
  def decodeMotionPng(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (p.length < 4 || p(0) != 'G' || p(1) != 'M' || p(2) != 'P' ||
        p(3) != '1') return None
    val out = Seq.newBuilder[Array[Byte]]
    var off = 4
    while (off < p.length) {
      if (off + 4 > p.length) return None
      val n = java.nio.ByteBuffer.wrap(p, off, 4).getInt
      if (n < 0 || off + 4 + n > p.length) return None
      out += java.util.Arrays.copyOfRange(p, off + 4, off + 4 + n)
      off += 4 + n
    }
    Some(out.result())
  }

  /** Per-bit majority over the frames' dHashes: bit set iff MORE than
    * half the frames carry it (strict — ties clear; with an odd frame
    * count there are none). A pure function of the frame multiset.
    */
  def majorityHash(hashes: Seq[Long]): Long = {
    val half = hashes.length
    var out = 0L
    var bit = 0
    while (bit < 64) {
      var votes = 0
      hashes.foreach(h => if (((h >>> bit) & 1L) == 1L) votes += 1)
      if (2 * votes > half) out |= (1L << bit)
      bit += 1
    }
    out
  }

  case class VFingerRow(doc_id: Long, vfp: Long)

  /** Video fingerprints: container split → real per-frame image decode
    * → per-frame dHash → bit-majority. Undecodable containers OR any
    * undecodable frame drop the row (a half-decoded vote would skew
    * the majority silently).
    */
  def videoFingerprints(spark: SparkSession, df: DataFrame,
                        cols: Int = 8, rows: Int = 8): Dataset[VFingerRow] = {
    import spark.implicits._
    df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, p) =>
          decodeMotionPng(p).filter(_.nonEmpty).flatMap { frames =>
            val hashes = frames.map { f =>
              val img = try {
                javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(f))
              } catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) null else java.lang.Long.valueOf(
                dHash(img, cols, rows))
            }
            if (hashes.contains(null)) None
            else Some(VFingerRow(id,
              majorityHash(hashes.map(_.longValue()))))
          }
        }
      }
  }

  /** Video near-dup pairs: [[videoFingerprints]] through the SAME
    * banded-Hamming blocking — fourth 64-bit signature family on one
    * join topology; pigeonhole recall exact at maxHamming < bands.
    */
  def videoNearDupPairs(spark: SparkSession, df: DataFrame,
                        maxHamming: Int = 3, bands: Int = 4,
                        bandBits: Int = 16): DataFrame =
    graft.operators.Dedup.simhashPairs(
      videoFingerprints(spark, df).toDF()
        .withColumnRenamed("vfp", "simhash"),
      "doc_id", maxHamming, bands, bandBits)

  /** Cross-video SHARED-FRAME pairs: exact dedup at frame granularity
    * — "which clips contain the same frames" (containment/reuse, the
    * [[graft.operators.Dedup.duplicateSpans]] question for video).
    * Container split → md5 per frame payload (intra-only frames are
    * byte-stable, so identical content ⇒ identical bytes; keyed on the
    * FULL 128-bit digest, so no birthday collisions at billions of
    * distinct frames) → ONE shuffle on the frame hash → per-hash video
    * list → in-group pair expansion → pairs sharing ≥ `minShared`
    * DISTINCT frames. Never an all-pairs join: candidates come only
    * from genuinely shared frames.
    *
    * HOT-FRAME stop device (the LSH stop-bucket applied here),
    * OPT-IN via `maxFrameDf`: a boilerplate frame (black frame,
    * intro/outro card) reused by f videos would put f ids in one
    * collect_list state row and expand f(f−1)/2 pairs inside a single
    * group — f in the millions kills the stage. With a finite
    * `maxFrameDf`, frames with document frequency > `maxFrameDf` are
    * dropped BEFORE the group build: a first partial-combined count
    * pass finds them (map-side combine ships one row per frame per map
    * partition, skew-immune), and a broadcast anti-join removes their
    * rows map-side. The stop list is small by construction —
    * ≤ totalFrameRows / maxFrameDf entries — and a frame present in
    * thousands of videos carries no containment signal anyway (exactly
    * the LSH stop-bucket argument). Post-filter group size is ≤
    * `maxFrameDf`, so the in-group expansion is bounded.
    *
    * RETURN CONTRACT: with the default `maxFrameDf = Int.MaxValue` the
    * result is EXACT — every shared frame counts, including a clip
    * duplicated across the whole corpus (the mass-duplication case a
    * dedup operator exists for; it is also the quadratic case, so
    * corpora where that can happen at scale should pass a finite
    * `maxFrameDf` knowingly). With a finite `maxFrameDf` the result is
    * APPROXIMATE whenever stopped frames > 0: a pair whose shared-frame
    * evidence includes stopped frames under-counts and can fall below
    * `minShared`. The number of stopped frames is surfaced through
    * `stopCounter` (or the named accumulator
    * `graft.sharedFramePairs.stoppedFrames`), counted exactly once
    * driver-side; `stopped == 0` certifies the capped run was exact.
    */
  /** @param materializeFrames with the stop device on, both consumers
    *   (the hot-frame count pass and the anti-join group pass) read the
    *   decoded frame-hash stream, and Spark does not exchange-reuse
    *   across the branches (verified: no ReusedExchange in the executed
    *   plan) — so either the stream is materialized once (default:
    *   right whenever decode dominates, i.e. real KB–MB frames; the
    *   checkpointed rows are 24 bytes each, orders of magnitude under
    *   the payloads) or the decode runs twice (`false`: measured
    *   faster on tiny-payload corpora where MD5-ing a 200 B frame is
    *   cheaper than a block-manager round trip — the q80 recompute
    *   lesson; both legs recorded in BASELINE.md). Exact mode has one
    *   consumer and ignores this knob.
    * @param maxStopFrames loud upper bound on the stop list: it is
    *   gathered driver-side (take, bounded memory) and broadcast, so a
    *   degenerate corpus (≫ maxStopFrames distinct hot frames — only
    *   possible when totalFrames / maxFrameDf exceeds it) fails with
    *   this named limit instead of an opaque executor/driver OOM.
    */
  def sharedFramePairs(spark: SparkSession, df: DataFrame,
                       minShared: Long = 2L,
                       maxFrameDf: Int = Int.MaxValue,
                       stopCounter: Option[org.apache.spark.util.LongAccumulator] = None,
                       materializeFrames: Boolean = true,
                       maxStopFrames: Int = 4 << 20): DataFrame = {
    import spark.implicits._
    val decoded = df.select("doc_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        decodeMotionPng(p).toSeq.flatten.map { f =>
          val d = java.security.MessageDigest.getInstance("MD5").digest(f)
          val bb = java.nio.ByteBuffer.wrap(d)
          (id, bb.getLong, bb.getLong)
        }
      }.toDF("doc_id", "fh1", "fh2").distinct()
    val grouped = if (maxFrameDf == Int.MaxValue) decoded else {
      val frames =
        if (materializeFrames) decoded.localCheckpoint(true) else decoded
      val stopAcc = stopCounter.getOrElse(spark.sparkContext.longAccumulator(
        "graft.sharedFramePairs.stoppedFrames"))
      val hotRows = frames.groupBy("fh1", "fh2")
        .agg(count(lit(1)).as("fdf"))
        .filter(col("fdf") > maxFrameDf)
        .select(col("fh1"), col("fh2")).as[(Long, Long)]
        // tiny: |stops| ≤ N/maxFrameDf; the probe saturates so an
        // Int.MaxValue "unbounded" bound can't wrap take() negative
        .take(math.min(maxStopFrames, Int.MaxValue - 1) + 1)
      require(hotRows.length <= maxStopFrames,
        s"sharedFramePairs: stop list exceeds maxStopFrames=$maxStopFrames " +
          s"(over ${maxStopFrames.toLong * maxFrameDf} frame rows are hot) " +
          "— raise maxFrameDf/maxStopFrames or run exact")
      stopAcc.add(hotRows.length.toLong)
      frames.join(broadcast(hotRows.toSeq.toDF("fh1", "fh2")),
        Seq("fh1", "fh2"), "left_anti")
    }
    grouped
      .groupBy("fh1", "fh2")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** End-to-end video dedup — [[dedupImages]]'s contract for the video
    * signature.
    */
  def dedupVideos(spark: SparkSession, df: DataFrame,
                  maxHamming: Int = 3, bands: Int = 4,
                  bandBits: Int = 16): DataFrame = {
    val pairs = videoNearDupPairs(spark, df, maxHamming, bands, bandBits)
    val labels = graft.operators.Dedup.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    df.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("is_keeper",
        (col("component") === col("doc_id")).cast("long"))
  }
}
