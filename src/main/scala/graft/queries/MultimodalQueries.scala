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

  /** Deterministic 9×8 RGB PNG for q104: every channel a small modular
    * formula of (base id, x, y), so a SQL oracle can recompute the
    * exact pixel values the PNG round-trips. Ids with `id % 50 == 7`
    * render their BASE (id−7) image with one locally-perturbed pixel —
    * a planted near-duplicate pair (id−7, id) that flips at most the
    * two dHash gradient bits adjacent to the perturbed cell, keeping
    * planted pairs within Hamming 2 (< the 4-band pigeonhole bound)
    * while unrelated 64-bit hashes collide with probability ~2⁻⁴⁴.
    * Channel values stay < 256 (199 + 50), so no clamping to mirror.
    */
  private[graft] def renderPng(id: Long): Array[Byte] = {
    val nearDup = id % 50 == 7 && id >= 7
    val base = if (nearDup) id - 7 else id
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        // quadratic mixing, not linear: a linear formula makes every
        // row's gradient signs near-constant, clustering unrelated
        // hashes within a few Hamming bits (415 background pairs at
        // 500 docs when first tried) — squaring decorrelates the
        // gradients so unrelated pairs sit at ~32 bits. Each channel
        // pre-reduces by a DISTINCT prime before squaring: squaring the
        // raw value made (v²/64)%199 periodic in the id with period
        // 6368 = 64·199/2 (22k spurious near-pairs at 10⁵ images) and
        // overflowed 64-bit arithmetic past id ~3000 (Scala wraps,
        // DuckDB errors); the per-channel primes make the joint period
        // their ~10¹⁴ product and cap every square at 46337² ≈ 2.1e9.
        def mix(mb: Long, mx: Long, my: Long, m: Long): Int = {
          val v = (base * mb + x * mx + y * my) % m
          ((v * v / 64) % 199).toInt
        }
        var r = mix(1000003L, 7919L, 104729L, 46337L)
        var g = mix(999983L, 7907L, 104723L, 46327L)
        var b = mix(999979L, 7901L, 104717L, 46309L)
        // the near-dup perturbation pins one pixel near-white: the two
        // adjacent gradient bits flip depending on the base image's
        // local values — planted pairs land at Hamming 0–2 (measured
        // [2,1,0,0,0,0,2,2,0,0] over the ten sf0.01 pairs), exercising
        // the banded refine rather than collapsing to exact duplicates
        if (nearDup && x == 3 && y == 2) { r = 198; g = 198; b = 198 }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** DuckDB mirror of [[renderPng]]'s integer luma at grid cell (x,y)
    * for a given doc_id (base resolution + perturbation inlined).
    */
  private def mixSql(mb: Long, mx: Long, my: Long, m: Long) = {
    val v = s"((base * $mb + x * $mx + y * $my) % $m)"
    s"($v * $v // 64) % 199"
  }

  private val graySql = s"""
      CASE WHEN doc_id % 50 = 7 AND doc_id >= 7 AND x = 3 AND y = 2
           THEN 198
           ELSE (299 * (${mixSql(1000003L, 7919L, 104729L, 46337L)})
                 + 587 * (${mixSql(999983L, 7907L, 104723L, 46327L)})
                 + 114 * (${mixSql(999979L, 7901L, 104717L, 46309L)})) // 1000
      END"""

  /** Deterministic 3-frame motion-PNG for q143/q144: each frame a 9×8
    * image like [[renderPng]] but with a frame term in every channel
    * formula (distinct multipliers per channel, the same distinct
    * prime moduli — the q104/audio anti-periodicity lesson). Videos
    * with `id % 40 == 21` re-render their BASE (id−21) with frame 1's
    * pixel (3,2) pinned near-white: ≤ 2 gradient bits of one frame's
    * dHash flip, so ≤ 2 majority votes can cross — a planted near-dup
    * within Hamming 2 of its base.
    */
  private[graft] def renderMotionPng(id: Long): Array[Byte] = {
    val nearDup = id % 40 == 21 && id >= 21
    val base = if (nearDup) id - 21 else id
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          def mix(mb: Long, mf: Long, mx: Long, my: Long, m: Long): Int = {
            val v = (base * mb + f * mf + x * mx + y * my) % m
            ((v * v / 64) % 199).toInt
          }
          var r = mix(1000003L, 333323L, 7919L, 104729L, 46337L)
          var g = mix(999983L, 333317L, 7907L, 104723L, 46327L)
          var b = mix(999979L, 333313L, 7901L, 104717L, 46309L)
          if (nearDup && f == 1 && x == 3 && y == 2) {
            r = 198; g = 198; b = 198
          }
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    Multimodal.encodeMotionPng(frames)
  }

  /** DuckDB mirror of [[renderMotionPng]]'s luma at (f, x, y). */
  private def mixVSql(mb: Long, mf: Long, mx: Long, my: Long, m: Long) = {
    val v = s"((base * $mb + f * $mf + x * $mx + y * $my) % $m)"
    s"($v * $v // 64) % 199"
  }

  private val grayVSql = s"""
      CASE WHEN doc_id % 40 = 21 AND doc_id >= 21 AND f = 1
                AND x = 3 AND y = 2
           THEN 198
           ELSE (299 * (${mixVSql(1000003L, 333323L, 7919L, 104729L, 46337L)})
                 + 587 * (${mixVSql(999983L, 333317L, 7907L, 104723L, 46327L)})
                 + 114 * (${mixVSql(999979L, 333313L, 7901L, 104717L, 46309L)}))
                // 1000
      END"""

  /** Shared q143/q144 oracle scaffold: pixel luma → per-frame gradient
    * bits → per-position votes → strict-majority 64-bit hash.
    */
  private val videoHashSql = s"""
      px AS (
        SELECT doc_id, f, x, y, $grayVSql AS gray
        FROM (SELECT doc_id,
                CASE WHEN doc_id % 40 = 21 AND doc_id >= 21
                     THEN doc_id - 21 ELSE doc_id END AS base
              FROM documents),
             range(3) tf(f),
             (SELECT x, y FROM range(9) tx(x), range(8) ty(y))
      ),
      bits AS (
        SELECT l.doc_id, l.f, l.y * 8 + l.x AS pos,
               CASE WHEN r.gray > l.gray THEN 1 ELSE 0 END AS bit
        FROM px l JOIN px r ON r.doc_id = l.doc_id AND r.f = l.f
                            AND r.y = l.y AND r.x = l.x + 1
        WHERE l.x < 8
      ),
      votes AS (SELECT doc_id, pos, sum(bit) AS v
                FROM bits GROUP BY 1, 2),
      h AS (
        SELECT doc_id,
               bit_or(CASE WHEN 2 * v > 3 THEN
                 CASE WHEN pos = 63
                      THEN (-9223372036854775807::BIGINT - 1)
                      ELSE (1::BIGINT << pos) END
                 ELSE 0::BIGINT END) AS vhash
        FROM votes GROUP BY 1
      )"""

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
      WHERE doc_id % 3 = 2""")),

    // ---- perceptual-hash image near-dup (the dedup pillar over the
    //      multimodal column type): REAL PNG encode → javax.imageio
    //      decode → 64-bit dHash → banded-Hamming pairs through the
    //      SimHash blocking. The oracle recomputes the hash arithmetic
    //      from the pixel formulas (PNG is lossless, the images are
    //      grid-sized, luma and averaging are integer — bit-exact),
    //      then brute-forces pairs: with maxHamming 3 < 4 bands the
    //      banded plan's recall is exact, so the two result sets must
    //      be identical.
    Q("q104_image_phash_neardup", (s, dir) => {
      import s.implicits._
      val imgs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderPng(id)))
        }.toDF("doc_id", "payload")
      Multimodal.imageNearDupPairs(s, imgs, maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
    }, Some(s"""
      WITH px AS (
        SELECT doc_id, x, y, $graySql AS gray
        FROM (SELECT doc_id,
                CASE WHEN doc_id % 50 = 7 AND doc_id >= 7
                     THEN doc_id - 7 ELSE doc_id END AS base
              FROM documents),
             (SELECT x, y FROM range(9) tx(x), range(8) ty(y))
      ),
      h AS (
        SELECT l.doc_id,
               bit_or(CASE WHEN r.gray > l.gray THEN
                 CASE WHEN l.y * 8 + l.x = 63
                      THEN (-9223372036854775807::BIGINT - 1)
                      ELSE (1::BIGINT << (l.y * 8 + l.x)) END
                 ELSE 0::BIGINT END) AS phash
        FROM px l JOIN px r
          ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
        WHERE l.x < 8
        GROUP BY l.doc_id
      )
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3""")),

    // ---- STREAMING image near-dup (round 8): the q104 corpus replays
    //      through the file source with event times inside one 6 h
    //      window and `StreamingDedup.imageNearDupStream` (decode +
    //      dHash on arrival, banded buckets, windowed pair expansion,
    //      exact Hamming refine) must emit EXACTLY the batch q104 pair
    //      set, window-stamped. A flush image 8 h ahead closes the
    //      window so append mode emits; its own hash shares no
    //      within-threshold pair, and cross-window pairs are outside
    //      the horizon by construction.
    Q("q106_stream_image_neardup", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val t0 = 1_600_000_000_000_000_000L
      val imgs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderPng(id)))
        }.toDF("doc_id", "payload")
        .withColumn("ts", lit(t0) + col("doc_id") * lit(1_000_000L))
      val flush = s.range(1).select(lit(999999999L).as("doc_id"),
        lit(renderPng(999999999L)).as("payload"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q106").toString
      imgs.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.imageNearDupStream(
        stream, "doc_id", "payload", "ts", maxHamming = 3)
      val sink = "q106_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH px AS (
        SELECT doc_id, x, y, $graySql AS gray
        FROM (SELECT doc_id,
                CASE WHEN doc_id % 50 = 7 AND doc_id >= 7
                     THEN doc_id - 7 ELSE doc_id END AS base
              FROM documents),
             (SELECT x, y FROM range(9) tx(x), range(8) ty(y))
      ),
      h AS (
        SELECT l.doc_id,
               bit_or(CASE WHEN r.gray > l.gray THEN
                 CASE WHEN l.y * 8 + l.x = 63
                      THEN (-9223372036854775807::BIGINT - 1)
                      ELSE (1::BIGINT << (l.y * 8 + l.x)) END
                 ELSE 0::BIGINT END) AS phash
        FROM px l JOIN px r
          ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
        WHERE l.x < 8
        GROUP BY l.doc_id
      )
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3""")),

    // ---- end-to-end image dedup (round 8): pairs → connected
    //      components (star contraction) → min-id keeper per
    //      component, every input row labeled. The oracle recomputes
    //      the hashes, brute-forces the pair set, and closes it
    //      transitively with a recursive CTE — the q48 CC-oracle
    //      pattern over the q104 hash arithmetic.
    Q("q107_image_dedup", (s, dir) => {
      import s.implicits._
      val imgs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderPng(id)))
        }.toDF("doc_id", "payload")
      Multimodal.dedupImages(s, imgs, maxHamming = 3)
    }, Some(s"""
      WITH RECURSIVE px AS (
        SELECT doc_id, x, y, $graySql AS gray
        FROM (SELECT doc_id,
                CASE WHEN doc_id % 50 = 7 AND doc_id >= 7
                     THEN doc_id - 7 ELSE doc_id END AS base
              FROM documents),
             (SELECT x, y FROM range(9) tx(x), range(8) ty(y))
      ),
      h AS (
        SELECT l.doc_id,
               bit_or(CASE WHEN r.gray > l.gray THEN
                 CASE WHEN l.y * 8 + l.x = 63
                      THEN (-9223372036854775807::BIGINT - 1)
                      ELSE (1::BIGINT << (l.y * 8 + l.x)) END
                 ELSE 0::BIGINT END) AS phash
        FROM px l JOIN px r
          ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
        WHERE l.x < 8
        GROUP BY l.doc_id
      ),
      pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
      ),
      edges AS (SELECT a AS src, b AS dst FROM pairs
                UNION SELECT b, a FROM pairs),
      conn AS (
        SELECT src, dst FROM edges
        UNION
        SELECT c.src, e.dst FROM conn c JOIN edges e ON c.dst = e.src),
      comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
               FROM conn GROUP BY src)
      SELECT d.doc_id,
             COALESCE(comp.component, d.doc_id) AS component,
             CAST(COALESCE(comp.component, d.doc_id) = d.doc_id AS BIGINT)
               AS is_keeper
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.id""")),

    // ---- VIDEO near-dup (round 10): intra-only motion-PNG container
    //      (real per-frame javax.imageio decode — the MJPEG shape with
    //      the codec this container has), per-frame dHash, bit-MAJORITY
    //      video signature, the shared banded-Hamming blocking. Videos
    //      with id ≡ 21 (mod 40) re-render their base (id−21) with ONE
    //      pixel of ONE frame perturbed: ≤ 2 gradient bits of that
    //      frame's dHash move, so ≤ 2 majority votes can cross — the
    //      planted pair lands within Hamming 2 while unrelated
    //      signatures sit at ~32. The oracle recomputes pixel luma →
    //      per-frame gradient bits → votes → majority hash → brute-
    //      force pairs; maxHamming 3 < 4 bands makes banded recall
    //      exact, so the sets must be identical.
    Q("q143_video_fp_neardup", (s, dir) => {
      import s.implicits._
      val vids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderMotionPng(id)))
        }.toDF("doc_id", "payload")
      Multimodal.videoNearDupPairs(s, vids, maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
    }, Some(s"""
      WITH $videoHashSql
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.vhash, b.vhash)) <= 3""")),

    // ---- end-to-end VIDEO dedup: q143 pairs → star-contraction
    //      connected components → min-id keeper, every row labeled —
    //      the q107 contract for the video signature, against the same
    //      recursive-CTE transitive closure over the DuckDB-recomputed
    //      majority hashes.
    Q("q145_video_dedup", (s, dir) => {
      import s.implicits._
      val vids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderMotionPng(id)))
        }.toDF("doc_id", "payload")
      Multimodal.dedupVideos(s, vids, maxHamming = 3)
    }, Some(s"""
      WITH RECURSIVE $videoHashSql,
      pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.vhash, b.vhash)) <= 3
      ),
      edges AS (SELECT a AS src, b AS dst FROM pairs
                UNION SELECT b, a FROM pairs),
      conn AS (
        SELECT src, dst FROM edges
        UNION
        SELECT c.src, e.dst FROM conn c JOIN edges e ON c.dst = e.src),
      comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
               FROM conn GROUP BY src)
      SELECT d.doc_id,
             COALESCE(comp.component, d.doc_id) AS component,
             CAST(COALESCE(comp.component, d.doc_id) = d.doc_id AS BIGINT)
               AS is_keeper
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.id""")),

    // ---- cross-video SHARED FRAMES: exact dedup at frame granularity
    //      ("which clips reuse the same frames" — duplicateSpans'
    //      question for video). PNG encoding is deterministic and
    //      frames are intra-only, so identical pixel formulas ⇒
    //      identical bytes ⇒ equal hashes; by construction EXACTLY the
    //      planted (id−21, id) pairs share frames — frames 0 and 2
    //      are pixel-identical, frame 1 differs by the perturbed
    //      pixel — and every other (base, f) pixel surface is
    //      distinct. The oracle derives that pair set analytically:
    //      (v−21, v, 2) for v ≡ 21 (mod 40).
    Q("q146_video_shared_frames", (s, dir) => {
      import s.implicits._
      val vids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderMotionPng(id)))
        }.toDF("doc_id", "payload")
      // exact mode (no maxFrameDf) is safe HERE by construction: every
      // frame's pixel surface is unique except the planted (id−21, id)
      // copies, so frame document-frequency is ≤ 2 and no group can
      // expand quadratically. Corpus-scale callers with boilerplate
      // frames must pass a finite maxFrameDf (the ScaleBench hot-frame
      // row measures that regime).
      Multimodal.sharedFramePairs(s, vids, minShared = 2)
        .select(col("a"), col("b"), col("n_shared"))
    }, Some("""
      SELECT doc_id - 21 AS a, doc_id AS b, CAST(2 AS BIGINT) AS n_shared
      FROM documents
      WHERE doc_id % 40 = 21 AND doc_id >= 21""")),

    // ---- STREAMING video near-dup: the q143 corpus replayed through
    //      the file source into `videoNearDupStream` (container split +
    //      frame decode + majority fingerprint on arrival, the shared
    //      bandedSigPairStream) — emits EXACTLY the batch pair set,
    //      window-stamped (the q106/q121 contract; all four signature
    //      families now share the one streaming stage).
    Q("q144_stream_video_neardup", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val t0 = 1_600_000_000_000_000_000L
      val vids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, renderMotionPng(id)))
        }.toDF("doc_id", "payload")
        .withColumn("ts", lit(t0) + col("doc_id") * lit(1_000_000L))
      val flush = s.range(1).select(lit(999999999L).as("doc_id"),
        lit(renderMotionPng(999999999L)).as("payload"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q144").toString
      vids.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.videoNearDupStream(
        stream, "doc_id", "payload", "ts", maxHamming = 3)
      val sink = "q144_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH $videoHashSql
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.vhash, b.vhash)) <= 3"""))
  )
}
