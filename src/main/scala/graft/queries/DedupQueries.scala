package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Contamination, Dedup}
import graft.functions.TextFunctions

/** Deduplication operators over the documents corpus. The corpus has
  * no natural duplicates, so each query works on `corpus` = documents
  * plus an identically-derived duplicated slice (every 10th doc
  * re-appears with doc_id + 100000) — generated the same way on the
  * oracle side.
  */
object DedupQueries {

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
  }

  private val corpusSql = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 10 = 0"""

  // SQL fragments mirroring TextFunctions/Dedup column expressions
  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
  private val fpSql = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

  /** 3-token shingles over `toks` — shingle i = toks[i..i+2]. */
  private def shinglesSql(toks: String): String =
    s"""list_transform(range(1, greatest(len($toks) - 2, 1) + 1),
        i -> concat_ws(' ', $toks[i], $toks[i + 1], $toks[i + 2]))"""

  /** LSH bucket of band `b` (2 rows/band) over a `sig` column — the
    * DuckDB mirror of the md5(concat_ws("|", slice)) bucket hash.
    */
  private def bandBucketSql(b: Int): String =
    s"md5(CAST(sig[${2 * b + 1}] AS VARCHAR) || '|' || CAST(sig[${2 * b + 2}] AS VARCHAR))"

  /** MinHash(k=8) + LSH(4 bands × 2) candidate pairs over an arbitrary
    * corpus frame — the pipeline shared by q26 (pairs), q48/q65
    * (clusters) and the scale bench (tools.ScaleBench runs the SAME
    * composition on 10⁶–10⁷-doc synthetic corpora).
    */
  private[graft] def minhashPairsOf(corpus: DataFrame): DataFrame = {
    val sigs = corpus
      .withColumn("toks", TextFunctions.tokens(col("text")))
      // fused shingle+hash expression — bit-identical to the composed
      // shingles3 → shingleHashes chain the oracle CTEs mirror
      .withColumn("hs", Dedup.tokenShingleHashes(col("toks")))
      .select(col("doc_id"), Dedup.intMinhashSignature(col("hs"), k = 8).as("sig"))
    Dedup.candidatePairs(
      Dedup.lshBuckets(sigs, "sig", "doc_id", bands = 4, rowsPerBand = 2),
      "doc_id")
  }

  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(corpus(s, dir))

  /** q27's SimHash banded near-dup pairs on an arbitrary corpus frame
    * (shared with tools.ScaleBench).
    */
  private[graft] def simhashPairsOf(corpus: DataFrame): DataFrame =
    Dedup.simhashPairs(Dedup.mdSimhash(corpus, "text", "doc_id"),
      "doc_id", maxHamming = 3, bands = 4, bandBits = 15)

  /** Oracle CTE chain ending in `pairs(a, b)` — the DuckDB mirror of
    * [[minhashPairs]], shared by the q26 and q48 oracles.
    */
  private lazy val minhashPairsCtes: String = {
    s"""corpus AS ($corpusSql),
      shingled AS (SELECT doc_id, ${shinglesSql(toksSql)} AS sh FROM corpus),
      hashed AS (SELECT doc_id, ${Dedup.shingleHashesSql("sh")} AS hs FROM shingled),
      sigs AS (SELECT doc_id, ${Dedup.intMinhashSql("hs", 8)} AS sig FROM hashed),
      buckets AS (${(0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, ${bandBucketSql(b)} AS bucket FROM sigs")
        .mkString("\n        UNION ALL ")}),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id)"""
  }

  /** Label every corpus doc with its near-dup component via `cc` over
    * the LSH candidate pairs — shared by q48 (label propagation) and
    * q65 (star contraction), which must agree with the same oracle.
    */
  private[graft] def clusterLabelsOf(corpus: DataFrame,
                                     cc: DataFrame => DataFrame): DataFrame = {
    val comps = cc(minhashPairsOf(corpus))
    corpus.select("doc_id")
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("is_keeper", col("component") === col("doc_id"))
  }

  private def clusterLabels(s: SparkSession, dir: String,
                            cc: DataFrame => DataFrame): DataFrame =
    clusterLabelsOf(corpus(s, dir), cc)

  /** CTE chain ending in `comp(id, component)` — recursive transitive
    * closure over the LSH pair graph, shared by the q48/q65/q75
    * oracles.
    */
  private lazy val ccCtes: String = s"""$minhashPairsCtes,
      edges AS (SELECT a AS src, b AS dst FROM pairs
                UNION SELECT b, a FROM pairs),
      conn AS (
        SELECT src, dst FROM edges
        UNION
        SELECT c.src, e.dst FROM conn c JOIN edges e ON c.dst = e.src),
      comp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS component
               FROM conn GROUP BY src)"""

  private lazy val clustersOracle: String = s"""
      WITH RECURSIVE $ccCtes
      SELECT corpus.doc_id,
             COALESCE(comp.component, corpus.doc_id) AS component,
             (COALESCE(comp.component, corpus.doc_id) = corpus.doc_id) AS is_keeper
      FROM corpus LEFT JOIN comp ON corpus.doc_id = comp.id"""

  val all: Seq[Q] = Seq(

    // ---- exact dedup: canonical fingerprint hash-groupBy
    Q("q24_dedup_exact", (s, dir) => {
      Dedup.exactGroups(corpus(s, dir), "text", "doc_id")
    }, Some(s"""
      WITH corpus AS ($corpusSql)
      SELECT $fpSql AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
      FROM corpus GROUP BY fp"""), headline = true),

    // ---- MinHash(k=8) + LSH(4 bands × 2): candidate pairs from
    //      banded bucket collisions. Integer minhash family: one md5
    //      per shingle, affine variants mod P (engine-portable)
    Q("q26_dedup_minhash_lsh", (s, dir) => {
      minhashPairs(s, dir)
    }, Some(s"""
      WITH $minhashPairsCtes
      SELECT a, b FROM pairs"""), headline = true),

    // ---- near-dup CLUSTERS: connected components over the LSH
    //      candidate-pair graph, every corpus doc labeled with its
    //      component (= min reachable doc_id); singletons keep
    //      themselves. "Keep is_keeper rows" IS corpus dedup.
    Q("q48_dedup_clusters", (s, dir) =>
      clusterLabels(s, dir, Dedup.connectedComponentsLabelProp(_, "a", "b")),
      Some(clustersOracle)),

    // ---- same clusters via alternating large-star/small-star
    //      contraction: the O(log²)-round scale path for high-diameter
    //      graphs, oracle-checked equivalent to q48's label propagation
    Q("q65_cc_star", (s, dir) =>
      clusterLabels(s, dir, Dedup.connectedComponentsStar(_, "a", "b")),
      Some(clustersOracle)),

    // ---- quality-aware canonical per near-dup cluster ("keep best,
    //      not first"): the CC labels of q48 joined with a quality
    //      signal; the longest member (doc_id tie-break) is marked —
    //      what a real dedup pass keeps instead of min-id
    Q("q75_cluster_canonical", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val labels = clusterLabels(s, dir, Dedup.connectedComponents(_, "a", "b"))
        .select("doc_id", "component")
      val quality = corpus(s, dir)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_words"))
      val w = Window.partitionBy("component")
        .orderBy(col("n_words").desc, col("doc_id").asc)
      labels.join(quality, "doc_id")
        .withColumn("rk", row_number().over(w))
        .select(col("doc_id"), col("component"), col("n_words"),
          when(col("rk") === 1, 1L).otherwise(0L).as("is_canonical"))
    }, Some(s"""
      WITH RECURSIVE $ccCtes,
      labels AS (
        SELECT corpus.doc_id,
               COALESCE(comp.component, corpus.doc_id) AS component
        FROM corpus LEFT JOIN comp ON corpus.doc_id = comp.id),
      quality AS (
        SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_words FROM corpus)
      SELECT doc_id, component, n_words,
             CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
      FROM (SELECT l.doc_id, l.component, q.n_words,
              row_number() OVER (PARTITION BY l.component
                ORDER BY q.n_words DESC, l.doc_id ASC) AS rk
            FROM labels l JOIN quality q USING (doc_id))""")),

    // ---- SimHash near-dup: md5-derived 60-bit bit-majority signature,
    //      4×15-bit band blocking (pigeonhole covers Hamming ≤ 3),
    //      bit_count refine
    Q("q27_dedup_simhash", (s, dir) => simhashPairsOf(corpus(s, dir)), {
      val bitSums = (0 until 60).map(j =>
        s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")
      val sigExpr = (0 until 60).map(j =>
        s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      val bandRows = (0 until 4).map(b =>
        s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 15}) & 32767 AS bucket FROM sigs")
        .mkString("\n        UNION ALL ")
      Some(s"""
      WITH corpus AS ($corpusSql),
      tok AS (SELECT doc_id, unnest($toksSql) AS t FROM corpus),
      h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
      bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
      sigs AS (SELECT doc_id, $sigExpr AS simhash FROM bits),
      banded AS ($bandRows)
      SELECT a, b, hamming FROM (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM banded x JOIN banded y ON x.band = y.band AND x.bucket = y.bucket
        WHERE x.doc_id < y.doc_id)
      WHERE hamming <= 3""")
    }),

    // ---- exact substring (span-level) duplicate detection (Lee et
    //      al. 2022's detection core): 8-token windows every 4 tokens,
    //      60-bit md5 span keys, cross-doc distinct counts. Catches
    //      verbatim repeated passages that whole-doc MinHash (low
    //      Jaccard) and paragraph boilerplate (other split points) miss
    Q("q79_duplicate_spans", (s, dir) =>
      Dedup.duplicateSpans(corpus(s, dir), "text", "doc_id",
        width = 8, stride = 4, minDocs = 2L),
      Some(s"""
      WITH corpus AS ($corpusSql),
      t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
      s AS (SELECT doc_id,
              unnest(list_transform(
                range(1, greatest(len(toks) - 8 + 1, 0) + 1, 4),
                i -> array_to_string(toks[i : i + 7], ' '))) AS span
            FROM t WHERE len(toks) >= 8)
      SELECT ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_h,
             COUNT(DISTINCT doc_id) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM s GROUP BY 1
      HAVING COUNT(DISTINCT doc_id) >= 2"""), headline = true),

    // ---- the REMOVAL pass over q79's detections: cut every
    //      non-canonical occurrence of a corpus-repeated span,
    //      overlapping windows merged into ranges, survivors
    //      reassembled in order
    Q("q80_remove_duplicate_spans", (s, dir) =>
      Dedup.removeDuplicateSpans(corpus(s, dir), "text", "doc_id",
        width = 8, minOccurrences = 2L),
      Some(s"""
      WITH corpus AS ($corpusSql),
      t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
      spans0 AS (SELECT doc_id,
              unnest(range(1, greatest(len(toks) - 8 + 1, 0) + 1)) AS start,
              unnest(list_transform(
                range(1, greatest(len(toks) - 8 + 1, 0) + 1),
                i -> md5(array_to_string(toks[i : i + 7], ' ')))) AS mh
            FROM t WHERE len(toks) >= 8),
      spans AS (SELECT doc_id, start,
              ('0x' || substr(mh, 1, 15))::BIGINT AS span_h,
              ('0x' || substr(mh, 18, 15))::BIGINT AS span_h2
            FROM spans0),
      occ AS (SELECT span_h, span_h2, COUNT(*) AS n_occ, MIN(doc_id) AS kdoc
              FROM spans GROUP BY span_h, span_h2 HAVING COUNT(*) >= 2),
      keep AS (SELECT o.span_h, o.span_h2, o.kdoc, MIN(s.start) AS kstart
               FROM occ o JOIN spans s
                 ON s.span_h = o.span_h AND s.span_h2 = o.span_h2
                    AND s.doc_id = o.kdoc
               GROUP BY 1, 2, 3),
      cuts AS (SELECT s.doc_id, s.start, s.start + 7 AS "end"
               FROM spans s JOIN keep k USING (span_h, span_h2)
               WHERE NOT (s.doc_id = k.kdoc AND s.start = k.kstart)),
      m AS (SELECT doc_id, start, "end",
              MAX("end") OVER (PARTITION BY doc_id ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
            FROM cuts),
      g AS (SELECT doc_id, start, "end",
              SUM(CASE WHEN prev_max IS NULL OR start > prev_max
                       THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY start, "end") AS grp
            FROM m),
      ranges AS (SELECT doc_id, MIN(start) AS cs, MAX("end") AS ce
                 FROM g GROUP BY doc_id, grp),
      toki AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i,
                      unnest(toks) AS tok
               FROM t),
      kept AS (SELECT x.doc_id, x.i, x.tok
               FROM toki x
               WHERE NOT EXISTS (SELECT 1 FROM ranges r
                 WHERE r.doc_id = x.doc_id AND x.i BETWEEN r.cs AND r.ce)),
      stats AS (SELECT doc_id,
                  COALESCE(string_agg(tok, ' ' ORDER BY i), '') AS clean_text,
                  COUNT(*) AS n_kept
                FROM kept GROUP BY doc_id)
      SELECT t.doc_id,
             COALESCE(st.clean_text, '') AS clean_text,
             COALESCE(st.n_kept, 0) AS n_kept,
             CAST(len(t.toks) - COALESCE(st.n_kept, 0) AS BIGINT) AS n_cut
      FROM t LEFT JOIN stats st USING (doc_id)"""), headline = true),

    // ---- STREAMING exact-substring detection, oracle-checked like
    //      q77/q78: the corpus replays through the file source with a
    //      1 ms-per-doc event time, duplicateSpanStream counts
    //      distinct docs per span inside a watermarked tumbling
    //      window (dedup-state + window-state both bounded), and the
    //      drained append sink must hash-match the batch q79
    //      detection set computed by DuckDB. A flush doc 8 h ahead
    //      pushes the watermark past the window so append mode emits.
    Q("q82_stream_duplicate_spans", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val c = corpus(s, dir)
        .withColumn("ts", lit(t0) + col("doc_id") * lit(1_000_000L))
        .select("doc_id", "text", "ts")
      val flush = s.range(1).select(
        lit(999999999L).as("doc_id"),
        lit((1 to 8).map(i => s"zzflush$i").mkString(" ")).as("text"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch.tempDir("graft-q82").toString
      c.unionByName(flush).repartition(8).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.duplicateSpanStream(
        stream, "text", "doc_id", "ts", width = 8, stride = 4,
        minDocs = 2L, watermark = "10 seconds", windowDur = "6 hours")
      val sink = "q82_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH corpus AS ($corpusSql),
      t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
      sp AS (SELECT doc_id,
              unnest(list_transform(
                range(1, greatest(len(toks) - 8 + 1, 0) + 1, 4),
                i -> array_to_string(toks[i : i + 7], ' '))) AS span
            FROM t WHERE len(toks) >= 8),
      h AS (SELECT doc_id,
              ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_h,
              1600000000000000000 + doc_id * 1000000 AS ts
            FROM sp)
      SELECT ts - ts % 21600000000000 AS window_ns, span_h,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM h GROUP BY 1, 2
      HAVING COUNT(DISTINCT doc_id) >= 2""")),

    // ---- TWO-WINDOW span stream (round 8): the q114/q116 treatment
    //      for the span-COUNT semantics. Docs spread across two 6 h
    //      windows (planted +100000 copies co-windowed with their
    //      base; +200000 copies in the OPPOSITE window), and
    //      "duplicated" must mean duplicated WITHIN a window: a span
    //      whose carriers split 1-and-1 across the windows reaches
    //      minDocs globally but in neither window, so it must NOT
    //      emit, while a span with 2+ carriers in each window emits
    //      twice — once per window, each under its own window_ns with
    //      its own count. The oracle recomputes per-(win, span)
    //      distinct-doc counts with the same CASE.
    Q("q117_stream_spans_two_windows", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val winNs = 6L * 3600L * 1_000_000_000L
      val d = Tables.documents(s, dir)
      val planted = d.filter(col("doc_id") % 10 === 0)
      val c = d
        .unionByName(planted.withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(planted.withColumn("doc_id", col("doc_id") + 200000))
        .withColumn("win", expr("""CASE
          WHEN doc_id < 100000 THEN doc_id div 10 % 2
          WHEN doc_id < 200000 THEN (doc_id - 100000) div 10 % 2
          ELSE 1 - (doc_id - 200000) div 10 % 2 END"""))
        .select(col("doc_id"), col("text"),
          (lit(t0) + col("win") * lit(winNs)
            + col("doc_id") * lit(1_000_000L)).as("ts"))
      val flush = s.range(1).select(
        lit(999999999L).as("doc_id"),
        lit((1 to 8).map(i => s"zzflush$i").mkString(" ")).as("text"),
        lit(t0 + 20L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q117").toString
      c.unionByName(flush).repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(tmp)
      val base = System.currentTimeMillis()
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(base + i * 1000L), s"stamp $f")
        }
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "2").parquet(tmp)
      val changes = graft.streaming.StreamingDedup.duplicateSpanStream(
        stream, "text", "doc_id", "ts", width = 8, stride = 4,
        minDocs = 2L, watermark = "10 seconds", windowDur = "6 hours")
      val sink = "q117_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH corpus3 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0),
      corpusw AS (
        SELECT doc_id, text,
               CASE WHEN doc_id < 100000 THEN doc_id // 10 % 2
                    WHEN doc_id < 200000 THEN (doc_id - 100000) // 10 % 2
                    ELSE 1 - (doc_id - 200000) // 10 % 2 END AS win
        FROM corpus3),
      t AS (SELECT doc_id, win, $toksSql AS toks FROM corpusw),
      sp AS (SELECT doc_id, win,
              unnest(list_transform(
                range(1, greatest(len(toks) - 8 + 1, 0) + 1, 4),
                i -> array_to_string(toks[i : i + 7], ' '))) AS span
            FROM t WHERE len(toks) >= 8),
      h AS (SELECT doc_id, win,
              ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_h
            FROM sp)
      SELECT 1600000000000000000
               - 1600000000000000000 % 21600000000000
               + win * 21600000000000 AS window_ns,
             span_h, COUNT(DISTINCT doc_id) AS n_docs
      FROM h GROUP BY 1, 2
      HAVING COUNT(DISTINCT doc_id) >= 2""")),

    // ---- blocked n-gram Jaccard near-dup pairs
    Q("q25_dedup_jaccard", (s, dir) => {
      val c = corpus(s, dir).withColumn("len_bucket", expr("n_chars div 50"))
      Dedup.jaccardPairs(c, "text", "doc_id",
        blockCols = Seq("lang", "len_bucket"), threshold = 0.5)
    }, Some(s"""
      WITH corpus AS ($corpusSql),
      t AS (SELECT doc_id, lang, n_chars // 50 AS len_bucket,
                   list_distinct($toksSql) AS toks FROM corpus)
      SELECT a, b, jaccard FROM (
        SELECT a.doc_id AS a, b.doc_id AS b,
               ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                     CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) AS jaccard
        FROM t a JOIN t b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
        WHERE a.doc_id < b.doc_id)
      WHERE jaccard >= 0.5""")),

    // ---- FUZZY decontamination: MinHash-LSH near-dup sweep between
    //      the training split and the eval split (doc_id % 97).
    //      Training additionally receives a NEAR copy of every eval
    //      doc (first token dropped, doc_id + 200000), so the oracle
    //      pins both the verbatim leak (the +100000 planted copy of
    //      doc 0 scores max_sim = 1.0) and the estimate math on
    //      non-identical pairs. Catches the paraphrased eval leakage
    //      q56's exact 3-gram sweep can't threshold (one shared
    //      3-gram already flags there)
    Q("q83_fuzzy_decontaminate", (s, dir) => {
      val c = corpus(s, dir)
      val evalSet = c.filter(col("doc_id") % 97 === 0)
      val train = c.filter(col("doc_id") % 97 =!= 0).unionByName(
        evalSet.withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", regexp_replace(col("text"), "^\\S+\\s+", "")))
      Contamination.fuzzyContaminatedDocs(train, evalSet, "text", "doc_id")
    }, Some(s"""
      WITH corpus AS ($corpusSql),
      sides AS (
        SELECT doc_id, text, 0 AS is_eval FROM corpus WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 200000, regexp_replace(text, '^\\S+\\s+', ''), 0
        FROM corpus WHERE doc_id % 97 = 0
        UNION ALL
        SELECT doc_id, text, 1 FROM corpus WHERE doc_id % 97 = 0),
      shingled AS (SELECT doc_id, is_eval, ${shinglesSql(toksSql)} AS sh FROM sides),
      hashed AS (SELECT doc_id, is_eval, ${Dedup.shingleHashesSql("sh")} AS hs FROM shingled),
      sigs AS (SELECT doc_id, is_eval, ${Dedup.intMinhashSql("hs", 8)} AS sig FROM hashed),
      banded AS (${(0 until 4).map(b =>
        s"SELECT doc_id, is_eval, sig, $b AS band, ${bandBucketSql(b)} AS bucket FROM sigs")
        .mkString("\n        UNION ALL ")}),
      cand AS (
        SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_id,
               CAST(len(list_filter(range(1, 9),
                 i -> t.sig[i] = e.sig[i])) AS DOUBLE)
                 / CAST(8 AS DOUBLE) AS sim
        FROM banded t JOIN banded e
          ON t.band = e.band AND t.bucket = e.bucket
        WHERE t.is_eval = 0 AND e.is_eval = 1)
      SELECT doc_id, COUNT(*) AS n_eval_hits, MAX(sim) AS max_sim
      FROM cand GROUP BY doc_id"""), headline = true),

    // ---- STREAMING MinHash-LSH near-dup pairs, oracle-checked like
    //      q82: the q26 corpus replays through the file source with a
    //      1 ms-per-doc event time; nearDupStream's watermark-bounded
    //      chain (bucket dedup → windowed bucket collect + pair
    //      expansion → cross-band pair dedup) must hash-match the
    //      batch q26 pair set, window-stamped. A flush doc 8 h ahead
    //      pushes the watermark past the window so append mode emits.
    Q("q88_stream_minhash_neardup", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val c = corpus(s, dir)
        .withColumn("ts", lit(t0) + col("doc_id") * lit(1_000_000L))
        .select("doc_id", "text", "ts")
      val flush = s.range(1).select(
        lit(999999999L).as("doc_id"),
        lit((1 to 8).map(i => s"zzflush$i").mkString(" ")).as("text"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch.tempDir("graft-q88").toString
      c.unionByName(flush).repartition(8).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.nearDupStream(
        stream, "text", "doc_id", "ts", k = 8, bands = 4, rowsPerBand = 2,
        watermark = "10 seconds", windowDur = "6 hours")
      val sink = "q88_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH $minhashPairsCtes
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             a, b
      FROM pairs""")),

    // ---- TWO-WINDOW MinHash stream (round 8): the q114 treatment for
    //      the multi-BAND blocking. Every planted doc gets a same-
    //      window copy (+100000 — pair windows alternate by doc group)
    //      and an opposite-window copy (+200000 — identical text, every
    //      band colliding, yet no pair may emit). The stream must
    //      reproduce each window's LSH pair set under ITS OWN
    //      window_ns; the oracle recomputes both with a win-equality
    //      pair join over the tripled corpus.
    Q("q116_stream_minhash_two_windows", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val winNs = 6L * 3600L * 1_000_000_000L
      val d = Tables.documents(s, dir)
      val planted = d.filter(col("doc_id") % 10 === 0)
      val c = d
        .unionByName(planted.withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(planted.withColumn("doc_id", col("doc_id") + 200000))
        .withColumn("win", expr("""CASE
          WHEN doc_id < 100000 THEN doc_id div 10 % 2
          WHEN doc_id < 200000 THEN (doc_id - 100000) div 10 % 2
          ELSE 1 - (doc_id - 200000) div 10 % 2 END"""))
        .select(col("doc_id"), col("text"),
          (lit(t0) + col("win") * lit(winNs)
            + col("doc_id") * lit(1_000_000L)).as("ts"))
      val flush = s.range(1).select(
        lit(999999999L).as("doc_id"),
        lit((1 to 8).map(i => s"zzflush$i").mkString(" ")).as("text"),
        lit(t0 + 20L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q116").toString
      c.unionByName(flush).repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(tmp)
      val base = System.currentTimeMillis()
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(base + i * 1000L), s"stamp $f")
        }
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "2").parquet(tmp)
      val changes = graft.streaming.StreamingDedup.nearDupStream(
        stream, "text", "doc_id", "ts", k = 8, bands = 4, rowsPerBand = 2,
        watermark = "10 seconds", windowDur = "6 hours")
      val sink = "q116_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH corpus3 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0),
      corpusw AS (
        SELECT doc_id, text,
               CASE WHEN doc_id < 100000 THEN doc_id // 10 % 2
                    WHEN doc_id < 200000 THEN (doc_id - 100000) // 10 % 2
                    ELSE 1 - (doc_id - 200000) // 10 % 2 END AS win
        FROM corpus3),
      shingled AS (SELECT doc_id, win, ${shinglesSql(toksSql)} AS sh FROM corpusw),
      hashed AS (SELECT doc_id, win, ${Dedup.shingleHashesSql("sh")} AS hs FROM shingled),
      sigs AS (SELECT doc_id, win, ${Dedup.intMinhashSql("hs", 8)} AS sig FROM hashed),
      buckets AS (${(0 until 4).map(b =>
        s"SELECT doc_id, win, $b AS band, ${bandBucketSql(b)} AS bucket FROM sigs")
        .mkString("\n        UNION ALL ")}),
      pairs AS (
        SELECT DISTINCT a.win, a.doc_id AS a, b.doc_id AS b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.win = b.win
        WHERE a.doc_id < b.doc_id)
      SELECT 1600000000000000000
               - 1600000000000000000 % 21600000000000
               + win * 21600000000000 AS window_ns,
             a, b
      FROM pairs"""))
  )
}
