package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Multimodal
import graft.operators.Similarity

/** Similarity search over embeddings + multimodal metadata extraction.
  * Near-dup corpus plants exact copies (vec_id % 10 == 0 → +10000) the
  * same way on the oracle side.
  */
object VectorQueries {

  // SQL building blocks (engine-parity op order: cast-to-double before
  // multiply, sequential sum, dot/(sqrt·sqrt))
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (SQRT(${dotSql(a, a)}) * SQRT(${dotSql(b, b)})))"
  private def bucketSql(e: String) =
    s"list_aggregate(list_transform(range(1, 9), i -> CASE WHEN $e[i] > 0 THEN '1' ELSE '0' END), 'string_agg', '')"

  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 10000))
  }
  private val nearDupCorpusSql = """
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + 10000 AS vec_id, embedding, label
    FROM embeddings WHERE vec_id % 10 = 0"""

  val all: Seq[Q] = Seq(

    // ---- exact ANN baseline: brute-force cosine top-5, broadcast
    //      query side
    Q("q32_ann_bruteforce", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
    }, Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      p AS (SELECT q_id, e.vec_id AS neighbor_id,
              ${cosSql("q_vec", "e.embedding")} AS cos
            FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
      r AS (SELECT q_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM p)
      SELECT q_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 5"""), headline = true),

    // ---- approximate ANN: sign-LSH bucketed top-3 (the scale path —
    //      candidates only within the query's bucket)
    Q("q33_ann_lsh", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", bits = 8, k = 3)
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM e WHERE vec_id < 50),
      p AS (SELECT q.q_id, e.vec_id AS neighbor_id, q.bucket,
              ${cosSql("q.q_vec", "e.embedding")} AS cos
            FROM q JOIN e USING (bucket) WHERE e.vec_id <> q.q_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
      SELECT q_id, neighbor_id, bucket, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3"""), headline = true),

    // ---- IVF ANN: deterministic centroids (16 smallest ids), each
    //      query probes its 3 nearest cells; assignment is a narrow
    //      projection over an inlined centroid literal — no corpus
    //      shuffle
    Q("q44_ann_ivf", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 25),
        "vec_id", "embedding", nCells = 16, nProbe = 3, k = 3)
    }, Some(s"""
      WITH cent AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
               embedding AS c_vec
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
      asgn AS (
        SELECT vec_id, embedding, cell_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cell_id ASC) AS rn
        FROM (SELECT e.vec_id, e.embedding, c.cell_id,
                     ${cosSql("c.c_vec", "e.embedding")} AS cos
              FROM embeddings e CROSS JOIN cent c)),
      cells AS (SELECT vec_id, embedding, cell_id FROM asgn WHERE rn = 1),
      probes AS (
        SELECT q_id, q_vec, cell_id FROM (
          SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cell_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cosSql("c.c_vec", "q.embedding")} DESC, c.cell_id ASC) AS rn
          FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 25)
        WHERE rn <= 3),
      cand AS (
        SELECT p.q_id, p.q_vec, n.vec_id AS neighbor_id, n.embedding AS n_vec
        FROM probes p JOIN cells n USING (cell_id) WHERE n.vec_id <> p.q_id),
      r AS (
        SELECT q_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM (SELECT q_id, neighbor_id, ${cosSql("q_vec", "n_vec")} AS cos FROM cand))
      SELECT q_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3""")),

    // ---- embedding near-dup pairs: same-bucket, rounded cosine >= 0.99
    //      (finds the planted copies)
    Q("q34_embedding_neardup", (s, dir) => {
      Similarity.nearDupPairs(nearDupCorpus(s, dir),
        "vec_id", "embedding", bits = 8, minCosine = 0.99)
    }, Some(s"""
      WITH corpus AS ($nearDupCorpusSql),
      e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM corpus)
      SELECT a, b, cosine FROM (
        SELECT x.vec_id AS a, y.vec_id AS b,
               ROUND(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
        FROM e x JOIN e y USING (bucket) WHERE x.vec_id < y.vec_id)
      WHERE cosine >= 0.99""")),

    // ---- multimodal metadata: binary payload column decoded
    //      partition-locally (stub codec reads header bytes)
    Q("q35_multimodal_meta", (s, dir) => {
      val withPayload = Multimodal.withSyntheticPayload(Tables.documents(s, dir))
      Multimodal.decodeMeta(s, withPayload).toDF()
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        ('0x' || substr(md5(text), 1, 4))::BIGINT AS width,
        ('0x' || substr(md5(text), 5, 4))::BIGINT AS height,
        CAST(length(md5(text)) / 2 AS BIGINT) AS n_bytes
      FROM documents""")),

    // ---- SemDeDup: centroid-cell assignment + within-cell cosine
    //      pairs — semantic dedup candidates on the planted-copy corpus
    Q("q60_semantic_dedup", (s, dir) => {
      Similarity.semanticDedupPairs(nearDupCorpus(s, dir),
        "vec_id", "embedding", nCells = 8, minCosine = 0.98)
    }, Some(s"""
      WITH corpus AS ($nearDupCorpusSql),
      cent AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
               embedding AS c_vec
        FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 8)),
      asgn AS (
        SELECT vec_id, embedding, cell_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cell_id ASC) AS rn
        FROM (SELECT e.vec_id, e.embedding, c.cell_id,
                     ${cosSql("c.c_vec", "e.embedding")} AS cos
              FROM corpus e CROSS JOIN cent c)),
      cells AS (SELECT vec_id, embedding, cell_id FROM asgn WHERE rn = 1)
      SELECT cell_id, a, b, cosine FROM (
        SELECT x.cell_id, x.vec_id AS a, y.vec_id AS b,
               ROUND(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
        FROM cells x JOIN cells y USING (cell_id) WHERE x.vec_id < y.vec_id)
      WHERE cosine >= 0.98""")),

    // ---- PRODUCT QUANTIZATION (round 11, Jégou et al. TPAMI 2011):
    //      the compression layer for embedding search at 100 TB —
    //      64 float dims (256 B) become m=4 codebook indices; the
    //      whole trainer is derandomized (q61's device per subspace),
    //      so DuckDB replays the fused Lloyd's iterations and pins
    //      every code and the flat index-order reconstruction error.
    Q("q152_pq_codes", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val model = ProductQuantizer.fit(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2)
      e.withColumn("codes",
          ProductQuantizer.codesColumn(col("embedding"), model))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("embedding"), col("codes"), model) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16)).mkString(",\n      ")
      Some(s"""
      WITH $subCtes,
      joined AS (
        SELECT e.vec_id, e.embedding,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM embeddings e
        JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
        JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)
        JOIN pq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN pq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN pq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN pq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(embedding[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(embedding[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- PQ asymmetric-distance top-k (q153): queries keep their
    //      float vectors, the corpus side is CODES ONLY — per-query
    //      distance tables broadcast, m array lookups per (row, query)
    //      summed in subspace order; in_exact3 records whether each
    //      ADC neighbor is also in the query's exact float top-3
    //      (computed identically in both engines).
    Q("q153_pq_adc_topk", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val model = ProductQuantizer.fit(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2)
      val codes = ProductQuantizer.encode(e, "vec_id", "embedding", model)
      val queries = e.filter(col("vec_id") < 10).orderBy("vec_id")
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val adc = ProductQuantizer.adcTopK(codes, "vec_id", model,
        queries, k = 3)
      // exact float top-3 per query (flat index-order 64-term sum)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val d2 = aggregate(
        zip_with(col("qv"), col("embedding"), (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("xd").asc, col("vec_id").asc)
      val exact3 = e.crossJoin(broadcast(q))
        .withColumn("xd", d2)
        .withColumn("xr", row_number().over(w))
        .filter(col("xr") <= 3)
        .select(col("q_id"), col("vec_id").as("nn_id"), lit(1L).as("inx"))
      adc.join(exact3, Seq("q_id", "nn_id"), "left")
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("adc_micro"),
          col("rank"), coalesce(col("inx"), lit(0L)).as("in_exact3"))
    }, {
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16)).mkString(",\n      ")
      def qsub(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> embedding[i])"
      }
      def dt(sIdx: Int) =
        s"""list_sum(list_transform(range(1, 17),
           i -> (CAST(qs[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))
              * (CAST(qs[i] AS DOUBLE) - CAST(c[i] AS DOUBLE))))"""
      val dtCtes = (0 until 4).map { sIdx =>
        s"""dt$sIdx AS (
          SELECT q.vec_id AS q_id, c.cell, ${dt(sIdx)} AS ds
          FROM (SELECT vec_id, ${qsub(sIdx)} AS qs FROM embeddings
                WHERE vec_id < 10) q
          CROSS JOIN pq${sIdx}_cent2 c)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH $subCtes,
      $dtCtes,
      adist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN dt0 d0 ON d0.cell = c0.code
        JOIN dt1 d1 ON d1.cell = c1.code AND d1.q_id = d0.q_id
        JOIN dt2 d2 ON d2.cell = c2.code AND d2.q_id = d0.q_id
        JOIN dt3 d3 ON d3.cell = c3.code AND d3.q_id = d0.q_id),
      ranked AS (
        SELECT q_id, nn_id, dist, row_number() OVER
          (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
        FROM adist),
      exact AS (
        SELECT q_id, nn_id FROM (
          SELECT q.vec_id AS q_id, x.vec_id AS nn_id, row_number() OVER
            (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(x.embedding[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(x.embedding[i] AS DOUBLE)))) ASC,
              x.vec_id ASC) AS xr
          FROM embeddings x
          CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id < 10) q)
        WHERE xr <= 3)
      SELECT r.q_id, r.nn_id,
             CAST(FLOOR(r.dist * 1e6) AS BIGINT) AS adc_micro,
             CAST(r.rank AS INT) AS rank,
             CAST(CASE WHEN e.nn_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS in_exact3
      FROM ranked r LEFT JOIN exact e USING (q_id, nn_id)
      WHERE r.rank <= 3""")
    }),

    // ---- IVFADC (q154, Jégou et al. §V): coarse quantizer cells + PQ
    //      on the RESIDUAL, queries probing the nearest nprobe cells —
    //      the full FAISS-style serving pipeline. Everything replayed
    //      in DuckDB: coarse k-means, float32 residuals, all m
    //      residual codebooks, per-(query, probed-cell) distance
    //      tables, and the nested-order ADC sums.
    Q("q154_ivfadc_topk", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val index = ProductQuantizer.encodeIvf(e, "vec_id", "embedding",
        coarse, pq)
      val queries = e.filter(col("vec_id") < 6).orderBy("vec_id")
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      val ivf = ProductQuantizer.ivfAdcTopK(index, "vec_id", coarse, pq,
        queries, k = 3, nprobe = 2)
      // exact float top-3 flag (the q153 device)
      val q = e.filter(col("vec_id") < 6)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val d2 = aggregate(
        zip_with(col("qv"), col("embedding"), (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("xd").asc, col("vec_id").asc)
      val exact3 = e.crossJoin(broadcast(q))
        .withColumn("xd", d2)
        .withColumn("xr", row_number().over(w))
        .filter(col("xr") <= 3)
        .select(col("q_id"), col("vec_id").as("nn_id"), lit(1L).as("inx"))
      ivf.join(exact3, Seq("q_id", "nn_id"), "left")
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("adc_micro"),
          col("rank"), coalesce(col("inx"), lit(0L)).as("in_exact3"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      def qrSlice(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> qr[i])"
      }
      val dtCtes = (0 until 4).map { sIdx =>
        s"""ivfdt$sIdx AS (
          SELECT p.q_id, p.cell AS pcell, pc.cell AS code,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                 * (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
              AS ds
          FROM (SELECT q_id, cell, ${qrSlice(sIdx)} AS qs FROM probes) p
          CROSS JOIN pq${sIdx}_cent2 pc)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      probes AS (
        SELECT q_id, cell, qr FROM (
          SELECT q.vec_id AS q_id, c.cell,
            list_transform(range(1, 65),
              i -> CAST(q.embedding[i] - c.c[i] AS FLOAT)) AS qr,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC) AS pr
          FROM (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 6) q
          CROSS JOIN cq_cent2 c)
        WHERE pr <= 2),
      $dtCtes,
      adist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN (SELECT vec_id, cell FROM resid) rc USING (vec_id)
        JOIN ivfdt0 d0 ON d0.pcell = rc.cell AND d0.code = c0.code
        JOIN ivfdt1 d1 ON d1.pcell = rc.cell AND d1.code = c1.code
          AND d1.q_id = d0.q_id
        JOIN ivfdt2 d2 ON d2.pcell = rc.cell AND d2.code = c2.code
          AND d2.q_id = d0.q_id
        JOIN ivfdt3 d3 ON d3.pcell = rc.cell AND d3.code = c3.code
          AND d3.q_id = d0.q_id),
      ranked AS (
        SELECT q_id, nn_id, dist, row_number() OVER
          (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
        FROM adist),
      exact AS (
        SELECT q_id, nn_id FROM (
          SELECT q.vec_id AS q_id, x.vec_id AS nn_id, row_number() OVER
            (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(x.embedding[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(x.embedding[i] AS DOUBLE)))) ASC,
              x.vec_id ASC) AS xr
          FROM embeddings x
          CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id < 6) q)
        WHERE xr <= 3)
      SELECT r.q_id, r.nn_id,
             CAST(FLOOR(r.dist * 1e6) AS BIGINT) AS adc_micro,
             CAST(r.rank AS INT) AS rank,
             CAST(CASE WHEN e.nn_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS in_exact3
      FROM ranked r LEFT JOIN exact e USING (q_id, nn_id)
      WHERE r.rank <= 3""")
    }),

    // ---- composed IVFADC → exact rerank (q158): the full production
    //      serving pipeline run END TO END — probe the nearest cells,
    //      take `candidates` residual-ADC candidates per query, rerank
    //      ONLY those rows by exact float distance (the store's float
    //      tier, partition-pruned to the probed cells). The oracle
    //      replays probe selection, all residual tables, the candidate
    //      cut, and the exact rerank.
    Q("q158_ivfadc_rerank", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val store = ProductQuantizer.encodeIvfStore(
        e, "vec_id", "embedding", coarse, pq)
      val queries = e.filter(col("vec_id") < 6).orderBy("vec_id")
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
          coarse, pq, queries, k = 3, nprobe = 2, candidates = 8)
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("dist_micro"),
          col("rank"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      def qrSlice(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> qr[i])"
      }
      val dtCtes = (0 until 4).map { sIdx =>
        s"""ivfdt$sIdx AS (
          SELECT p.q_id, p.cell AS pcell, pc.cell AS code,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                 * (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
              AS ds
          FROM (SELECT q_id, cell, ${qrSlice(sIdx)} AS qs FROM probes) p
          CROSS JOIN pq${sIdx}_cent2 pc)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      probes AS (
        SELECT q_id, cell, qr FROM (
          SELECT q.vec_id AS q_id, c.cell,
            list_transform(range(1, 65),
              i -> CAST(q.embedding[i] - c.c[i] AS FLOAT)) AS qr,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC) AS pr
          FROM (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 6) q
          CROSS JOIN cq_cent2 c)
        WHERE pr <= 2),
      $dtCtes,
      adist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN (SELECT vec_id, cell FROM resid) rc USING (vec_id)
        JOIN ivfdt0 d0 ON d0.pcell = rc.cell AND d0.code = c0.code
        JOIN ivfdt1 d1 ON d1.pcell = rc.cell AND d1.code = c1.code
          AND d1.q_id = d0.q_id
        JOIN ivfdt2 d2 ON d2.pcell = rc.cell AND d2.code = c2.code
          AND d2.q_id = d0.q_id
        JOIN ivfdt3 d3 ON d3.pcell = rc.cell AND d3.code = c3.code
          AND d3.q_id = d0.q_id),
      cand AS (
        SELECT q_id, nn_id FROM (
          SELECT q_id, nn_id, row_number() OVER
            (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS cr
          FROM adist)
        WHERE cr <= 8),
      rer AS (
        SELECT c.q_id, c.nn_id,
               list_sum(list_transform(range(1, 65),
                 i -> (CAST(q.embedding[i] AS DOUBLE)
                       - CAST(x.embedding[i] AS DOUBLE))
                    * (CAST(q.embedding[i] AS DOUBLE)
                       - CAST(x.embedding[i] AS DOUBLE)))) AS dist
        FROM cand c
        JOIN embeddings x ON x.vec_id = c.nn_id
        JOIN embeddings q ON q.vec_id = c.q_id)
      SELECT q_id, nn_id,
             CAST(FLOOR(dist * 1e6) AS BIGINT) AS dist_micro,
             CAST(rank AS INT) AS rank
      FROM (SELECT q_id, nn_id, dist, row_number() OVER
              (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
            FROM rer)
      WHERE rank <= 3""")
    }),

    // ---- int8 rerank tier (q165, round 13): the q158 pipeline with
    //      the float tier replaced by max-abs-scaled int8 — d bytes/row
    //      instead of d·4 for the rerank I/O. Scale = global max |x|
    //      (exact on both engines, no summation); quantization =
    //      clamp(⌊x/s·127 + 0.5⌋, ±127) (floor-based rounding, defined
    //      identically for negatives); rerank distance dequantizes per
    //      component (q_i − v8_i·s/127, double fold). DuckDB replays
    //      scale, quantization, candidates, and the dequantized rerank.
    Q("q165_ivfadc_rerank_int8", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val sc = ProductQuantizer.int8Scale(e, "embedding")
      val store8 = ProductQuantizer.encodeIvfStoreInt8(
        e, "vec_id", "embedding", coarse, pq, sc)
      val queries = e.filter(col("vec_id") < 6).orderBy("vec_id")
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      ProductQuantizer.ivfAdcRerankTopK8(store8, "vec_id",
          coarse, pq, sc, queries, k = 3, nprobe = 2, candidates = 8)
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("dist_micro"),
          col("rank"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      def qrSlice(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> qr[i])"
      }
      val dtCtes = (0 until 4).map { sIdx =>
        s"""ivfdt$sIdx AS (
          SELECT p.q_id, p.cell AS pcell, pc.cell AS code,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                 * (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
              AS ds
          FROM (SELECT q_id, cell, ${qrSlice(sIdx)} AS qs FROM probes) p
          CROSS JOIN pq${sIdx}_cent2 pc)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      q8scale AS (
        SELECT MAX(list_max(list_transform(embedding, x -> abs(x))))
                 AS sc
        FROM embeddings),
      q8inv AS (SELECT CAST(sc AS DOUBLE) AS scd,
                       CAST(sc AS DOUBLE) / 127.0 AS inv
                FROM q8scale),
      q8 AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding, x ->
                 CASE WHEN isnan(x) THEN 0.0 ELSE
                   GREATEST(-127.0, LEAST(127.0,
                     FLOOR(CAST(x AS DOUBLE) / i.scd * 127.0 + 0.5)))
                 END) AS v8
        FROM embeddings, q8inv i),
      probes AS (
        SELECT q_id, cell, qr FROM (
          SELECT q.vec_id AS q_id, c.cell,
            list_transform(range(1, 65),
              i -> CAST(q.embedding[i] - c.c[i] AS FLOAT)) AS qr,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC) AS pr
          FROM (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 6) q
          CROSS JOIN cq_cent2 c)
        WHERE pr <= 2),
      $dtCtes,
      adist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN (SELECT vec_id, cell FROM resid) rc USING (vec_id)
        JOIN ivfdt0 d0 ON d0.pcell = rc.cell AND d0.code = c0.code
        JOIN ivfdt1 d1 ON d1.pcell = rc.cell AND d1.code = c1.code
          AND d1.q_id = d0.q_id
        JOIN ivfdt2 d2 ON d2.pcell = rc.cell AND d2.code = c2.code
          AND d2.q_id = d0.q_id
        JOIN ivfdt3 d3 ON d3.pcell = rc.cell AND d3.code = c3.code
          AND d3.q_id = d0.q_id),
      cand AS (
        SELECT q_id, nn_id FROM (
          SELECT q_id, nn_id, row_number() OVER
            (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS cr
          FROM adist)
        WHERE cr <= 8),
      rer AS (
        SELECT c.q_id, c.nn_id,
               list_sum(list_transform(range(1, 65),
                 i -> (CAST(q.embedding[i] AS DOUBLE) - x.v8[i] * iv.inv)
                    * (CAST(q.embedding[i] AS DOUBLE) - x.v8[i] * iv.inv)))
                 AS dist
        FROM cand c
        JOIN q8 x ON x.vec_id = c.nn_id
        JOIN embeddings q ON q.vec_id = c.q_id
        CROSS JOIN q8inv iv)
      SELECT q_id, nn_id,
             CAST(FLOOR(dist * 1e6) AS BIGINT) AS dist_micro,
             CAST(rank AS INT) AS rank
      FROM (SELECT q_id, nn_id, dist, row_number() OVER
              (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
            FROM rer)
      WHERE rank <= 3""")
    }),

    // ---- OPQ rotation (round 12, Ge et al. CVPR 2013 §4.1): the
    //      learned pre-split rotation — float32-cast second moment,
    //      64 fixed-count power-iteration stages (per-iteration float
    //      casts, CGS2 reorthogonalization against all earlier stages
    //      — NOT deflation, which compounded error on close spectra —
    //      Rayleigh quotient in defined op order), ranks dealt round-robin to
    //      subspaces. DuckDB replays the WHOLE derivation through one
    //      recursive CTE and pins every rotation-row component and
    //      eigenvalue.
    Q("q155_opq_rotation", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val (evs, lams) = ProductQuantizer.eigenBasis(
        e, "embedding", d = 64, powerIters = 4)
      val ranked = lams.zipWithIndex
        .sortBy { case (lam, stg) => (-lam, stg) }.map(_._2)
      val rows = (0 until 64).map { j =>
        val stg = ranked(j)
        ((j % 4) * 16 + j / 4, // out dim under m=4, subDim=16
          math.floor(lams(stg).toDouble * 1e9).toLong,
          evs(stg).map(c => math.floor(c.toDouble * 1e6).toLong)
            .mkString(","))
      }
      import s.implicits._
      rows.toDF("out_dim", "lam_nano", "v_csv")
        .select(col("out_dim").cast("long").as("out_dim"),
          col("lam_nano"), col("v_csv"))
    }, Some(s"""
      WITH RECURSIVE ${opqRotationCtes(4, 4, 16)}
      SELECT CAST(od - 1 AS BIGINT) AS out_dim,
             CAST(FLOOR(lam * 1e9) AS BIGINT) AS lam_nano,
             array_to_string(list_transform(rv,
               x -> CAST(CAST(FLOOR(x * 1e6) AS BIGINT) AS VARCHAR)), ',')
               AS v_csv
      FROM opq_rot""")),

    // ---- OPQ codes + reconstruction error (q156): plain PQ trained on
    //      the ROTATED vectors — the q152 fused-Lloyd's replay runs on
    //      opq_rotated, so the oracle pins rotation, training, codes,
    //      and the rotated-space reconstruction error end to end.
    Q("q156_opq_codes", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      rotated.withColumn("codes",
          ProductQuantizer.codesColumn(col("remb"), opq.pq))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("remb"), col("codes"), opq.pq) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "opq_rotated", vecExpr = "remb"))
        .mkString(",\n      ")
      Some(s"""
      WITH RECURSIVE ${opqRotationCtes(4, 4, 16)},
      $subCtes,
      joined AS (
        SELECT e.vec_id, e.remb,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM opq_rotated e
        JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
        JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)
        JOIN pq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN pq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN pq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN pq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- OPQ-IVFADC (q159): the full production index — learned
    //      rotation, coarse cells + residual PQ in ROTATED space,
    //      probe, exact rerank (FAISS's "OPQ,IVF,PQ" factory string
    //      as one composed query). Rotated-space distances equal
    //      original-space distances (R orthonormal, Ge §3), so the
    //      pipeline serves original-space neighbors while every stage
    //      runs on rotated vectors. DuckDB replays rotation → coarse
    //      k-means → residuals → m codebooks → probes → candidate cut
    //      → exact rerank, end to end.
    Q("q159_opq_ivfadc", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      val (coarse, _) = KMeans.fit(rotated, "vec_id", "remb",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(rotated, "vec_id", "remb", coarse)
        .withColumn("r", zip_with(col("remb"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val store = ProductQuantizer.encodeIvfStore(
        rotated, "vec_id", "remb", coarse, pq)
      val queries = rotated.filter(col("vec_id") < 6).orderBy("vec_id")
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
      ProductQuantizer.ivfAdcRerankTopK(store, "vec_id", "vec",
          coarse, pq, queries, k = 3, nprobe = 2, candidates = 8)
        .select(col("q_id"), col("nn_id"),
          floor(col("dist") * 1e6).cast("long").as("dist_micro"),
          col("rank"))
    }, {
      val coarseCtes = kmeansCtes("oq_", k = 4, iters = 2,
        table = "opq_rotated", vecExpr = "remb")
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "oresid", vecExpr = "r"))
        .mkString(",\n      ")
      def qrSlice(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> qr[i])"
      }
      val dtCtes = (0 until 4).map { sIdx =>
        s"""oivfdt$sIdx AS (
          SELECT p.q_id, p.cell AS pcell, pc.cell AS code,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                 * (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
              AS ds
          FROM (SELECT q_id, cell, ${qrSlice(sIdx)} AS qs FROM oprobes) p
          CROSS JOIN pq${sIdx}_cent2 pc)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH RECURSIVE ${opqRotationCtes(4, 4, 16)},
      $coarseCtes,
      oresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM oq_final_asgn a JOIN oq_cent2 c USING (cell)),
      $subCtes,
      oprobes AS (
        SELECT q_id, cell, qr FROM (
          SELECT q.vec_id AS q_id, c.cell,
            list_transform(range(1, 65),
              i -> CAST(q.remb[i] - c.c[i] AS FLOAT)) AS qr,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.remb[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE))
                   * (CAST(q.remb[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC) AS pr
          FROM (SELECT vec_id, remb FROM opq_rotated
                WHERE vec_id < 6) q
          CROSS JOIN oq_cent2 c)
        WHERE pr <= 2),
      $dtCtes,
      oadist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN (SELECT vec_id, cell FROM oresid) rc USING (vec_id)
        JOIN oivfdt0 d0 ON d0.pcell = rc.cell AND d0.code = c0.code
        JOIN oivfdt1 d1 ON d1.pcell = rc.cell AND d1.code = c1.code
          AND d1.q_id = d0.q_id
        JOIN oivfdt2 d2 ON d2.pcell = rc.cell AND d2.code = c2.code
          AND d2.q_id = d0.q_id
        JOIN oivfdt3 d3 ON d3.pcell = rc.cell AND d3.code = c3.code
          AND d3.q_id = d0.q_id),
      ocand AS (
        SELECT q_id, nn_id FROM (
          SELECT q_id, nn_id, row_number() OVER
            (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS cr
          FROM oadist)
        WHERE cr <= 8),
      orer AS (
        SELECT c.q_id, c.nn_id,
               list_sum(list_transform(range(1, 65),
                 i -> (CAST(q.remb[i] AS DOUBLE)
                       - CAST(x.remb[i] AS DOUBLE))
                    * (CAST(q.remb[i] AS DOUBLE)
                       - CAST(x.remb[i] AS DOUBLE)))) AS dist
        FROM ocand c
        JOIN opq_rotated x ON x.vec_id = c.nn_id
        JOIN opq_rotated q ON q.vec_id = c.q_id)
      SELECT q_id, nn_id,
             CAST(FLOOR(dist * 1e6) AS BIGINT) AS dist_micro,
             CAST(rank AS INT) AS rank
      FROM (SELECT q_id, nn_id, dist, row_number() OVER
              (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
            FROM orer)
      WHERE rank <= 3""")
    }),

    // ---- sampled OPQ training (q160, round 13): the WHOLE OPQ
    //      pipeline — second-moment pass, power-iteration rotation,
    //      AND the inner Lloyd's — trains on the q157 hash sample
    //      (md5 of "pqs:"+id under the fraction); everything still
    //      rotates + encodes. This is the knob that brings the round-12
    //      headline (OPQ recall at zero serving cost) inside the decade
    //      training budget: the moment pass was the last full-corpus
    //      scan without a sampled variant. The oracle replays the
    //      sampled moment, the full rotation derivation, the sampled
    //      Lloyd's, and the full-table codes + recon error.
    Q("q160_opq_sampled_codes", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4, sampleFraction = 0.5)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      rotated.withColumn("codes",
          ProductQuantizer.codesColumn(col("remb"), opq.pq))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("remb"), col("codes"), opq.pq) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "opq_rotated", vecExpr = "remb",
        trainTable = "opq_train")).mkString(",\n      ")
      Some(s"""
      WITH RECURSIVE opqtrain AS (
        SELECT * FROM embeddings
        WHERE ('0x' || substr(md5('pqs:' || CAST(vec_id AS VARCHAR)),
                1, 15))::BIGINT % 1000000 < 500000),
      ${opqRotationCtes(4, 4, 16, momentTable = "opqtrain")},
      opq_train AS (
        SELECT r.* FROM opq_rotated r
        JOIN opqtrain t USING (vec_id)),
      $subCtes,
      joined AS (
        SELECT e.vec_id, e.remb,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM opq_rotated e
        JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
        JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)
        JOIN pq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN pq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN pq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN pq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- STREAMING IVFADC store maintenance (q161, round 13): half
    //      the corpus bulk-loads the TxTable store (bootstrap), the
    //      other half arrives through the file source in two forced
    //      micro-batches (maxFilesPerTrigger=1) and is coarse-assigned
    //      + residual-PQ-encoded scan-locally, committed exactly-once
    //      per batch (appendOnce batchId tags). Encode is a pure
    //      per-row function, so the maintained store must equal a
    //      from-scratch encodeIvfStore rebuild row for row — which is
    //      exactly what DuckDB derives (the q154 coarse + residual-
    //      codebook replay, per-row cell + codes over the WHOLE
    //      table, knowing nothing about the batching).
    Q("q161_stream_ivf_store", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q161").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx)
      val rest = e.filter(col("vec_id") % 2 === 1)
      val vecsDir = s"$root/vecs"
      rest.filter(col("vec_id") < 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      Thread.sleep(5) // distinct mtimes: stable file-source order
      rest.filter(col("vec_id") >= 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", maxFilesPerTrigger = 1).awaitTermination()
      storeTx.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM resid r
      JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
      JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)""")
    }),

    // ---- STREAMING OPQ store maintenance (q166, round 13): q161 with
    //      the rotation FUSED into the streamed encode — arrivals
    //      rotate + coarse-assign + residual-PQ-encode in ONE
    //      scan-local pass, exactly-once per batch. DuckDB derives the
    //      rotation (q155's recursion), the rotated-space coarse cells
    //      and residual codebooks (q159's composition), and the
    //      per-row store content batch-agnostically.
    Q("q166_stream_opq_store", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      val (coarse, _) = KMeans.fit(rotated, "vec_id", "remb",
        k = 4, iters = 2)
      val resid = KMeans.assign(rotated, "vec_id", "remb", coarse)
        .withColumn("r", zip_with(col("remb"),
          element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q166").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx,
        rotation = Some(opq.rotation))
      val rest = e.filter(col("vec_id") % 2 === 1)
      val vecsDir = s"$root/vecs"
      rest.filter(col("vec_id") < 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      Thread.sleep(5) // distinct mtimes: stable file-source order
      rest.filter(col("vec_id") >= 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", maxFilesPerTrigger = 1,
        rotation = Some(opq.rotation)).awaitTermination()
      storeTx.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val coarseCtes = kmeansCtes("oq_", k = 4, iters = 2,
        table = "opq_rotated", vecExpr = "remb")
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "oresid", vecExpr = "r"))
        .mkString(",\n      ")
      Some(s"""
      WITH RECURSIVE ${opqRotationCtes(4, 4, 16)},
      $coarseCtes,
      oresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM oq_final_asgn a JOIN oq_cent2 c USING (cell)),
      $subCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM oresid r
      JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
      JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)""")
    }),

    // ---- STREAMING int8 store maintenance (q167, round 13): q161's
    //      exactly-once maintenance with the q165 rerank tier — vec8
    //      (max-abs int8, scale fixed at bootstrap) maintained live
    //      in the same scan-local pass as cell + codes. DuckDB derives
    //      the scale, the quantization, and the codes batch-
    //      agnostically; the oracle pins every byte of the tier.
    Q("q167_stream_int8_store", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val sc = ProductQuantizer.int8Scale(e, "embedding")
      val root = Scratch
        .tempDir("graft-q167").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx,
        int8Scale = Some(sc))
      val rest = e.filter(col("vec_id") % 2 === 1)
      val vecsDir = s"$root/vecs"
      rest.filter(col("vec_id") < 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      Thread.sleep(5) // distinct mtimes: stable file-source order
      rest.filter(col("vec_id") >= 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", maxFilesPerTrigger = 1,
        int8Scale = Some(sc)).awaitTermination()
      val toInts = udf((b: Array[Byte]) => b.map(_.toInt))
      storeTx.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"),
        concat_ws(",", transform(toInts(col("vec8")), _.cast("string")))
          .as("v8_csv"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      q8scale AS (
        SELECT MAX(list_max(list_transform(embedding, x -> abs(x))))
                 AS sc
        FROM embeddings),
      q8inv AS (SELECT CAST(sc AS DOUBLE) AS scd FROM q8scale),
      q8 AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                 CASE WHEN isnan(x) THEN 0 ELSE
                   CAST(GREATEST(-127.0, LEAST(127.0,
                     FLOOR(CAST(x AS DOUBLE) / i.scd * 127.0 + 0.5)))
                     AS INT)
                 END) AS v8
        FROM embeddings, q8inv i)
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv,
             array_to_string(list_transform(q8.v8,
               x -> CAST(x AS VARCHAR)), ',') AS v8_csv
      FROM resid r
      JOIN q8 USING (vec_id)
      JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
      JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)""")
    }),

    // ---- DRIFT-TRIGGERED RETRAIN (q168, round 13): the loop closed —
    //      bootstrap on half the corpus, stream the other half SHIFTED
    //      (+3.0/dim), the probe fires (median drift ≫ the 2000‰ bar),
    //      `retrainIfDrifted` retrains coarse cells + residual
    //      codebooks on the store's vectors (originals ∪ shifted) and
    //      bulk-loads the fresh store. DuckDB derives the union
    //      corpus, the retrained k-means + codebooks, and every
    //      (cell, codes) row of the NEW store — knowing nothing about
    //      the maintenance history that produced it.
    Q("q168_drift_retrain", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q168").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx, errC = 512)
      val shifted = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), transform(col("embedding"),
          x => (x.cast("double") + lit(3.0)).cast("float"))
          .as("embedding"))
      val vecsDir = s"$root/vecs"
      shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", errC = 512).awaitTermination()
      val newStore = new TxTable(s, s"$root/nstore")
      val newDrift = new TxTable(s, s"$root/ndrift")
      val fired = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
        newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2,
        errC = 512)
      require(fired.isDefined, "q168 plants a shift — the loop must fire")
      newStore.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val coarseCtes = kmeansCtes("rq_", k = 4, iters = 2,
        table = "ucorp")
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "rresid", vecExpr = "r",
        namePrefix = "rp")).mkString(",\n      ")
      Some(s"""
      WITH ucorp AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
        UNION ALL
        SELECT vec_id, list_transform(embedding,
          x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 2 = 1),
      $coarseCtes,
      rresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM rq_final_asgn a JOIN rq_cent2 c USING (cell)),
      $subCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM rresid r
      JOIN rp0_codes c0 USING (vec_id) JOIN rp1_codes c1 USING (vec_id)
      JOIN rp2_codes c2 USING (vec_id) JOIN rp3_codes c3 USING (vec_id)""")
    }),

    // ---- OPQ RETRAIN LOOP (q169, round 14): q168 closed over the
    //      ROTATED tier. An OPQ-fused store (q166 shape) drifts under
    //      a planted shift; `retrainIfDrifted(rotation = R₁)` must
    //      (1) UNROTATE the stored vectors back to original space
    //      through R₁ᵀ (orthonormal inverse, float32 per component),
    //      (2) REFIT the rotation with the full non-parametric
    //      alternation (fitOpqNp — parametric init, cross-covariance,
    //      Procrustes with argmax basis completion, codebook refit) on
    //      the recovered union corpus, (3) train coarse cells +
    //      residual codebooks in the NEW rotated space, (4) bulk-load
    //      the fresh store. DuckDB derives R₁, the stored rotated
    //      vectors, the unrotation, the ENTIRE fitOpqNp alternation
    //      over the recovered corpus, and every (cell, codes) row of
    //      the NEW store — from the union corpus alone, knowing
    //      nothing about the maintenance history.
    Q("q169_opq_retrain", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      val (coarse, _) = KMeans.fit(rotated, "vec_id", "remb",
        k = 4, iters = 2)
      val resid = KMeans.assign(rotated, "vec_id", "remb", coarse)
        .withColumn("r", zip_with(col("remb"),
          element_at(typedlit(coarse), col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q169").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx, errC = 512,
        rotation = Some(opq.rotation))
      val shifted = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), transform(col("embedding"),
          x => (x.cast("double") + lit(3.0)).cast("float"))
          .as("embedding"))
      val vecsDir = s"$root/vecs"
      shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", errC = 512,
        rotation = Some(opq.rotation)).awaitTermination()
      val newStore = new TxTable(s, s"$root/nstore")
      val newDrift = new TxTable(s, s"$root/ndrift")
      val fired = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
        newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2,
        errC = 512, rotation = Some(opq.rotation), opqPowerIters = 4)
      require(fired.exists(_.rotation.isDefined),
        "q169 plants a shift — the OPQ retrain must fire with a rotation")
      newStore.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val kmCtes = kmeansCtes("rq_", k = 4, iters = 2,
        table = "np_rotated", vecExpr = "remb")
      val rpCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "rresid", vecExpr = "r",
        namePrefix = "rp")).mkString(",\n      ")
      Some(s"""
      WITH RECURSIVE ucorp AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
        UNION ALL
        SELECT vec_id, list_transform(embedding,
          x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 2 = 1),
      ${opqRotationCtes(4, 4, 16, rotateTable = "ucorp")},
      r1mat AS (SELECT list(rv ORDER BY od) AS mm FROM opq_rot),
      uvecs AS MATERIALIZED (
        SELECT vec_id, list(comp ORDER BY o) AS embedding FROM (
          SELECT s2.vec_id, t1.o AS o,
                 CAST(CAST(list_sum(list_transform(range(1,65),
                   i -> r.mm[i][o] * CAST(s2.remb[i] AS DOUBLE)))
                   AS FLOAT) AS DOUBLE) AS comp
          FROM opq_rotated s2 CROSS JOIN r1mat r,
               unnest(range(1,65)) t1(o))
        GROUP BY vec_id),
      ${opqNpCtes(powerIters = 4, m = 4, k = 4, iters = 2, subDim = 16,
        table = "uvecs")},
      $kmCtes,
      rresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM rq_final_asgn a JOIN rq_cent2 c USING (cell)),
      $rpCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM rresid r
      JOIN rp0_codes c0 USING (vec_id) JOIN rp1_codes c1 USING (vec_id)
      JOIN rp2_codes c2 USING (vec_id) JOIN rp3_codes c3 USING (vec_id)""")
    }),

    // ---- int8 RETRAIN LOOP (q170, round 14): q168 closed over the
    //      SCALAR-QUANTIZED tier. The int8 store holds no floats, so
    //      `retrainIfDrifted(int8Scale = s₁)` DEQUANTIZES the tier
    //      (v8·s₁/127 per component, float32 — the only training
    //      corpus a self-contained store can offer; quantization noise
    //      ≤ s₁/254 per dim), retrains coarse + residual codebooks on
    //      the dequantized union, RE-SCALES (the documented "re-scale
    //      at retrain time" contract: new max-abs from the dequantized
    //      corpus), and quantizes the fresh tier with the new scale.
    //      Arrivals shifted past the baseline max-abs CLAMP at ±127 at
    //      encode time — the oracle replays the clamp, the dequant,
    //      the retrained models, the new scale, and every byte of the
    //      new tier from the union corpus alone.
    Q("q170_int8_retrain", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val sc = ProductQuantizer.int8Scale(e, "embedding")
      val root = Scratch
        .tempDir("graft-q170").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx, errC = 512,
        int8Scale = Some(sc))
      val shifted = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), transform(col("embedding"),
          x => (x.cast("double") + lit(3.0)).cast("float"))
          .as("embedding"))
      val vecsDir = s"$root/vecs"
      shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", errC = 512,
        int8Scale = Some(sc)).awaitTermination()
      val newStore = new TxTable(s, s"$root/nstore")
      val newDrift = new TxTable(s, s"$root/ndrift")
      val fired = StreamingAnnIndex.retrainIfDrifted(storeTx, driftTx,
        newStore, newDrift, cells = 4, m = 4, k = 4, iters = 2,
        errC = 512, int8Scale = Some(sc))
      require(fired.exists(_.int8Scale.isDefined),
        "q170 plants a shift — the int8 retrain must fire with a re-scale")
      val toInts = udf((b: Array[Byte]) => b.map(_.toInt))
      newStore.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"),
        concat_ws(",", transform(toInts(col("vec8")), _.cast("string")))
          .as("v8_csv"))
    }, {
      val kmCtes = kmeansCtes("rq_", k = 4, iters = 2, table = "uvecs")
      val rpCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "rresid", vecExpr = "r",
        namePrefix = "rp")).mkString(",\n      ")
      def quantSql(src: String, invTable: String) = s"""
        SELECT vec_id,
               list_transform(embedding, x ->
                 CASE WHEN isnan(x) THEN 0 ELSE
                   CAST(GREATEST(-127.0, LEAST(127.0,
                     FLOOR(CAST(x AS DOUBLE) / i.scd * 127.0 + 0.5)))
                     AS INT)
                 END) AS v8
        FROM $src, $invTable i"""
      Some(s"""
      WITH ucorp AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
        UNION ALL
        SELECT vec_id, list_transform(embedding,
          x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 2 = 1),
      q8scale AS (
        SELECT MAX(list_max(list_transform(embedding, x -> abs(x))))
                 AS sc
        FROM embeddings),
      q8inv AS (SELECT CAST(sc AS DOUBLE) AS scd,
                       CAST(sc AS DOUBLE) / 127.0 AS invd
                FROM q8scale),
      uv8 AS (${quantSql("ucorp", "q8inv")}),
      uvecs AS MATERIALIZED (
        SELECT vec_id, list_transform(v8, b ->
                 CAST(CAST(CAST(b AS DOUBLE) * i.invd AS FLOAT)
                   AS DOUBLE)) AS embedding
        FROM uv8, q8inv i),
      $kmCtes,
      rresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM rq_final_asgn a JOIN rq_cent2 c USING (cell)),
      $rpCtes,
      nscale AS (
        SELECT MAX(list_max(list_transform(embedding, x -> abs(x))))
                 AS sc
        FROM uvecs),
      ninv AS (SELECT CAST(sc AS DOUBLE) AS scd FROM nscale),
      nv8 AS (${quantSql("uvecs", "ninv")})
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv,
             array_to_string(list_transform(nv8.v8,
               x -> CAST(x AS VARCHAR)), ',') AS v8_csv
      FROM rresid r
      JOIN nv8 USING (vec_id)
      JOIN rp0_codes c0 USING (vec_id) JOIN rp1_codes c1 USING (vec_id)
      JOIN rp2_codes c2 USING (vec_id) JOIN rp3_codes c3 USING (vec_id)""")
    }),

    // ---- COMPACTED maintained store (q172, round 14): q161's
    //      maintenance with the scheduled SORTED compaction policy on
    //      (compactEvery = 1 — every batch's commit is followed by a
    //      global cell-sorted rewrite). Compaction is content-neutral
    //      by contract, so the oracle is EXACTLY the q161 derivation:
    //      DuckDB re-derives the store from the union corpus knowing
    //      nothing about batching OR compaction history — any row the
    //      rewrite dropped, duplicated, or mutated hash-fails here.
    Q("q172_compacted_store", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q172").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx)
      val rest = e.filter(col("vec_id") % 2 === 1)
      val vecsDir = s"$root/vecs"
      rest.filter(col("vec_id") < 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      Thread.sleep(5) // distinct mtimes: stable file-source order
      rest.filter(col("vec_id") >= 250).coalesce(1)
        .write.mode("append").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", maxFilesPerTrigger = 1,
        compactEvery = 1).awaitTermination()
      storeTx.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM resid r
      JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
      JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)""")
    }),

    // ---- GENERATION-POINTER SWAP (q173, round 14): the q168 retrain
    //      loop composed through [[graft.streaming.AnnGenerations]] —
    //      bootstrap publishes generation 0, the shifted stream drifts
    //      it, `retrainAndSwap` retrains into UNPUBLISHED generation 1
    //      and swaps the pointer atomically only on fire. The oracle
    //      reads the store THROUGH the pointer (whatever generation is
    //      live) and replays q168's union-corpus derivation — a swap
    //      that published early, tore, or resolved the wrong
    //      generation hash-fails.
    Q("q173_generation_swap", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.{AnnGenerations, StreamingAnnIndex}
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q173").toString
      val gens = new AnnGenerations(s, root)
      val (g0, storeTx, driftTx) = gens.next()
      StreamingAnnIndex.bootstrap(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", coarse, pq, storeTx, driftTx, errC = 512)
      gens.publish(g0)
      val shifted = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), transform(col("embedding"),
          x => (x.cast("double") + lit(3.0)).cast("float"))
          .as("embedding"))
      val vecsDir = s"$root/vecs"
      shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", errC = 512).awaitTermination()
      val fired = StreamingAnnIndex.retrainAndSwap(gens,
        cells = 4, m = 4, k = 4, iters = 2, errC = 512)
      require(fired.exists(_._1 == g0 + 1),
        "q173 plants a shift — the swap must publish the next generation")
      // read THROUGH the pointer: the live generation is the retrained
      // store
      gens.current().get._2.read().select(col("vec_id"),
        col("cell").cast("long").as("cell"),
        concat_ws(",", transform(col("codes"), _.cast("string")))
          .as("codes_csv"))
    }, {
      val coarseCtes = kmeansCtes("rq_", k = 4, iters = 2,
        table = "ucorp")
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "rresid", vecExpr = "r",
        namePrefix = "rp")).mkString(",\n      ")
      Some(s"""
      WITH ucorp AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
        UNION ALL
        SELECT vec_id, list_transform(embedding,
          x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 2 = 1),
      $coarseCtes,
      rresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM rq_final_asgn a JOIN rq_cent2 c USING (cell)),
      $subCtes
      SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
             CAST(c0.code AS VARCHAR) || ',' || CAST(c1.code AS VARCHAR)
               || ',' || CAST(c2.code AS VARCHAR) || ','
               || CAST(c3.code AS VARCHAR) AS codes_csv
      FROM rresid r
      JOIN rp0_codes c0 USING (vec_id) JOIN rp1_codes c1 USING (vec_id)
      JOIN rp2_codes c2 USING (vec_id) JOIN rp3_codes c3 USING (vec_id)""")
    }),

    // ---- ANN-store DRIFT PROBE (q162, round 13): the maintained
    //      store's per-cell quantile sidecar (residual reconstruction
    //      error in micros) rolled up baseline-vs-streamed. The stream
    //      is the SAME corpus shifted +3.0 on every dim — encoded
    //      under the baseline's coarse/PQ models, its residuals leave
    //      the trained neighborhoods and the error quantiles jump:
    //      drift_permille ≫ 1000 is the retrain signal. Sketch
    //      capacity 512 > any per-cell count at this SF, so the
    //      summaries are in their EXACT regime and DuckDB replays the
    //      p50s as plain rank statistics (rank = max(1, ceil(q·n)) —
    //      the quantileEstimate convention).
    Q("q162_ann_drift_probe", (s, dir) => {
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingAnnIndex
      import graft.bank.TxTable
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val root = Scratch
        .tempDir("graft-q162").toString
      val storeTx = new TxTable(s, s"$root/store")
      val driftTx = new TxTable(s, s"$root/drift")
      StreamingAnnIndex.bootstrap(e, "vec_id", "embedding", coarse, pq,
        storeTx, driftTx, errC = 512)
      // the planted shift: double-add then float cast (IEEE-defined on
      // both engines)
      val shifted = e.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") + lit(3.0)).cast("float")).as("embedding"))
      val vecsDir = s"$root/vecs"
      shifted.coalesce(1).write.mode("overwrite").parquet(vecsDir)
      StreamingAnnIndex.run(s, vecsDir, coarse, pq, storeTx, driftTx,
        s"$root/ckpt", errC = 512).awaitTermination()
      StreamingAnnIndex.driftReport(driftTx, errC = 512)
        .select(col("cell").cast("long").as("cell"), col("n_base"),
          col("p_base"), col("n_stream"), col("p_stream"),
          col("drift_permille"), col("pop_permille"))
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      // per-row err: residual vs its PQ reconstruction, ONE left fold
      // over all 64 dims in index order (the ivfCodeErr loop shape)
      def errSql(residTable: String, codeTable: Int => String) = s"""
        SELECT r.vec_id, r.cell,
               CAST(FLOOR(list_sum(list_transform(range(1, 65),
                 i -> (CAST(r.r[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                    * (CAST(r.r[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
                 * 1e6) AS BIGINT) AS err
        FROM (
          SELECT rr.vec_id, rr.cell, rr.r,
                 cc0.c || cc1.c || cc2.c || cc3.c AS recon
          FROM $residTable rr
          JOIN ${codeTable(0)} k0 USING (vec_id)
          JOIN ${codeTable(1)} k1 USING (vec_id)
          JOIN ${codeTable(2)} k2 USING (vec_id)
          JOIN ${codeTable(3)} k3 USING (vec_id)
          JOIN pq0_cent2 cc0 ON cc0.cell = k0.code
          JOIN pq1_cent2 cc1 ON cc1.cell = k1.code
          JOIN pq2_cent2 cc2 ON cc2.cell = k2.code
          JOIN pq3_cent2 cc3 ON cc3.cell = k3.code) r"""
      // the shifted table re-ENCODES under the baseline models: coarse
      // argmin against cq_cent2, per-subspace argmin against pqN_cent2
      def sCodes(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"""scode$sIdx AS (
          SELECT vec_id, code FROM (
            SELECT sr.vec_id, pc.cell AS code,
                   row_number() OVER (PARTITION BY sr.vec_id ORDER BY
                     list_sum(list_transform(range(1, 17),
                       i -> (CAST(sub[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                          * (CAST(sub[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
                       ASC, pc.cell ASC) AS rn
            FROM (SELECT vec_id,
                    list_transform(range($lo, ${lo + 16}), i -> r[i]) AS sub
                  FROM sresid) sr
            CROSS JOIN pq${sIdx}_cent2 pc)
          WHERE rn = 1)"""
      }
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      shifted AS (
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding,
                 x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT)) AS embedding
        FROM embeddings),
      sasgn AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_sum(list_transform(range(1, 65),
                     i -> (CAST(e.embedding[i] AS DOUBLE)
                           - CAST(c.c[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE)
                           - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC)
                   AS rn
          FROM shifted e CROSS JOIN cq_cent2 c)
        WHERE rn = 1),
      sresid AS (SELECT a.vec_id, a.cell,
                   list_transform(range(1, 65),
                     i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                 FROM sasgn a JOIN cq_cent2 c USING (cell)),
      ${(0 until 4).map(sCodes).mkString(",\n      ")},
      berr AS (${errSql("resid", i => s"pq${i}_codes")}),
      serr AS (${errSql("sresid", i => s"scode$i")}),
      bq AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_base,
                    list_sort(list(err))[CAST(GREATEST(1,
                      CEIL(0.5 * COUNT(*))) AS INT)] AS p_base
             FROM berr GROUP BY cell),
      sq AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_stream,
                    list_sort(list(err))[CAST(GREATEST(1,
                      CEIL(0.5 * COUNT(*))) AS INT)] AS p_stream
             FROM serr GROUP BY cell)
      SELECT CAST(COALESCE(bq.cell, sq.cell) AS BIGINT) AS cell,
             bq.n_base, bq.p_base, sq.n_stream, sq.p_stream,
             CASE WHEN bq.p_base > 0 THEN
               CAST(FLOOR(CAST(sq.p_stream AS DOUBLE) * 1000.0
                 / CAST(bq.p_base AS DOUBLE)) AS BIGINT)
             ELSE NULL END AS drift_permille,
             CASE WHEN bq.n_base > 0
                    AND (SELECT SUM(n_stream) FROM sq) > 0 THEN
               CAST(FLOOR(CAST(sq.n_stream AS DOUBLE) * 1000.0
                 * CAST((SELECT SUM(COALESCE(n_base, 0))
                         FROM bq) AS DOUBLE)
                 / (CAST((SELECT SUM(COALESCE(n_stream, 0))
                          FROM sq) AS DOUBLE)
                    * CAST(bq.n_base AS DOUBLE))) AS BIGINT)
             ELSE NULL END AS pop_permille
      FROM bq FULL OUTER JOIN sq ON bq.cell = sq.cell""")
    }),

    // ---- STREAMING IVFADC serving (q163, round 13): the PQ family's
    //      serving path joins q111 (LSH) and q113 (IVF floats) — the
    //      q154 query set replays through the file source, probes the
    //      code store scan-locally (probe selection, float32
    //      residuals, and per-subspace ADC folds as native vec_l2
    //      expressions — bit-identical to the batch heaps), and emits
    //      the top-3 when the watermark closes the window: EXACTLY the
    //      q154 result, window-stamped. The store's float tier is
    //      never read.
    Q("q163_stream_ivfadc", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.{KMeans, ProductQuantizer}
      import graft.streaming.StreamingSimilarity
      val e = Tables.embeddings(s, dir)
      val (coarse, _) = KMeans.fit(e, "vec_id", "embedding",
        k = 4, iters = 2)
      val cLit = typedlit(coarse)
      val resid = KMeans.assign(e, "vec_id", "embedding", coarse)
        .withColumn("r", zip_with(col("embedding"),
          element_at(cLit, col("cell") + 1), (x, y) => x - y))
        .select("vec_id", "r")
      val pq = ProductQuantizer.fit(resid, "vec_id", "r",
        m = 4, k = 4, iters = 2)
      val store = ProductQuantizer.encodeIvfStore(
        e, "vec_id", "embedding", coarse, pq).persist()
      store.count()
      val t0 = 1_600_000_000_000_000_000L
      val qs = e.filter(col("vec_id") < 6)
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = e.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec.toSeq).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q163").toString
      qs.unionByName(flush).repartition(4)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = StreamingSimilarity.ivfAdcStream(stream, store,
        "vec_id", "embedding", "ts", coarse, pq, nprobe = 2, k = 3)
      val sink = "q163_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true) // eager: safe to unpersist
      s.catalog.dropTempView(sink)
      store.unpersist()
      out
    }, {
      val coarseCtes = kmeansCtes("cq_", k = 4, iters = 2)
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, table = "resid", vecExpr = "r"))
        .mkString(",\n      ")
      def qrSlice(sIdx: Int) = {
        val lo = sIdx * 16 + 1
        s"list_transform(range($lo, ${lo + 16}), i -> qr[i])"
      }
      val dtCtes = (0 until 4).map { sIdx =>
        s"""ivfdt$sIdx AS (
          SELECT p.q_id, p.cell AS pcell, pc.cell AS code,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))
                 * (CAST(qs[i] AS DOUBLE) - CAST(pc.c[i] AS DOUBLE))))
              AS ds
          FROM (SELECT q_id, cell, ${qrSlice(sIdx)} AS qs FROM probes) p
          CROSS JOIN pq${sIdx}_cent2 pc)"""
      }.mkString(",\n      ")
      Some(s"""
      WITH $coarseCtes,
      resid AS (SELECT a.vec_id, a.cell,
                  list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] - c.c[i] AS FLOAT)) AS r
                FROM cq_final_asgn a JOIN cq_cent2 c USING (cell)),
      $subCtes,
      probes AS (
        SELECT q_id, cell, qr FROM (
          SELECT q.vec_id AS q_id, c.cell,
            list_transform(range(1, 65),
              i -> CAST(q.embedding[i] - c.c[i] AS FLOAT)) AS qr,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(range(1, 65),
                i -> (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE))
                   * (CAST(q.embedding[i] AS DOUBLE)
                      - CAST(c.c[i] AS DOUBLE)))) ASC, c.cell ASC) AS pr
          FROM (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 6) q
          CROSS JOIN cq_cent2 c)
        WHERE pr <= 2),
      $dtCtes,
      adist AS (
        SELECT d0.q_id, c0.vec_id AS nn_id,
               ((d0.ds + d1.ds) + d2.ds) + d3.ds AS dist
        FROM pq0_codes c0
        JOIN pq1_codes c1 USING (vec_id) JOIN pq2_codes c2 USING (vec_id)
        JOIN pq3_codes c3 USING (vec_id)
        JOIN (SELECT vec_id, cell FROM resid) rc USING (vec_id)
        JOIN ivfdt0 d0 ON d0.pcell = rc.cell AND d0.code = c0.code
        JOIN ivfdt1 d1 ON d1.pcell = rc.cell AND d1.code = c1.code
          AND d1.q_id = d0.q_id
        JOIN ivfdt2 d2 ON d2.pcell = rc.cell AND d2.code = c2.code
          AND d2.q_id = d0.q_id
        JOIN ivfdt3 d3 ON d3.pcell = rc.cell AND d3.code = c3.code
          AND d3.q_id = d0.q_id)
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             q_id, nn_id,
             CAST(FLOOR(dist * 1e6) AS BIGINT) AS adc_micro,
             CAST(rank AS INT) AS rank
      FROM (SELECT q_id, nn_id, dist, row_number() OVER
              (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS rank
            FROM adist)
      WHERE rank <= 3""")
    }),

    // ---- NON-PARAMETRIC OPQ (q164, round 13, Ge et al. CVPR 2013
    //      §4.2): initialize with the parametric eigenbasis rotation,
    //      train codebooks, then ONE alternation — cross-covariance
    //      M = mean x·ŷᵀ (x original, ŷ the reconstruction of R·x),
    //      orthogonal Procrustes R = V·Uᵀ with U = the q155 power
    //      stages of S = M·Mᵀ and V = CGS2-reorthonormalized Mᵀu/σ —
    //      and a codebook re-fit in the new rotation. DuckDB replays
    //      the ENTIRE alternation: R₀ recursion, first Lloyd's, M, S,
    //      a SECOND power-stage recursion, the sequential V recursion,
    //      R₁ = V·Uᵀ, re-rotation, second Lloyd's, final codes + recon
    //      error. At this geometry M = E[x·ŷᵀ] is rank ≤ k·m = 16 BY
    //      CONSTRUCTION (ŷ spans the codebook products), so ~50 of the
    //      64 U/V stages go through the deterministic basis-COMPLETION
    //      branch (the argmax-CGS2-residual e_j, guaranteed ≥ 1/√d —
    //      zero tr(R·M) weight, any orthonormal completion equally
    //      optimal) — the replay pins the completion arithmetic too,
    //      not just the converged stages.
    Q("q164_opq_nonparametric", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpqNp(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4, alternations = 1)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      rotated.withColumn("codes",
          ProductQuantizer.codesColumn(col("remb"), opq.pq))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("remb"), col("codes"), opq.pq) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      Some(s"""
      WITH RECURSIVE ${opqNpCtes(powerIters = 4, m = 4, k = 4, iters = 2,
        subDim = 16)},
      joined AS (
        SELECT e.vec_id, e.remb,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM np_rotated e
        JOIN nq0_codes c0 USING (vec_id) JOIN nq1_codes c1 USING (vec_id)
        JOIN nq2_codes c2 USING (vec_id) JOIN nq3_codes c3 USING (vec_id)
        JOIN nq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN nq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN nq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN nq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- SAMPLED non-parametric OPQ (q171, round 14): the q160
    //      sampling device through the WHOLE fitOpqNp alternation —
    //      the parametric init's moment pass, its Lloyd's, the
    //      cross-covariance, AND the refit all read only the md5-hash
    //      sample; rotation application and the final codes read the
    //      full table. At corpus scale the alternation pays TWO
    //      d²-per-row passes per round, so this is where the sampled
    //      regime matters twice over. The oracle derives the sampled
    //      train relation once and replays the ENTIRE pipeline
    //      (helper trainTable plumbing) to the final codes + error.
    Q("q171_opq_np_sampled", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val opq = ProductQuantizer.fitOpqNp(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, powerIters = 4, alternations = 1,
        sampleFraction = 0.5)
      val rotated = ProductQuantizer.rotateVectors(
        e, "vec_id", "embedding", opq.rotation)
      rotated.withColumn("codes",
          ProductQuantizer.codesColumn(col("remb"), opq.pq))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("remb"), col("codes"), opq.pq) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      Some(s"""
      WITH RECURSIVE nptrain AS (
        SELECT * FROM embeddings
        WHERE ('0x' || substr(md5('pqs:' || CAST(vec_id AS VARCHAR)),
                1, 15))::BIGINT % 1000000 < 500000),
      ${opqNpCtes(powerIters = 4, m = 4, k = 4, iters = 2, subDim = 16,
        trainTable = "nptrain")},
      joined AS (
        SELECT e.vec_id, e.remb,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM np_rotated e
        JOIN nq0_codes c0 USING (vec_id) JOIN nq1_codes c1 USING (vec_id)
        JOIN nq2_codes c2 USING (vec_id) JOIN nq3_codes c3 USING (vec_id)
        JOIN nq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN nq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN nq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN nq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(remb[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- sampled PQ training (q157): codebooks train on the
    //      hash-sampled subset (md5 of "pqs:"+id under the fraction —
    //      the cross-engine hash device), everything still encodes —
    //      the 100 TB regime where a full-corpus train pass is ~100×
    //      wasted scan. The oracle replays the sampled seed, the
    //      sampled Lloyd iterations, and the full-table codes.
    Q("q157_pq_sampled_codes", (s, dir) => {
      import graft.operators.ProductQuantizer
      val e = Tables.embeddings(s, dir)
      val model = ProductQuantizer.fit(e, "vec_id", "embedding",
        m = 4, k = 4, iters = 2, sampleFraction = 0.5)
      e.withColumn("codes",
          ProductQuantizer.codesColumn(col("embedding"), model))
        .select(col("vec_id"),
          concat_ws(",", transform(col("codes"), _.cast("string")))
            .as("codes_csv"),
          floor(ProductQuantizer.reconErrColumn(
            col("embedding"), col("codes"), model) * 1e6)
            .cast("long").as("err_micro"))
    }, {
      val subCtes = (0 until 4).map(pqSubspaceCtes(_, k = 4, iters = 2,
        subDim = 16, trainTable = "pqtrain")).mkString(",\n      ")
      Some(s"""
      WITH pqtrain AS (
        SELECT * FROM embeddings
        WHERE ('0x' || substr(md5('pqs:' || CAST(vec_id AS VARCHAR)),
                1, 15))::BIGINT % 1000000 < 500000),
      $subCtes,
      joined AS (
        SELECT e.vec_id, e.embedding,
               c0.code AS k0, c1.code AS k1, c2.code AS k2, c3.code AS k3,
               cc0.c || cc1.c || cc2.c || cc3.c AS recon
        FROM embeddings e
        JOIN pq0_codes c0 USING (vec_id) JOIN pq1_codes c1 USING (vec_id)
        JOIN pq2_codes c2 USING (vec_id) JOIN pq3_codes c3 USING (vec_id)
        JOIN pq0_cent2 cc0 ON cc0.cell = c0.code
        JOIN pq1_cent2 cc1 ON cc1.cell = c1.code
        JOIN pq2_cent2 cc2 ON cc2.cell = c2.code
        JOIN pq3_cent2 cc3 ON cc3.cell = c3.code)
      SELECT vec_id,
             CAST(k0 AS VARCHAR) || ',' || CAST(k1 AS VARCHAR) || ','
               || CAST(k2 AS VARCHAR) || ',' || CAST(k3 AS VARCHAR)
               AS codes_csv,
             CAST(FLOOR(list_sum(list_transform(range(1, 65),
               i -> (CAST(embedding[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))
                  * (CAST(embedding[i] AS DOUBLE) - CAST(recon[i] AS DOUBLE))))
               * 1e6) AS BIGINT) AS err_micro
      FROM joined""")
    }),

    // ---- trained IVF cells: Lloyd's k-means over the embedding
    //      column, per-cell population. The whole pipeline is
    //      derandomized (first-k-by-id seeding, argmin with first-min
    //      tie-break), so DuckDB can replay the exact iterations: the
    //      per-iteration float32 cast of each centroid mean absorbs
    //      cross-engine double-summation noise (~1e-13 relative, 7
    //      orders below the float32 ulp), and the emitted columns are
    //      integers — hash-stable end to end.
    Q("q61_kmeans_cells", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (_, asgn) = graft.operators.KMeans.fit(
        e, "vec_id", "embedding", k = 8, iters = 3)
      asgn.groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_id"))
    }, Some(kmeansOracleSql(k = 8, iters = 3))),

    // ---- STREAMING embedding near-dup (round 8): the q34 planted-copy
    //      corpus replays through the file source with event times
    //      inside one 6 h window and `StreamingDedup
    //      .embeddingNearDupStream` (sign-bucket on arrival, windowed
    //      in-bucket pair expansion, exact cosine refine) must emit
    //      EXACTLY the batch q34 pair set, window-stamped. A flush
    //      vector 8 h ahead closes the window so append mode emits;
    //      it is alone in its own (never-closed) window, so whatever
    //      it resembles is outside the horizon by construction.
    Q("q110_stream_embedding_neardup", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val corpus = nearDupCorpus(s, dir)
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = corpus.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q110").toString
      corpus.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = graft.streaming.StreamingDedup.embeddingNearDupStream(
        stream, "vec_id", "embedding", "ts", bits = 8, minCosine = 0.99)
      val sink = "q110_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH corpus AS ($nearDupCorpusSql),
      e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM corpus)
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns, a, b, cosine FROM (
        SELECT x.vec_id AS a, y.vec_id AS b,
               ROUND(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
        FROM e x JOIN e y USING (bucket) WHERE x.vec_id < y.vec_id)
      WHERE cosine >= 0.99""")),

    // ---- MULTI-PROBE sign-LSH ANN (round 8): the Lv et al. recall
    //      lever — each query probes its own bucket plus the two
    //      Hamming-1 neighbors flipped at its smallest-|component|
    //      dims (the hyperplanes it sits closest to). The corpus side
    //      is untouched; the oracle derives the identical probe set
    //      (list_sort over (|q[i]|, i) structs) and the identical
    //      top-k.
    Q("q118_ann_lsh_multiprobe", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopKMultiProbe(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", bits = 8, nProbe = 3, k = 3)
    }, {
      def flipSql(o: Int) =
        s"""substr(bucket, 1, ord[$o] - 1)
           || (CASE WHEN substr(bucket, ord[$o], 1) = '1'
                    THEN '0' ELSE '1' END)
           || substr(bucket, ord[$o] + 1)"""
      Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
      qv AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket
             FROM e WHERE vec_id < 50),
      dims AS (SELECT q_id, q_vec, bucket,
                 list_transform(list_sort(list_transform(range(1, 9),
                   i -> {'a': abs(CAST(q_vec[i] AS DOUBLE)), 'i': i})),
                   st -> st.i) AS ord
               FROM qv),
      probes AS (
        SELECT q_id, q_vec, bucket AS probe FROM dims
        UNION ALL SELECT q_id, q_vec, ${flipSql(1)} FROM dims
        UNION ALL SELECT q_id, q_vec, ${flipSql(2)} FROM dims),
      p AS (SELECT pr.q_id, e.vec_id AS neighbor_id, pr.probe AS bucket,
              ${cosSql("pr.q_vec", "e.embedding")} AS cos
            FROM probes pr JOIN e ON e.bucket = pr.probe
            WHERE e.vec_id <> pr.q_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
      SELECT q_id, neighbor_id, bucket, ROUND(cos, 6) AS cosine,
             CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3""")
    }),

    // ---- TWO-WINDOW streaming near-dup (round 8): every prior
    //      windowed-pair oracle replays a single window, so window
    //      ATTRIBUTION and cross-window suppression are only
    //      spec-pinned. Here every planted group gets TWO exact
    //      copies: the +10000 copy lands in the SAME 6 h window as
    //      its base (windows alternate by group, so both windows
    //      carry real pairs), and the +20000 copy lands in the
    //      OPPOSITE window — identical vectors, same bucket, cosine
    //      1.0, yet none of its 100 would-be pairs may emit. The
    //      stream must reproduce each window's pair set under ITS
    //      OWN window_ns and nothing else.
    Q("q114_stream_neardup_two_windows", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t0 = 1_600_000_000_000_000_000L
      val winNs = 6L * 3600L * 1_000_000_000L
      val e = Tables.embeddings(s, dir)
      val planted = e.filter(col("vec_id") % 10 === 0)
      val corpus = e
        .unionByName(planted.withColumn("vec_id", col("vec_id") + 10000))
        .unionByName(planted.withColumn("vec_id", col("vec_id") + 20000))
        .withColumn("win", expr("""CASE
          WHEN vec_id < 10000 THEN vec_id div 10 % 2
          WHEN vec_id < 20000 THEN (vec_id - 10000) div 10 % 2
          ELSE 1 - (vec_id - 20000) div 10 % 2 END"""))
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("win") * lit(winNs)
            + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = corpus.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec).as("embedding"),
        lit(t0 + 20L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q114").toString
      // mtime-ordered ranges so window 0 arrives before window 1 and
      // neither is watermark-dropped (the multi-batch replay rule)
      corpus.unionByName(flush).repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(tmp)
      val base = System.currentTimeMillis()
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-"))
        .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(base + i * 1000L), s"stamp $f")
        }
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "2").parquet(tmp)
      val changes = graft.streaming.StreamingDedup.embeddingNearDupStream(
        stream, "vec_id", "embedding", "ts", bits = 8, minCosine = 0.99)
      val sink = "q114_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true)
      s.catalog.dropTempView(sink)
      out
    }, Some(s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id % 10 = 0
        UNION ALL
        SELECT vec_id + 20000, embedding FROM embeddings WHERE vec_id % 10 = 0),
      e AS (SELECT vec_id, embedding,
                   CASE WHEN vec_id < 10000 THEN vec_id // 10 % 2
                        WHEN vec_id < 20000 THEN (vec_id - 10000) // 10 % 2
                        ELSE 1 - (vec_id - 20000) // 10 % 2 END AS win,
                   ${bucketSql("embedding")} AS bucket FROM corpus)
      SELECT 1600000000000000000
               - 1600000000000000000 % 21600000000000
               + win * 21600000000000 AS window_ns,
             a, b, cosine FROM (
        SELECT x.win, x.vec_id AS a, y.vec_id AS b,
               ROUND(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
        FROM e x JOIN e y ON x.bucket = y.bucket AND x.win = y.win
        WHERE x.vec_id < y.vec_id)
      WHERE cosine >= 0.99""")),

    // ---- STREAMING ANN (round 8): a live QUERY stream probing the
    //      STATIC corpus — the library's first stream-static join.
    //      The q33 query set (vec_id < 50) replays through the file
    //      source; `StreamingSimilarity.annStream` sign-buckets each
    //      arriving query, equi-joins the persisted bucketed corpus
    //      (which never streams and carries no state), and emits the
    //      top-3 when the watermark closes the window — EXACTLY the
    //      batch q33 result, window-stamped. A flush query 8 h ahead
    //      closes the window; its own results are outside the horizon.
    Q("q111_stream_ann", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingSimilarity
      val t0 = 1_600_000_000_000_000_000L
      val e = Tables.embeddings(s, dir)
      val corpus = StreamingSimilarity.bucketCorpus(
        e, "vec_id", "embedding", bits = 8).persist()
      val qs = e.filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = e.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q111").toString
      qs.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = StreamingSimilarity.annStream(
        stream, corpus, "vec_id", "embedding", "ts", bits = 8, k = 3)
      val sink = "q111_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true) // eager: safe to unpersist
      s.catalog.dropTempView(sink)
      corpus.unpersist()
      out
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM e WHERE vec_id < 50),
      p AS (SELECT q.q_id, e.vec_id AS neighbor_id, q.bucket,
              ${cosSql("q.q_vec", "e.embedding")} AS cos
            FROM q JOIN e USING (bucket) WHERE e.vec_id <> q.q_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             q_id, neighbor_id, bucket, ROUND(cos, 6) AS cosine,
             CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3""")),

    // ---- LIVE corpus ingest → serve (round 8): the full loop. The
    //      corpus itself arrives on a stream and commits exactly-once
    //      per micro-batch into a TxTable (`corpusIngest`, the runTx
    //      idempotence pattern on vectors, pre-bucketed + norm-
    //      hoisted); `loadCorpus` snapshots the log with the serving
    //      cache layout; the q111 query replay probes THAT corpus —
    //      and must produce EXACTLY the q33 batch result, proving the
    //      ingested store serves identically to one built in place.
    Q("q115_corpus_ingest_serve", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingSimilarity
      val t0 = 1_600_000_000_000_000_000L
      val e = Tables.embeddings(s, dir)
      val feedDir = Scratch
        .tempDir("graft-q115-feed").toString
      e.select("vec_id", "embedding").repartition(8)
        .write.mode("overwrite").parquet(feedDir)
      val txRoot = Scratch
        .tempDir("graft-q115-tx").toString
      val tx = new graft.bank.TxTable(s, txRoot)
      val ingest = StreamingSimilarity.corpusIngest(
        s.readStream.schema(s.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", "3").parquet(feedDir),
        "vec_id", "embedding", bits = 8, tx,
        checkpointDir = s"$txRoot/_ck")
      ingest.awaitTermination()
      val corpus = StreamingSimilarity.loadCorpus(tx).persist()
      val qs = e.filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = e.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q115").toString
      qs.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = StreamingSimilarity.annStream(
        stream, corpus, "vec_id", "embedding", "ts", bits = 8, k = 3)
      val sink = "q115_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true) // eager: safe to unpersist
      s.catalog.dropTempView(sink)
      corpus.unpersist()
      out
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM e WHERE vec_id < 50),
      p AS (SELECT q.q_id, e.vec_id AS neighbor_id, q.bucket,
              ${cosSql("q.q_vec", "e.embedding")} AS cos
            FROM q JOIN e USING (bucket) WHERE e.vec_id <> q.q_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             q_id, neighbor_id, bucket, ROUND(cos, 6) AS cosine,
             CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3""")),

    // ---- STREAMING IVF ANN (round 8): the second serving path beside
    //      q111's sign-LSH — the q44 query set replays through the
    //      file source; `StreamingSimilarity.ivfStream` scores the
    //      centroid literal scan-locally, probes its 3 nearest cells
    //      (array-derived probe order, since rank windows don't exist
    //      on streams), equi-joins the persisted cell index, and emits
    //      the top-3 when the watermark closes the window — EXACTLY
    //      the batch q44 result, window-stamped.
    Q("q113_stream_ann_ivf", (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingSimilarity
      val t0 = 1_600_000_000_000_000_000L
      val e = Tables.embeddings(s, dir)
      val index = StreamingSimilarity.ivfIndex(
        e, "vec_id", "embedding", nCells = 16)
      index.cells.persist().count()
      val qs = e.filter(col("vec_id") < 25)
        .select(col("vec_id"), col("embedding"),
          (lit(t0) + col("vec_id") * lit(1_000_000L)).as("ts"))
      val flushVec = e.orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0) // 1 row: flush payload
      val flush = s.range(1).select(lit(999999999L).as("vec_id"),
        typedLit(flushVec).as("embedding"),
        lit(t0 + 8L * 3600L * 1_000_000_000L).as("ts"))
      val tmp = Scratch
        .tempDir("graft-q113").toString
      qs.unionByName(flush).repartition(8)
        .write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema).parquet(tmp)
      val changes = StreamingSimilarity.ivfStream(
        stream, index, "vec_id", "embedding", "ts", nProbe = 3, k = 3)
      val sink = "q113_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = changes.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(sink).localCheckpoint(true) // eager: safe to unpersist
      s.catalog.dropTempView(sink)
      index.cells.unpersist()
      out
    }, Some(s"""
      WITH cent AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
               embedding AS c_vec
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
      asgn AS (
        SELECT vec_id, embedding, cell_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cell_id ASC) AS rn
        FROM (SELECT e.vec_id, e.embedding, c.cell_id,
                     ${cosSql("c.c_vec", "e.embedding")} AS cos
              FROM embeddings e CROSS JOIN cent c)),
      cells AS (SELECT vec_id, embedding, cell_id FROM asgn WHERE rn = 1),
      probes AS (
        SELECT q_id, q_vec, cell_id FROM (
          SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cell_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cosSql("c.c_vec", "q.embedding")} DESC, c.cell_id ASC) AS rn
          FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 25)
        WHERE rn <= 3),
      cand AS (
        SELECT p.q_id, p.q_vec, n.vec_id AS neighbor_id, n.embedding AS n_vec
        FROM probes p JOIN cells n USING (cell_id) WHERE n.vec_id <> p.q_id),
      r AS (
        SELECT q_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM (SELECT q_id, neighbor_id, ${cosSql("q_vec", "n_vec")} AS cos FROM cand))
      SELECT 1600000000000000000 - 1600000000000000000 % 21600000000000
               AS window_ns,
             q_id, neighbor_id, ROUND(cos, 6) AS cosine,
             CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 3""")),

    // ---- k-center coreset selection (round 14): greedy farthest-point
    //      traversal (Gonzalez 1985) over the embedding corpus — the
    //      diversity-curation complement of the dedup family. The
    //      oracle UNROLLS the whole traversal in DuckDB (seed = min id,
    //      then 7× argmax-of-running-min with id tiebreak) and re-
    //      derives the final assignment; radii are raw doubles — the
    //      distance fold is rational arithmetic in pinned order, so the
    //      replay is exact with NO rounding.
    Q("q177_kcenter_coreset", (s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val picks = graft.operators.Coreset.kCenter(
        e, "vec_id", "embedding", k = 8)
      val sel = picks.map(c => (c.iter, c.id, c.radiusSq))
        .toDF("iter", "center_id", "radius_sq")
      val counts = graft.operators.Coreset
        .assign(e, "vec_id", "embedding", picks)
        .groupBy("iter").agg(count(lit(1)).as("n_assigned"))
      sel.join(counts, Seq("iter"))
        .select(col("iter").cast("int").as("iter"), col("center_id"),
          col("radius_sq"), col("n_assigned"))
    }, Some(kCenterOracleSql(k = 8))),

    // ---- coreset-seeded k-means (round 14): farthest-point picks are
    //      the classic derandomized k-means++ init — feed the q177
    //      traversal's centers to Lloyd's as seeds. The oracle
    //      composes the ENTIRE kCenter unroll with the full kmeans
    //      replay seeded from it (cent0 = the picks instead of
    //      first-k) — two derivations chained in one DuckDB query.
    Q("q181_kcenter_seeded_kmeans", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val picks = graft.operators.Coreset.kCenter(
        e, "vec_id", "embedding", k = 8)
      val (_, asgn) = graft.operators.KMeans.fit(
        e, "vec_id", "embedding", k = 8, iters = 3,
        init = picks.map(_.vec))
      asgn.groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_id"))
    }, Some(s"""
      WITH ${kCenterCtes(8)},
      ${kmeansCtes("ks", 8, 3, cent0Sql =
        "SELECT CAST(iter - 1 AS INT) AS cell, embedding AS c FROM sel")}
      SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n_vecs,
             MIN(vec_id) AS min_id
      FROM ksfinal_asgn GROUP BY cell"""))
  )

  /** DuckDB replay of [[graft.operators.Coreset.kCenter]]: the greedy
    * traversal unrolled — c1 = min id; m_i = running min squared-L2 to
    * the picks so far; c_{i+1} = argmax m_i (ties id asc); final
    * assignment by (d2 asc, iter asc). Distances are the same
    * diff²-fold both engines compute in the same order — exact, no
    * rounding anywhere.
    */
  /** The greedy traversal CTE chain alone (ends with `sel` = (iter,
    * vec_id, embedding, radius_sq)) — composable under further CTEs
    * (q181 seeds a k-means replay from it).
    */
  private def kCenterCtes(k: Int): String = {
    def d2(e: String, c: String) =
      s"""list_sum(list_transform(range(1, 65),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
            * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    val steps = (2 to k).map { i =>
      val upd =
        if (i == 2)
          s"""m1 AS (SELECT e.vec_id, e.embedding,
                 ${d2("e.embedding", "c.embedding")} AS mind
               FROM embeddings e CROSS JOIN c1 c)"""
        else
          s"""m${i - 1} AS (SELECT m.vec_id, m.embedding,
                 LEAST(m.mind, ${d2("m.embedding", "c.embedding")}) AS mind
               FROM m${i - 2} m CROSS JOIN c${i - 1} c)"""
      s"""$upd,
      c$i AS (SELECT vec_id, embedding, mind FROM m${i - 1}
              ORDER BY mind DESC, vec_id ASC LIMIT 1)"""
    }.mkString(",\n      ")
    val sel = (1 to k).map { i =>
      if (i == 1)
        s"SELECT 1 AS iter, vec_id, embedding, CAST(0.0 AS DOUBLE) AS radius_sq FROM c1"
      else
        s"SELECT $i AS iter, vec_id, embedding, mind AS radius_sq FROM c$i"
    }.mkString("\n        UNION ALL ")
    s"""c1 AS (SELECT vec_id, embedding FROM embeddings
                  ORDER BY vec_id LIMIT 1),
      $steps,
      sel AS ($sel)"""
  }

  private def kCenterOracleSql(k: Int): String = {
    def d2(e: String, c: String) =
      s"""list_sum(list_transform(range(1, 65),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
            * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    s"""
      WITH ${kCenterCtes(k)},
      asg AS (SELECT vec_id, iter FROM (
                SELECT e.vec_id, s.iter,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY ${d2("e.embedding", "s.embedding")} ASC,
                                  s.iter ASC) AS rn
                FROM embeddings e CROSS JOIN sel s)
              WHERE rn = 1)
      SELECT CAST(s.iter AS INT) AS iter, s.vec_id AS center_id,
             s.radius_sq, COUNT(*) AS n_assigned
      FROM sel s JOIN asg a ON s.iter = a.iter
      GROUP BY 1, 2, 3"""
  }

  /** DuckDB replay of [[graft.operators.KMeans.fit]]'s derandomized
    * Lloyd's loop: seed = first k vectors by id, each iteration
    * assigns by double-precision squared-L2 argmin (first-min cell
    * tie-break, matching `array_position(array_min)`) then recomputes
    * per-dim means cast to float32 (matching `.toFloat`); empty cells
    * keep their previous centroid (`means.getOrElse`).
    */
  /** DuckDB replay of [[graft.operators.ProductQuantizer.fit]] for
    * subspace `s`: the q61 k-means replay over the sub-slice
    * `embedding[s·subDim+1 .. (s+1)·subDim]` — same first-k-by-id
    * seeding, same argmin first-min tie-break, same per-iteration
    * float32 cast of each centroid mean. Emits CTEs `pq{s}_cent0 ..
    * pq{s}_cent$iters` and `pq{s}_codes(vec_id, code)`.
    */
  /** The OPQ rotation derivation as reusable CTEs — REQUIRES a
    * `WITH RECURSIVE` list. Mirrors `ProductQuantizer.eigenBasis` +
    * `fitOpq`'s allocation + `rotate` op for op (validated bit-exact
    * against the Scala arithmetic on the sf0.01 table): float32-cast
    * second moment (`opq_mom`), 64 power-iteration stages with
    * per-iteration float casts AND per-iteration classical-GS
    * reorthogonalization against recorded stages (stages separate by
    * PROJECTION, never deflation — deflating unconverged vectors on a
    * closely-spaced spectrum compounds, see eigenBasis), CGS2 +
    * Rayleigh at stage end (`opq_pw`), round-robin eigen-rank allocation
    * (`opq_rot(od, lam, rv)`), float32 rotated vectors
    * (`opq_rotated(vec_id, remb)`). list_sum over the ordered
    * list_transform is DuckDB's left fold — the exact shape of the
    * Scala while-loops.
    */
  /** The q155 power-stage recursion as a reusable CTE pair
    * `${prefix}pw` / `${prefix}final` over any 64×64 DOUBLE[][] matrix
    * selector — [[graft.operators.ProductQuantizer.eigenStages]]'s
    * derandomized loop (per-iteration float casts, per-iteration
    * classical-GS reorthogonalization against recorded stages, CGS2 +
    * Rayleigh at stage end). Round 13 extracted it so the
    * non-parametric OPQ's Procrustes solve (stages on M·Mᵀ) replays
    * through the same machinery.
    */
  private def powerStagesCtes(prefix: String, matrixSel: String,
                              powerIters: Int,
                              complete: Boolean = false): String = {
    // eigenStages' completeDegenerate branch (complete = true): a stage
    // whose CGS2 residual is <= 1e-6 is replaced by the standard basis
    // vector with the LARGEST CGS2 residual against recorded stages
    // (first-max tie-break — the argmax always clears 1/sqrt(d), where
    // a fixed 0.25 bar crashed on delocalized complements). Four layers
    // build it: cands1[j] = first GS pass of e_j (the dot against
    // evs[e] is just evs[e][j]); cdots[j][e] = second-pass dots;
    // cands[j] = second-pass residual; cnorms + jp = norms and the
    // first argmax index. All guarded NULL on non-degenerate stages so
    // the cost is paid only when completing.
    val completionLayers =
      if (!complete) ""
      else s"""
              SELECT c4x.*,
                     CASE WHEN nrm2 > 1e-6 THEN NULL ELSE
                       list_filter(range(1,65),
                         j -> cnorms[j] >= list_max(cnorms))[1] END AS jp
              FROM (
              SELECT c3x.*,
                     CASE WHEN nrm2 > 1e-6 THEN NULL ELSE
                       list_transform(cands, cr ->
                         sqrt(list_sum(list_transform(cr, x -> x * x))))
                       END AS cnorms
              FROM (
              SELECT c2x.*,
                     CASE WHEN nrm2 > 1e-6 THEN NULL ELSE
                       list_transform(range(1,65), j ->
                         list_transform(range(1,65), x ->
                           cands1[j][x] - COALESCE(list_sum(
                             list_transform(range(1, len(evs) + 1),
                               e -> cdots[j][e] * evs[e][x])), 0.0)))
                       END AS cands
              FROM (
              SELECT c1x.*,
                     CASE WHEN nrm2 > 1e-6 THEN NULL ELSE
                       list_transform(cands1, cr ->
                         list_transform(range(1, len(evs) + 1),
                           e -> list_sum(list_transform(range(1,65),
                                  x -> cr[x] * evs[e][x]))))
                       END AS cdots
              FROM (
              SELECT s1x.*,
                     CASE WHEN nrm2 > 1e-6 THEN NULL ELSE
                       list_transform(range(1,65), j ->
                         list_transform(range(1,65), x ->
                           (CASE WHEN x = j THEN 1.0 ELSE 0.0 END)
                             - COALESCE(list_sum(list_transform(
                                 range(1, len(evs) + 1),
                                 e -> evs[e][j] * evs[e][x])), 0.0)))
                       END AS cands1
              FROM ("""
    val completionClose = if (!complete) "" else ") s1x) c1x) c2x) c3x) c4x"
    val ufExpr =
      if (!complete) """list_transform(range(1,65), i ->
                     CASE WHEN nrm2 > 1e-30
                       THEN CAST(CAST(u2[i] / nrm2 AS FLOAT) AS DOUBLE)
                       ELSE CAST(CAST(u2[i] AS FLOAT) AS DOUBLE) END)"""
      else """CASE WHEN nrm2 > 1e-6
                     THEN list_transform(range(1,65), i ->
                       CAST(CAST(u2[i] / nrm2 AS FLOAT) AS DOUBLE))
                     ELSE list_transform(range(1,65), x ->
                       CAST(CAST(cands[jp][x] / cnorms[jp] AS FLOAT)
                         AS DOUBLE)) END"""
    s"""
      ${prefix}pw(stage, iter, v, a, evs, lams) AS (
        SELECT 0, 0,
               list_transform(range(1,65), i -> CAST(0.125 AS DOUBLE)),
               $matrixSel,
               CAST([] AS DOUBLE[][]), CAST([] AS DOUBLE[])
        UNION ALL
        SELECT
          CASE WHEN t.iter + 1 < $powerIters THEN t.stage
               ELSE t.stage + 1 END,
          CASE WHEN t.iter + 1 < $powerIters THEN t.iter + 1 ELSE 0 END,
          CASE WHEN t.iter + 1 < $powerIters THEN t.vnew
               ELSE list_transform(range(1,65),
                      i -> CAST(0.125 AS DOUBLE)) END,
          t.a,
          CASE WHEN t.iter + 1 < $powerIters THEN t.evs
               ELSE list_append(t.evs, t.uf) END,
          CASE WHEN t.iter + 1 < $powerIters THEN t.lams
               ELSE list_append(t.lams, t.lam) END
        FROM (
          SELECT s3.*,
                 CAST(list_sum(list_transform(range(1,65), r ->
                   uf[r] * list_sum(list_transform(range(1,65), c ->
                     a[r][c] * uf[c])))) AS FLOAT) AS lam
          FROM (
            SELECT s2.*,
                   $ufExpr
                     AS uf
            FROM ($completionLayers
              SELECT s1.*,
                     sqrt(list_sum(list_transform(u2, x -> x * x)))
                       AS nrm2
              FROM (
                SELECT s0b.*,
                       list_transform(range(1,65), i ->
                         u1[i] - COALESCE(list_sum(list_transform(
                           range(1, len(evs) + 1),
                           e -> u1dots[e] * evs[e][i])), 0.0)) AS u2
                FROM (
                  SELECT s0.*,
                         list_transform(range(1, len(evs) + 1),
                           e -> list_sum(list_transform(range(1,65),
                                  j -> u1[j] * evs[e][j]))) AS u1dots
                  FROM (
                    SELECT w0b.*,
                           list_transform(range(1,65), i ->
                             vnew[i] - COALESCE(list_sum(list_transform(
                               range(1, len(evs) + 1),
                               e -> vdots[e] * evs[e][i])), 0.0)) AS u1
                    FROM (
                      SELECT w0.*,
                             list_transform(range(1, len(evs) + 1),
                               e -> list_sum(list_transform(range(1,65),
                                      j -> vnew[j] * evs[e][j])))
                               AS vdots
                      FROM (
                        SELECT n0.*,
                               CASE WHEN nrm > 1e-30
                                 THEN list_transform(range(1,65), i ->
                                        CAST(CAST(w2[i] / nrm AS FLOAT)
                                          AS DOUBLE))
                                 ELSE v END AS vnew
                        FROM (
                          SELECT p0b.*,
                                 sqrt(list_sum(list_transform(w2,
                                   x -> x * x))) AS nrm
                          FROM (
                            SELECT p0.*,
                                   list_transform(range(1,65), i ->
                                     w[i] - COALESCE(list_sum(
                                       list_transform(
                                         range(1, len(evs) + 1),
                                         e -> wdots[e] * evs[e][i])),
                                       0.0)) AS w2
                            FROM (
                              SELECT m0.*,
                                     list_transform(
                                       range(1, len(evs) + 1),
                                       e -> list_sum(list_transform(
                                              range(1,65),
                                              j -> w[j] * evs[e][j])))
                                       AS wdots
                              FROM (
                                SELECT ${prefix}pw.*,
                                       list_transform(a, row ->
                                         list_sum(list_transform(
                                           range(1,65),
                                           i -> row[i] * v[i]))) AS w
                                FROM ${prefix}pw WHERE stage < 64) m0) p0)
                            p0b) n0) w0) w0b) s0) s0b) s1$completionClose) s2) s3) t),
      -- MATERIALIZED: DuckDB inlines plain CTEs per reference, so the
      -- 512-step recursion (and the rotated table the Lloyd replays
      -- re-read per subspace per iteration) would otherwise re-run
      -- once per downstream mention — measured minutes per query
      ${prefix}final AS MATERIALIZED (
        SELECT evs, lams FROM ${prefix}pw WHERE stage = 64 AND iter = 0)"""
  }

  private def opqRotationCtes(powerIters: Int, m: Int, subDim: Int,
                              momentTable: String = "embeddings",
                              rotateTable: String = "embeddings",
                              prefix: String = "opq_",
                              vecExpr: String = "embedding"): String = s"""
      ${prefix}mom AS (
        SELECT list(rowv ORDER BY rr) AS a FROM (
          SELECT rr, list(CAST(CAST(mu AS FLOAT) AS DOUBLE) ORDER BY cc)
                   AS rowv
          FROM (
            SELECT r2 AS rr, c2 AS cc,
                   SUM(CAST($vecExpr[r2] AS DOUBLE)
                     * CAST($vecExpr[c2] AS DOUBLE))
                     / (SELECT count(*) FROM $momentTable) AS mu
            FROM $momentTable,
                 unnest(range(1,65)) t1(r2), unnest(range(1,65)) t2(c2)
            GROUP BY r2, c2)
          GROUP BY rr)),
      ${powerStagesCtes(prefix, s"(SELECT a FROM ${prefix}mom)", powerIters)},
      ${prefix}ranked AS (
        SELECT stg, lam, ev,
               row_number() OVER (ORDER BY lam DESC, stg ASC) AS j
        FROM (SELECT unnest(range(1,65)) AS stg, unnest(lams) AS lam,
                     unnest(evs) AS ev FROM ${prefix}final)),
      ${prefix}rot AS (
        SELECT CAST(((j-1) % $m) * $subDim + (j-1) // $m + 1 AS INT)
                 AS od,
               lam, ev AS rv
        FROM ${prefix}ranked),
      ${prefix}rotated AS MATERIALIZED (
        SELECT vec_id, list(comp ORDER BY od) AS remb FROM (
          SELECT e.vec_id, r.od,
                 CAST(CAST(list_sum(list_transform(range(1,65),
                   i -> r.rv[i] * CAST(e.$vecExpr[i] AS DOUBLE)))
                   AS FLOAT) AS DOUBLE) AS comp
          FROM $rotateTable e CROSS JOIN ${prefix}rot r)
        GROUP BY vec_id)"""

  /** The WHOLE non-parametric OPQ derivation ([[graft.operators
    * .ProductQuantizer.fitOpqNp]], one alternation) as reusable CTEs,
    * parameterized on the train table — extracted from the q164
    * oracle in round 14 so the OPQ retrain loop (q169) can replay the
    * rotation refit over a DERIVED corpus (the unrotated union store)
    * through the same machinery. Emits, for `table`/`vecExpr`:
    *   - `${initPrefix}mom..rotated` — the parametric init R₀
    *     ([[opqRotationCtes]]);
    *   - `${fpPrefix}N_*` — the first codebooks (trained on
    *     R₀-rotated vectors);
    *   - `${p}recon/m/s/pw/final/fro/vrec/rot` — the alternation:
    *     cross-covariance M = E[x·ŷᵀ], U = power stages of M·Mᵀ
    *     (WITH the argmax basis completion — M is rank ≤ k·m by
    *     construction), the sequential CGS2 V recursion, R₁ = V·Uᵀ;
    *   - `${p}rotated(vec_id, remb)` — `table` rotated by R₁;
    *   - `${nqPrefix}N_*` — the refit codebooks on R₁-rotated vectors.
    * `trainTable` (when set) replays the sampled regime: the moment
    * pass, both codebook fits, AND the cross-covariance read only the
    * sample; rotation application and final codes read `table` — the
    * fitOpqNp(sampleFraction) split.
    */
  private def opqNpCtes(powerIters: Int, m: Int, k: Int, iters: Int,
                        subDim: Int,
                        table: String = "embeddings",
                        vecExpr: String = "embedding",
                        trainTable: String = "",
                        initPrefix: String = "npi_",
                        fpPrefix: String = "npq",
                        p: String = "np_",
                        nqPrefix: String = "nq"): String = {
    val train = if (trainTable.isEmpty) table else trainTable
    // first codebooks train on the R₀-rotated TRAIN rows; when sampled,
    // the rotated sample is the rotated table restricted to train ids
    val fpTrain =
      if (trainTable.isEmpty) s"${initPrefix}rotated"
      else s"${p}ftrain"
    val fpTrainCte =
      if (trainTable.isEmpty) ""
      else s"""
      ${p}ftrain AS (
        SELECT r.* FROM ${initPrefix}rotated r
        JOIN $trainTable t USING (vec_id)),"""
    val subCtes = (0 until m).map(pqSubspaceCtes(_, k = k, iters = iters,
      subDim = subDim, table = s"${initPrefix}rotated", vecExpr = "remb",
      trainTable = if (trainTable.isEmpty) "" else fpTrain,
      namePrefix = fpPrefix)).mkString(",\n      ")
    val nqTrain =
      if (trainTable.isEmpty) s"${p}rotated"
      else s"${p}ntrain"
    val nqTrainCte =
      if (trainTable.isEmpty) ""
      else s"""
      ${p}ntrain AS (
        SELECT r.* FROM ${p}rotated r
        JOIN $trainTable t USING (vec_id)),"""
    val nqCtes = (0 until m).map(pqSubspaceCtes(_, k = k, iters = iters,
      subDim = subDim, table = s"${p}rotated", vecExpr = "remb",
      trainTable = if (trainTable.isEmpty) "" else nqTrain,
      namePrefix = nqPrefix)).mkString(",\n      ")
    val reconCols = (0 until m).map(s => s"cc$s.c").mkString(" || ")
    val reconJoins = (0 until m).map(s =>
      s"JOIN ${fpPrefix}${s}_codes c$s USING (vec_id)").mkString("\n        ") +
      "\n        " + (0 until m).map(s =>
      s"JOIN ${fpPrefix}${s}_cent$iters cc$s ON cc$s.cell = c$s.code")
      .mkString("\n        ")
    s"""${opqRotationCtes(powerIters, m, subDim, momentTable = train,
        rotateTable = table, prefix = initPrefix, vecExpr = vecExpr)},$fpTrainCte
      $subCtes,
      ${p}recon AS MATERIALIZED (
        SELECT e.vec_id, $reconCols AS recon
        FROM ${initPrefix}rotated e
        $reconJoins),
      ${p}m AS MATERIALIZED (
        SELECT list(rowv ORDER BY rr) AS mmv FROM (
          SELECT rr, list(CAST(CAST(mu AS FLOAT) AS DOUBLE) ORDER BY cc)
                   AS rowv
          FROM (
            SELECT r2 AS rr, c2 AS cc,
                   SUM(CAST(e.$vecExpr[r2] AS DOUBLE)
                     * CAST(rec.recon[c2] AS DOUBLE))
                     / (SELECT count(*) FROM $train) AS mu
            FROM $train e JOIN ${p}recon rec USING (vec_id),
                 unnest(range(1,65)) t1(r2), unnest(range(1,65)) t2(c2)
            GROUP BY r2, c2)
          GROUP BY rr)),
      ${p}s AS (
        SELECT list(rowv ORDER BY rr) AS a FROM (
          SELECT rr, list(sv ORDER BY cc) AS rowv FROM (
            SELECT t1.rr AS rr, t2.cc AS cc,
                   list_sum(list_transform(range(1,65),
                     j -> mmv[rr][j] * mmv[cc][j])) AS sv
            FROM ${p}m, unnest(range(1,65)) t1(rr),
                 unnest(range(1,65)) t2(cc))
          GROUP BY rr)),
      ${powerStagesCtes(p, s"(SELECT a FROM ${p}s)", powerIters,
        complete = true)},
      ${p}fro AS (
        SELECT sqrt(list_sum(list_transform(flatten(mmv),
          x -> x * x))) AS fro
        FROM ${p}m),
      ${p}vrec(i, vlist) AS (
        SELECT 0, CAST([] AS DOUBLE[][])
        UNION ALL
        SELECT i + 1, list_append(vlist, vfin) FROM (
          SELECT k5.*,
                 CASE WHEN sig > 1e-9 * fro
                   THEN list_transform(range(1,65), x ->
                     CAST(CAST(w2b[x] / sig AS FLOAT) AS DOUBLE))
                   ELSE list_transform(range(1,65), x ->
                     CAST(CAST(kcands[kjp][x] / kcnorms[kjp] AS FLOAT)
                       AS DOUBLE)) END AS vfin
          FROM (
            SELECT k4.*,
                   CASE WHEN sig > 1e-9 * fro THEN NULL ELSE
                     list_filter(range(1,65),
                       j -> kcnorms[j] >= list_max(kcnorms))[1] END AS kjp
            FROM (
              SELECT k3.*,
                     CASE WHEN sig > 1e-9 * fro THEN NULL ELSE
                       list_transform(kcands, cr ->
                         sqrt(list_sum(list_transform(cr, x -> x * x))))
                       END AS kcnorms
              FROM (
                SELECT k2.*,
                       CASE WHEN sig > 1e-9 * fro THEN NULL ELSE
                         list_transform(range(1,65), j ->
                           list_transform(range(1,65), x ->
                             kcands1[j][x] - COALESCE(list_sum(
                               list_transform(range(1, len(vlist) + 1),
                                 e -> kcdots[j][e] * vlist[e][x])), 0.0)))
                         END AS kcands
                FROM (
                  SELECT k1.*,
                         CASE WHEN sig > 1e-9 * fro THEN NULL ELSE
                           list_transform(kcands1, cr ->
                             list_transform(range(1, len(vlist) + 1),
                               e -> list_sum(list_transform(range(1,65),
                                      x -> cr[x] * vlist[e][x]))))
                           END AS kcdots
                  FROM (
                    SELECT s1.*,
                           CASE WHEN sig > 1e-9 * fro THEN NULL ELSE
                             list_transform(range(1,65), j ->
                               list_transform(range(1,65), x ->
                                 (CASE WHEN x = j THEN 1.0 ELSE 0.0 END)
                                   - COALESCE(list_sum(list_transform(
                                       range(1, len(vlist) + 1),
                                       e -> vlist[e][j] * vlist[e][x])),
                                     0.0)))
                             END AS kcands1
                    FROM (
            SELECT s1a.*,
                   sqrt(list_sum(list_transform(w2b, x -> x * x))) AS sig
            FROM (
              SELECT s0b.*,
                     list_transform(range(1,65), x ->
                       w1b[x] - COALESCE(list_sum(list_transform(
                         range(1, len(vlist) + 1),
                         e -> d2[e] * vlist[e][x])), 0.0)) AS w2b
              FROM (
                SELECT s0.*,
                       list_transform(range(1, len(vlist) + 1),
                         e -> list_sum(list_transform(range(1,65),
                                x -> w1b[x] * vlist[e][x]))) AS d2
                FROM (
                  SELECT w0b.*,
                         list_transform(range(1,65), x ->
                           w0[x] - COALESCE(list_sum(list_transform(
                             range(1, len(vlist) + 1),
                             e -> d1[e] * vlist[e][x])), 0.0)) AS w1b
                  FROM (
                    SELECT w00.*,
                           list_transform(range(1, len(vlist) + 1),
                             e -> list_sum(list_transform(range(1,65),
                                    x -> w0[x] * vlist[e][x]))) AS d1
                    FROM (
                      SELECT ${p}vrec.i, ${p}vrec.vlist, nf.fro,
                             list_transform(range(1,65), r ->
                               list_sum(list_transform(range(1,65),
                                 j -> m.mmv[j][r]
                                   * f.evs[${p}vrec.i + 1][j]))) AS w0
                      FROM ${p}vrec, ${p}m m, ${p}final f, ${p}fro nf
                      WHERE ${p}vrec.i < 64) w00) w0b) s0) s0b) s1a)
                    s1) k1) k2) k3) k4) k5)),
      ${p}rot AS MATERIALIZED (
        SELECT rr, list(val ORDER BY cc) AS rv FROM (
          SELECT t1.rr AS rr, t2.cc AS cc,
                 CAST(CAST(list_sum(list_transform(range(1,65),
                   i2 -> vl.vlist[i2][t1.rr] * f.evs[i2][t2.cc]))
                   AS FLOAT) AS DOUBLE) AS val
          FROM (SELECT vlist FROM ${p}vrec WHERE i = 64) vl,
               ${p}final f,
               unnest(range(1,65)) t1(rr), unnest(range(1,65)) t2(cc))
        GROUP BY rr),
      ${p}rotated AS MATERIALIZED (
        SELECT vec_id, list(comp ORDER BY rr) AS remb FROM (
          SELECT e.vec_id, r.rr,
                 CAST(CAST(list_sum(list_transform(range(1,65),
                   i -> r.rv[i] * CAST(e.$vecExpr[i] AS DOUBLE)))
                   AS FLOAT) AS DOUBLE) AS comp
          FROM $table e CROSS JOIN ${p}rot r)
        GROUP BY vec_id),$nqTrainCte
      $nqCtes"""
  }

  /** `trainTable` ≠ `table` replays [[graft.operators.ProductQuantizer
    * .fit]]'s sampled-training mode: seeding + Lloyd iterations read
    * the (hash-sampled) train CTE, the final `pqN_codes` assignment
    * reads the full table — exactly the fit(sampleFraction)/encode
    * split.
    */
  private def pqSubspaceCtes(s: Int, k: Int, iters: Int, subDim: Int,
                             table: String = "embeddings",
                             vecExpr: String = "embedding",
                             trainTable: String = "",
                             namePrefix: String = "pq"): String = {
    val train = if (trainTable.isEmpty) table else trainTable
    val lo = s * subDim + 1
    def sub(e: String) =
      s"list_transform(range($lo, ${lo + subDim}), i -> $e[i])"
    def d2(e: String, c: String) =
      s"""list_sum(list_transform(range(1, ${subDim + 1}),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
            * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    def asgn(cent: String, src: String) = s"""
      SELECT vec_id, sub, cell FROM (
        SELECT e.vec_id, e.sub, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${d2("e.sub", "c.c")} ASC, c.cell ASC) AS rn
        FROM (SELECT vec_id, ${sub(vecExpr)} AS sub FROM $src) e
        CROSS JOIN $cent c)
      WHERE rn = 1"""
    def nextCent(prev: String, asgnT: String) = s"""
      SELECT p.cell, COALESCE(m.c, p.c) AS c
      FROM $prev p LEFT JOIN (
        SELECT cell, list(mu ORDER BY dim) AS c FROM (
          SELECT cell, dim, CAST(AVG(CAST(v AS DOUBLE)) AS FLOAT) AS mu
          FROM (SELECT cell, unnest(range(1, ${subDim + 1})) AS dim,
                       unnest(sub) AS v FROM $asgnT)
          GROUP BY cell, dim)
        GROUP BY cell) m USING (cell)"""
    val p = namePrefix
    val iterCtes = (1 to iters).map { i =>
      s"""$p${s}_asgn$i AS (${asgn(s"$p${s}_cent${i - 1}", train)}),
      $p${s}_cent$i AS (${nextCent(s"$p${s}_cent${i - 1}", s"$p${s}_asgn$i")})"""
    }.mkString(",\n      ")
    s"""$p${s}_cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               ${sub(vecExpr)} AS c
        FROM (SELECT * FROM $train ORDER BY vec_id LIMIT $k)),
      $iterCtes,
      $p${s}_codes AS (SELECT vec_id, cell AS code, sub
                       FROM (${asgn(s"$p${s}_cent$iters", table)}))"""
  }

  /** The q61 full-vector k-means replay as reusable CTEs (prefix`cent0
    * .. cent$iters`, prefix`final_asgn(vec_id, embedding, cell)`) —
    * the coarse-quantizer half of the q154 IVFADC replay.
    */
  private def kmeansCtes(prefix: String, k: Int, iters: Int,
                         table: String = "embeddings",
                         vecExpr: String = "embedding",
                         cent0Sql: String = ""): String = {
    def d2(e: String, c: String) =
      s"""list_sum(list_transform(range(1, 65),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
            * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    def asgn(cent: String) = s"""
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.$vecExpr AS embedding, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${d2(s"e.$vecExpr", "c.c")} ASC, c.cell ASC) AS rn
        FROM $table e CROSS JOIN $cent c)
      WHERE rn = 1"""
    def nextCent(prev: String, asgnT: String) = s"""
      SELECT p.cell, COALESCE(m.c, p.c) AS c
      FROM $prev p LEFT JOIN (
        SELECT cell, list(m ORDER BY dim) AS c FROM (
          SELECT cell, dim, CAST(AVG(CAST(v AS DOUBLE)) AS FLOAT) AS m
          FROM (SELECT cell, unnest(range(1, 65)) AS dim,
                       unnest(embedding) AS v FROM $asgnT)
          GROUP BY cell, dim)
        GROUP BY cell) m USING (cell)"""
    val iterCtes = (1 to iters).map { i =>
      s"""${prefix}asgn$i AS (${asgn(s"${prefix}cent${i - 1}")}),
      ${prefix}cent$i AS (${nextCent(s"${prefix}cent${i - 1}", s"${prefix}asgn$i")})"""
    }.mkString(",\n      ")
    val cent0 =
      if (cent0Sql.nonEmpty) cent0Sql
      else s"""
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               $vecExpr AS c
        FROM (SELECT * FROM $table ORDER BY vec_id LIMIT $k)"""
    s"""${prefix}cent0 AS ($cent0),
      $iterCtes,
      ${prefix}final_asgn AS (${asgn(s"${prefix}cent$iters")})"""
  }

  private def kmeansOracleSql(k: Int, iters: Int): String = {
    def d2(e: String, c: String) =
      s"""list_sum(list_transform(range(1, 65),
         i -> (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))
            * (CAST($e[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))))"""
    def asgn(cent: String) = s"""
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${d2("e.embedding", "c.c")} ASC, c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN $cent c)
      WHERE rn = 1"""
    def nextCent(prev: String, asgnT: String) = s"""
      SELECT p.cell, COALESCE(m.c, p.c) AS c
      FROM $prev p LEFT JOIN (
        SELECT cell, list(m ORDER BY dim) AS c FROM (
          SELECT cell, dim, CAST(AVG(CAST(v AS DOUBLE)) AS FLOAT) AS m
          FROM (SELECT cell, unnest(range(1, 65)) AS dim,
                       unnest(embedding) AS v FROM $asgnT)
          GROUP BY cell, dim)
        GROUP BY cell) m USING (cell)"""
    val iterCtes = (1 to iters).map { i =>
      s"""asgn$i AS (${asgn(s"cent${i - 1}")}),
      cent$i AS (${nextCent(s"cent${i - 1}", s"asgn$i")})"""
    }.mkString(",\n      ")
    s"""
      WITH cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               embedding AS c
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k)),
      $iterCtes,
      final_asgn AS (${asgn(s"cent$iters")})
      SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n_vecs,
             MIN(vec_id) AS min_id
      FROM final_asgn GROUP BY cell"""
  }
}
