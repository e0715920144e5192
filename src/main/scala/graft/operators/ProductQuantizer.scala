package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product quantization
  * for nearest neighbor search", IEEE TPAMI 2011) — the compression
  * layer that makes embedding search survive 100 TB: the d-dim float
  * vector (d·4 bytes) becomes m codebook indices (m bytes at k ≤ 256),
  * a 32× reduction at the default geometry, and query distances are
  * answered from the codes alone via asymmetric distance computation
  * (ADC) — the corpus's float vectors are never read at query time.
  *
  * Spark-first shape:
  *   - TRAIN ([[fit]]): Lloyd's per subspace, FUSED — every iteration
  *     is ONE aggregation pass over (corpus × dims) rows keyed by
  *     (subspace, cell, dim), so m codebooks cost the same number of
  *     corpus scans as one ([[KMeans.fit]] per subspace would pay m×).
  *     Codebooks collect to the driver (m·k·subDim floats — KBs) and
  *     ship back as ONE literal; the corpus never shuffles.
  *   - ENCODE ([[encode]]): a narrow scan-local projection (argmin per
  *     subspace against the broadcast codebook literal) — zero
  *     shuffle at any corpus size.
  *   - QUERY ([[adcTopK]]): per-query distance TABLES (m·k doubles)
  *     are computed driver-side from the query vectors and broadcast;
  *     each corpus row's distance is m array lookups summed in ARRAY
  *     ORDER (deterministic); top-k via a per-query rank window
  *     (WindowGroupLimit prunes map-side).
  *
  * Everything is derandomized exactly like [[KMeans]] (q61): first-k-
  * by-id seeding per subspace, argmin with first-min tie-break,
  * per-iteration float32 cast of each centroid mean (absorbs
  * cross-engine double-summation noise) — so DuckDB can replay
  * training bit for bit and the q152/q153 oracles pin codes,
  * reconstruction error, and ADC neighbors end to end.
  */
object ProductQuantizer {

  /** Trained model: `codebooks(s)(j)` is subspace s's j-th centroid
    * (subDim floats). Total size m·k·subDim floats — kilobytes; always
    * driver-resident and shipped as a plan literal.
    */
  final case class PQModel(m: Int, k: Int, subDim: Int,
                           codebooks: Seq[Seq[Seq[Float]]]) {
    require(codebooks.length == m && codebooks.forall(_.length == k)
      && codebooks.forall(_.forall(_.length == subDim)),
      s"codebook geometry must be [$m][$k][$subDim]")
  }

  /** Squared-L2 distances from `sub` to every centroid of `cb`
    * (a [k][subDim] array column), summed in index order.
    */
  private def distArr(sub: Column, cb: Column): Column =
    transform(cb, c =>
      aggregate(
        zip_with(sub, c, (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }),
        lit(0.0), (acc, x) => acc + x))

  private def argmin(d: Column): Column =
    (array_position(d, array_min(d)) - 1).cast("int")

  /** The per-subspace slices of a vector as one array-of-arrays. */
  private def subSlices(vec: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      s => slice(vec, s * subDim + 1, lit(subDim)))

  /** Primitive-array form of a codebook set for hot loops. */
  private def toArrays(cbs: Seq[Seq[Seq[Float]]]): Array[Array[Array[Float]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  /** Nearest-centroid index (first-min tie-break) for one subspace —
    * the shared hot loop of train/encode.
    */
  private def nearest(v: scala.collection.Seq[Float], off: Int,
                      cb: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cb.length) {
      val c = cb(j)
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val d = v(off + i).toDouble - c(i).toDouble
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = j } // strict <: first min
      j += 1
    }
    best
  }

  /** Train m codebooks of k centroids each. `iters` Lloyd iterations,
    * each ONE pass over the corpus: assignments and per-(subspace,
    * cell, dim) partial sums accumulate INSIDE each partition
    * (primitive loops — the nested higher-order-function expression
    * form measured ~1 ms/row at m=8, k=256), then m·k·subDim tiny
    * rows shuffle to the final sum. Means cast to float32 per
    * iteration (q61's cross-engine noise absorber — partial-sum
    * merge order is partitioning-dependent either way, and the cast
    * swallows it). Vectors must share a length d with d % m == 0;
    * empty cells keep their previous centroid.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int, iters: Int): PQModel = {
    val first = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toSeq).toSeq
    require(first.length == k,
      s"PQ fit needs >= $k rows to seed k=$k codewords, got ${first.length}")
    val d = first.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val subDim = d / m
    // seed: subspace s's codebook = the first-k vectors' s-th slices
    var cbs: Seq[Seq[Seq[Float]]] = (0 until m).map(s =>
      first.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(vecCol)).as[Seq[Float]]
    for (_ <- 0 until iters) {
      val cbArr = toArrays(cbs)
      val means = vecs.mapPartitions { it =>
        // one accumulator per partition: [m][k] x (subDim sums + count)
        val sums = Array.ofDim[Double](m, k, subDim)
        val counts = Array.ofDim[Long](m, k)
        it.foreach { v =>
          var s = 0
          while (s < m) {
            val cell = nearest(v, s * subDim, cbArr(s))
            counts(s)(cell) += 1L
            val acc = sums(s)(cell)
            var i = 0
            while (i < subDim) { acc(i) += v(s * subDim + i); i += 1 }
            s += 1
          }
        }
        (for {
          s <- (0 until m).iterator
          j <- (0 until k).iterator
          if counts(s)(j) > 0L
        } yield (s, j, sums(s)(j), counts(s)(j))).iterator
      }.toDF("s", "cell", "sums", "n")
        // per-dim final sum: each exploded row carries its partition's
        // count, so sum(n) per (s, cell, dim) is the cell total
        .select(col("s"), col("cell"), col("n"),
          posexplode(col("sums")).as(Seq("dim", "ps")))
        .groupBy("s", "cell", "dim")
        .agg((sum("ps") / sum("n")).as("mu"))
        .collect()
        .groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("cell")))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getAs[Int]("dim"))
            .map(_.getAs[Double]("mu").toFloat).toSeq
        }
      cbs = (0 until m).map(s => (0 until k).map(j =>
        means.getOrElse((s, j), cbs(s)(j))))
    }
    PQModel(m, k, subDim, cbs)
  }

  /** The m-code column for a vector column under `model` — a pure
    * scan-local expression (argmin per subspace against the codebook
    * literal, first-min tie-break).
    */
  def codesColumn(vec: Column, model: PQModel): Column = {
    val cbLit = typedlit(model.codebooks)
    transform(sequence(lit(0), lit(model.m - 1)), s =>
      argmin(distArr(slice(vec, s * model.subDim + 1, lit(model.subDim)),
        element_at(cbLit, s + 1))))
  }

  /** Encode the corpus: idCol (LongType) + `codes` (array<int>, length
    * m). Zero shuffle — this is the projection a 100 TB encode job
    * runs. Primitive mapPartitions loops, not the [[codesColumn]]
    * expression: the nested higher-order-function form pays ~1 ms/row
    * at m=8, k=256 (interpreted lambdas over a 3-D literal), the loop
    * ~10 µs — same codec-hot-path rule as the media decoders. Both
    * forms share [[nearest]]'s arithmetic, so codes are bit-identical
    * (spec-pinned).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: PQModel): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbArr = toArrays(model.codebooks)
    val m = model.m
    val subDim = model.subDim
    corpus.select(col(idCol), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) {
            codes(s) = nearest(v, s * subDim, cbArr(s))
            s += 1
          }
          (id, codes)
        }
      }.toDF(idCol, "codes")
  }

  /** Reconstructed (decoded) vector for a codes column — the centroid
    * concatenation. Used by the q152 reconstruction-error verdict and
    * by re-ranking layers that want an approximate vector back.
    */
  def reconstructColumn(codes: Column, model: PQModel): Column = {
    val cbLit = typedlit(model.codebooks)
    flatten(transform(sequence(lit(0), lit(model.m - 1)),
      s => element_at(element_at(cbLit, s + 1),
        element_at(codes, s + 1) + 1)))
  }

  /** Squared-L2 reconstruction error ||v − decode(encode(v))||²,
    * summed in index order (deterministic).
    */
  def reconErrColumn(vec: Column, codes: Column, model: PQModel): Column =
    aggregate(
      zip_with(vec, reconstructColumn(codes, model), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** ADC top-k: for each query vector, the k nearest corpus CODES by
    * asymmetric distance Σ_s ||q_s − c_{s,code_s}||². The per-query
    * distance tables (m·k doubles each) are computed driver-side and
    * broadcast as one literal with the Q-row query frame; the corpus
    * side reads codes only — m array lookups + an index-order sum per
    * (row, query). Ties break on corpus id ascending.
    *
    * Output: q_id, nn_id, dist (double), rank.
    */
  def adcTopK(codes: DataFrame, idCol: String, model: PQModel,
              queries: Seq[(Long, Seq[Float])], k: Int): DataFrame = {
    require(queries.nonEmpty, "adcTopK needs at least one query")
    val tables: Array[(Long, Array[Array[Double]])] =
      queries.map { case (qid, q) =>
        require(q.length == model.m * model.subDim,
          s"query dim ${q.length} != ${model.m * model.subDim}")
        qid -> (0 until model.m).map { s =>
          (0 until model.k).map { j =>
            var acc = 0.0
            var i = 0
            while (i < model.subDim) {
              val d = q(s * model.subDim + i).toDouble -
                model.codebooks(s)(j)(i).toDouble
              acc += d * d
              i += 1
            }
            acc
          }.toArray
        }.toArray
      }.toArray
    val spark = codes.sparkSession
    import spark.implicits._
    val m = model.m
    // per-partition bounded top-k heaps per query (the distributed
    // top-k shape): each partition emits at most Q·k candidate rows,
    // so the final rank window sees parts·Q·k rows, never the corpus.
    // The distance loop adds dtable entries in subspace order — the
    // exact fold [[codesColumn]]-based verification and the q153
    // oracle replay use.
    val partials = codes.select(col(idCol), col("codes"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        val heaps = tables.map(_ =>
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.Tuple2[Double, Long]))
        it.foreach { case (id, cs) =>
          var q = 0
          while (q < tables.length) {
            val dt = tables(q)._2
            var acc = 0.0
            var s = 0
            while (s < m) { acc += dt(s)(cs(s)); s += 1 }
            val h = heaps(q)
            if (h.size < k) h.enqueue((acc, id))
            else {
              val worst = h.head // max by (dist, id)
              if (acc < worst._1 || (acc == worst._1 && id < worst._2)) {
                h.dequeue(); h.enqueue((acc, id)); ()
              }
            }
            q += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (dd, id) => (tables(qi)._1, id, dd) }
        }
      }.toDF("q_id", "nn_id", "dist")
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist").asc, col("nn_id").asc)
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("dist"),
        col("rank").cast("int").as("rank"))
  }

  /** IVFADC index rows (Jégou et al. §V: coarse quantizer + PQ on the
    * RESIDUAL): per vector, the nearest coarse cell, then the PQ codes
    * of v − centroid(cell). One scan-local primitive pass; write the
    * result `partitionBy("cell")` and a probed query reads only
    * nprobe/C of the store (partition pruning — the 100 TB serving
    * layout). Residuals are computed in float32 (x − c per dimension)
    * so the DuckDB oracle replays them bit for bit.
    */
  def encodeIvf(corpus: DataFrame, idCol: String, vecCol: String,
                coarse: Seq[Seq[Float]], model: PQModel): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarseArr = coarse.map(_.toArray).toArray
    val cbArr = toArrays(model.codebooks)
    val m = model.m
    val subDim = model.subDim
    corpus.select(col(idCol), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val cell = nearest(v, 0, coarseArr)
          val cent = coarseArr(cell)
          val r = new Array[Float](v.length)
          var i = 0
          while (i < r.length) { r(i) = v(i) - cent(i); i += 1 }
          val rw: scala.collection.Seq[Float] = r
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) {
            codes(s) = nearest(rw, s * subDim, cbArr(s))
            s += 1
          }
          (id, cell, codes)
        }
      }.toDF(idCol, "cell", "codes")
  }

  /** IVFADC top-k: each query ranks the coarse cells (first-min ties),
    * probes the nearest `nprobe`, and scores only rows in those cells
    * by the residual ADC distance ‖(q − centroid(cell)) − decode‖².
    * Driver side builds one distance table per (query, probed cell)
    * (nprobe·m·k doubles per query — KBs); executor side filters
    * `cell` to the probed union (partition pruning when the index is
    * written partitionBy(cell)) and keeps per-(query) bounded top-k
    * heaps — ≤ parts·Q·k rows reach the final rank window.
    */
  def ivfAdcTopK(index: DataFrame, idCol: String,
                 coarse: Seq[Seq[Float]], model: PQModel,
                 queries: Seq[(Long, Seq[Float])], k: Int,
                 nprobe: Int): DataFrame = {
    require(queries.nonEmpty, "ivfAdcTopK needs at least one query")
    require(nprobe >= 1 && nprobe <= coarse.length,
      s"nprobe $nprobe out of [1, ${coarse.length}]")
    val coarseArr = coarse.map(_.toArray).toArray
    val m = model.m
    val subDim = model.subDim
    // per query: probed cells (distance asc, cell asc) and one
    // residual distance table per probed cell
    val plans: Array[(Long, Array[Int], Array[Array[Array[Double]]])] =
      queries.map { case (qid, q) =>
        require(q.length == m * subDim,
          s"query dim ${q.length} != ${m * subDim}")
        val byD = coarseArr.indices.map { cI =>
          var acc = 0.0
          var i = 0
          while (i < q.length) {
            val d = q(i).toDouble - coarseArr(cI)(i).toDouble
            acc += d * d
            i += 1
          }
          (acc, cI)
        }.sortBy { case (dd, cI) => (dd, cI) }
        val probed = byD.take(nprobe).map(_._2).toArray
        val tables = probed.map { cI =>
          val cent = coarseArr(cI)
          val qr = new Array[Float](q.length)
          var i = 0
          while (i < q.length) { qr(i) = q(i) - cent(i); i += 1 }
          (0 until m).map { s =>
            (0 until model.k).map { j =>
              var acc = 0.0
              var i2 = 0
              while (i2 < subDim) {
                val d = qr(s * subDim + i2).toDouble -
                  model.codebooks(s)(j)(i2).toDouble
                acc += d * d
                i2 += 1
              }
              acc
            }.toArray
          }.toArray
        }
        (qid, probed, tables)
      }.toArray
    val allCells = plans.flatMap(_._2).distinct.toSeq
    // cell -> [(query index, its dtable for this cell)]
    val byCell: Map[Int, Array[(Int, Array[Array[Double]])]] =
      plans.zipWithIndex.flatMap { case ((_, probed, tables), qi) =>
        probed.zip(tables).map { case (c, t) => c -> (qi, t) }
      }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val spark = index.sparkSession
    import spark.implicits._
    val partials = index
      .filter(col("cell").isin(allCells: _*)) // partition pruning
      .select(col(idCol), col("cell"), col("codes"))
      .as[(Long, Int, Seq[Int])]
      .mapPartitions { it =>
        val heaps = plans.map(_ =>
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.Tuple2[Double, Long]))
        it.foreach { case (id, cell, cs) =>
          byCell.get(cell).foreach(_.foreach { case (qi, dt) =>
            var acc = 0.0
            var s = 0
            while (s < m) { acc += dt(s)(cs(s)); s += 1 }
            val h = heaps(qi)
            if (h.size < k) h.enqueue((acc, id))
            else {
              val worst = h.head
              if (acc < worst._1 || (acc == worst._1 && id < worst._2)) {
                h.dequeue(); h.enqueue((acc, id)); ()
              }
            }
          })
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (dd, id) => (plans(qi)._1, id, dd) }
        }
      }.toDF("q_id", "nn_id", "dist")
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist").asc, col("nn_id").asc)
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("dist"),
        col("rank").cast("int").as("rank"))
  }

  /** ADC-then-rerank: the standard PQ serving pipeline — a wide ADC
    * candidate pass over codes (`candidates` per query), then exact
    * float distances for ONLY those candidate vectors (a broadcast
    * semi join against the corpus — corpus reads Q·candidates float
    * rows instead of all of them), re-ranked to the final top-k.
    * Recovers near-exact recall at a small multiple of the code-only
    * cost.
    */
  def adcRerankTopK(codes: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, model: PQModel,
                    queries: Seq[(Long, Seq[Float])], k: Int,
                    candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates $candidates < k $k")
    val spark = codes.sparkSession
    import spark.implicits._
    val cand = adcTopK(codes, idCol, model, queries, candidates)
      .select(col("q_id"), col("nn_id"))
    val qdf = broadcast(queries.toDF("q_id", "qv"))
    val d2 = aggregate(
      zip_with(col("qv"), col(vecCol), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist").asc, col("nn_id").asc)
    corpus.join(broadcast(cand),
        corpus(idCol) === cand("nn_id"), "inner")
      .join(qdf, "q_id")
      .withColumn("dist", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nn_id"), col("dist"),
        col("rank").cast("int").as("rank"))
  }
}
