package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexical

/** Block-max (BMW) pruning: EXACT top-k — bit-identical to the full
  * traversal — on the df-flat / tf-skew regime where global-bound
  * MaxScore only managed ~2×, with the fold reduction coming from
  * mass-quantized doc blocks (term-wise block bounds + the mass
  * ceiling).
  */
class BlockMaxSpec extends SparkSpec {
  import spark.implicits._

  /** The ScaleBench plain tf-skew shape: 10 word slots from a
    * power-law vocab, ~10% of slots repeated 2–13×. dfs top out at a
    * few % of N (no stopword layer), so per-TERM global bounds barely
    * discriminate — per-doc MASS does.
    */
  private def plainSkew(n: Int, seed: Int = 11, vocab: Int = 2000) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = (0 until 10).map { _ =>
        val u = rnd.nextDouble()
        val w = s"s${math.floor(math.pow(u, 1.5) * vocab).toLong}"
        val rep = if (rnd.nextInt(100) < 10) rnd.nextInt(12) + 2 else
          rnd.nextInt(3) + 1
        Seq.fill(rep)(w)
      }
      (i.toLong, rnd.shuffle(words.flatten).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("bit-identical to the full traversal across k, truncations, " +
       "and block granularities — including the θ-free degenerate") {
    val docs = plainSkew(400)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val queries = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 3))
          .as("qtext"))
      .unionByName(Seq((9001L, "notinthecorpus"), (9002L, "   "))
        .toDF("q_id", "qtext"))
    for (blockSize <- Seq(1, 16, 1 << 30)) {
      val storeB = Lexical.blockMaxAugment(store, blockSize).persist()
      storeB.count()
      val sidecar = Lexical.blockMaxSidecar(storeB).persist()
      sidecar.count()
      val stats = Lexical.blockMaxStats(storeB).persist()
      stats.count()
      for ((m, k) <- Seq((10, 3), (10, 10), (1, 10))) {
        val trunc = Lexical.truncateByImpact(store, m)
        val full = asRows(Lexical.bm25TopKFromContribStore(store,
          queries, "qtext", "q_id", k))
        val pruned = asRows(Lexical.bm25TopKBlockMax(storeB, trunc,
          sidecar, stats, queries, "qtext", "q_id", k))
        assert(pruned == full, s"mismatch at blockSize=$blockSize m=$m k=$k")
      }
      storeB.unpersist(); sidecar.unpersist(); stats.unpersist()
    }
    store.unpersist()
    ()
  }

  test("fold volume: block bounds prune the plain tf-skew corpus " +
       "global term bounds cannot") {
    // vocab shrunk so dfs at spec scale match the bench corpus's
    // df/N shape (a few % of N) — the regime the operator targets
    val docs = plainSkew(8000, vocab = 600)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val storeB = Lexical.blockMaxAugment(store, 8).persist()
    storeB.count()
    val sidecar = Lexical.blockMaxSidecar(storeB).persist()
    sidecar.count()
    val stats = Lexical.blockMaxStats(storeB).persist()
    stats.count()
    val trunc = Lexical.truncateByImpact(store, 64).persist()
    trunc.count()
    val queries = docs.filter(col("doc_id") % 160 === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 3))
          .as("qtext"))
    val (bmPruned, full) = Lexical.blockMaxFoldStats(storeB, trunc,
      sidecar, stats, queries, "qtext", "q_id", k = 10)
    val (msPruned, _) = Lexical.maxScoreFoldStats(store, trunc,
      queries, "qtext", "q_id", k = 10)
    info(s"full=$full maxscore=$msPruned blockmax=$bmPruned " +
      f"(bm ${full.toDouble / bmPruned}%.1fx, ms ${full.toDouble / msPruned}%.1fx)")
    // the reduction GROWS with θ selectivity (candidates per query);
    // this spec geometry reads ~3.8× — ScaleBench pins ≥10× at the
    // 10⁶-doc bench geometry where θ is the 10th of 10⁴⁺ candidates
    assert(bmPruned < full / 3,
      s"expected >3x block-level reduction, got $bmPruned vs $full")
    assert(bmPruned < msPruned,
      "block bounds should beat global term bounds on this corpus")
    // and exact (belt)
    assert(asRows(Lexical.bm25TopKBlockMax(storeB, trunc, sidecar,
        stats, queries, "qtext", "q_id", 10)) ==
      asRows(Lexical.bm25TopKFromContribStore(store,
        queries, "qtext", "q_id", 10)))
    store.unpersist(); storeB.unpersist(); sidecar.unpersist()
    stats.unpersist(); trunc.unpersist()
    ()
  }
}
