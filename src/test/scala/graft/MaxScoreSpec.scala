package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexical

/** MaxScore dynamic pruning: EXACT top-k (bit-identical to the full
  * traversal — rows, scores, ranks) at a measured fraction of the fold
  * input, across truncation choices, skew regimes, and the BM25F store;
  * every join in the pruned pipeline is broadcast (the common-term
  * postings never shuffle).
  */
class MaxScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed corpus: "the" in ~90% of docs (huge df, tiny idf → tiny
    * ub), a mid tier, and rare high-idf terms — the geometry MaxScore
    * exists for.
    */
  private def skewed(n: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    val mids = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (0 until n).map { i =>
      val sb = Vector.newBuilder[String]
      if (rnd.nextDouble() < 0.9) sb += "the"
      sb += mids(rnd.nextInt(mids.size))
      if (rnd.nextDouble() < 0.3) sb += mids(rnd.nextInt(mids.size))
      if (rnd.nextDouble() < 0.04) sb += s"rare${rnd.nextInt(8)}"
      (i.toLong, rnd.shuffle(sb.result()).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private val queries = Seq(
    (1L, "the alpha rare3"),   // common + mid + rare
    (2L, "the beta"),          // common + mid
    (3L, "rare1 rare5"),       // rare only
    (4L, "the"),               // the degenerate all-common query
    (5L, "gamma delta eps"),   // mids
    (6L, "notinthecorpus"),    // no store terms → no rows
    (7L, "   ")                // whitespace → no terms
  ).toDF("q_id", "qtext")

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("bit-identical to the full traversal across k and truncations " +
       "(fixed-m, mass, and a uselessly tiny m)") {
    val docs = skewed(400)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    for (k <- Seq(3, 10);
         trunc <- Seq(Lexical.truncateByImpact(store, k),
           Lexical.truncateByImpact(store, 2 * k),
           Lexical.truncateByMass(store, 0.5),
           // m = 1: θ is weak, pruning near zero — exactness must hold
           Lexical.truncateByImpact(store, 1))) {
      val full = asRows(Lexical.bm25TopKFromContribStore(store,
        queries, "qtext", "q_id", k))
      val pruned = asRows(Lexical.bm25TopKMaxScore(store, trunc,
        queries, "qtext", "q_id", k))
      assert(pruned == full, s"mismatch at k=$k")
    }
    store.unpersist()
    ()
  }

  test("fold volume: the pruned input is a fraction of the full " +
       "traversal's on the skewed corpus") {
    val docs = skewed(2000)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val trunc = Lexical.truncateByImpact(store, 10).persist()
    trunc.count()
    val (pruned, full) = Lexical.maxScoreFoldStats(store, trunc,
      queries.filter(col("q_id") <= 3), "qtext", "q_id", k = 10)
    // q1/q2 carry "the" (~1800 postings each) — non-essential under a
    // rare/mid-term θ, so its postings only enter via candidate matches
    assert(pruned < full / 2,
      s"expected >2x fold reduction, got $pruned vs $full")
    // and the pruned input still yields the exact answer (belt)
    val k = 10
    assert(asRows(Lexical.bm25TopKMaxScore(store, trunc,
        queries.filter(col("q_id") <= 3), "qtext", "q_id", k)) ==
      asRows(Lexical.bm25TopKFromContribStore(store,
        queries.filter(col("q_id") <= 3), "qtext", "q_id", k)))
    store.unpersist(); trunc.unpersist()
    ()
  }

  test("BM25F: the multi-field contrib store serves through MaxScore " +
       "unchanged and exactly") {
    val fields = Seq(Lexical.FieldSpec("title", 2.0),
      Lexical.FieldSpec("body", 1.0))
    val docs = skewed(300)
    val fdocs = docs.select(col("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 1))
        .as("title"),
      col("text").as("body"))
    val store = Lexical.bm25fStore(fdocs, fields, "doc_id").persist()
    store.count()
    val trunc = Lexical.truncateByImpact(store, 10)
    val full = asRows(Lexical.bm25TopKFromContribStore(store,
      queries, "qtext", "q_id", k = 5))
    val pruned = asRows(Lexical.bm25TopKMaxScore(store, trunc,
      queries, "qtext", "q_id", k = 5))
    assert(pruned == full)
    store.unpersist()
    ()
  }

  test("degenerate regimes: the no-θ batch drops the candidate leg " +
       "entirely; an over-threshold Σ-essential-df estimate joins the " +
       "candidates as sort-merge, never broadcast — results exact both " +
       "ways") {
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val docs = skewed(400)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val dfreq = store.groupBy("term").agg(count(lit(1)).as("df"))
    // m = 1 and k = 10: no query reaches k truncated results ⇒ no θ
    // anywhere ⇒ every term essential ⇒ the non-essential leg (and its
    // candidate broadcast) must not exist in the plan at all
    val trunc1 = Lexical.truncateByImpact(store, 1).persist()
    trunc1.count()
    val noTheta = Lexical.maxScoreFoldInput(store, trunc1,
      queries, "qtext", "q_id", k = 10)
    noTheta.count()
    val nodes1 = graft.tools.PlanIntrospect.nodes(
      noTheta.queryExecution.executedPlan)
    assert(!nodes1.exists(_.isInstanceOf[UnionExec]),
      "no-θ regime still built the candidate union leg")
    // over-threshold: Σ_essential df > 0-row budget ⇒ the candidate
    // join must be sort-merge with no broadcast exchange feeding it
    val trunc10 = Lexical.truncateByImpact(store, 10).persist()
    trunc10.count()
    val sheared = Lexical.maxScoreFoldInput(store, trunc10,
      queries, "qtext", "q_id", k = 3,
      dfreq = Some(dfreq), candBroadcastMaxRows = 0L)
    sheared.count()
    val nodes2 = graft.tools.PlanIntrospect.nodes(
      sheared.queryExecution.executedPlan)
    // the candidate join — keyed (q_id, doc_id) — must be sort-merge;
    // no (q_id, doc_id)-keyed broadcast join may exist anywhere
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def candKeyed(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      keys.exists(_.toString.contains("q_id")) &&
        keys.exists(_.toString.contains("doc_id"))
    val smj = nodes2.collect {
      case j: SortMergeJoinExec if candKeyed(j.leftKeys) => j
    }
    assert(smj.nonEmpty, "over-threshold candidate join was not sort-merge")
    assert(!nodes2.exists {
        case j: BroadcastHashJoinExec => candKeyed(j.leftKeys)
        case _ => false
      }, "the sheared candidate set still broadcasts")
    // and both degenerate paths stay exact
    for ((trunc, k) <- Seq((trunc1, 10), (trunc10, 3))) {
      val got = asRows(Lexical.bm25TopKMaxScore(store, trunc,
        queries, "qtext", "q_id", k,
        dfreq = Some(dfreq), candBroadcastMaxRows = 0L))
      val full = asRows(Lexical.bm25TopKFromContribStore(store,
        queries, "qtext", "q_id", k))
      assert(got == full, s"mismatch at k=$k")
    }
    store.unpersist(); trunc1.unpersist(); trunc10.unpersist()
    ()
  }

  test("plan: every join in the pruned fold input is broadcast — the " +
       "non-essential (common-term) postings never shuffle") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val docs = skewed(400)
    val store = Lexical.bm25Store(docs, "text", "doc_id").persist()
    store.count()
    val trunc = Lexical.truncateByImpact(store, 10).persist()
    trunc.count()
    val foldIn = Lexical.maxScoreFoldInput(store, trunc,
      queries, "qtext", "q_id", k = 5)
    foldIn.count() // let AQE finalize
    val nodes = graft.tools.PlanIntrospect.nodes(
      foldIn.queryExecution.executedPlan)
    val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    val smj = nodes.count(n => n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec])
    assert(smj == 0, s"found $smj shuffled joins in the pruned pipeline")
    // round 17: the essential-postings slice is persisted (it feeds
    // both the candidate set and the fold union), so its broadcast
    // join runs once inside the CACHE build and the live plan keeps
    // the non-essential and candidate joins — 2 broadcasts, and the
    // smj == 0 assertion above pins that nothing else joins by shuffle
    assert(bhj >= 2, s"expected >= 2 broadcast joins, got $bhj")
    store.unpersist(); trunc.unpersist()
    ()
  }
}
