package graft

import graft.operators.Lexical

/** Sequential-dependence proximity ranking (Metzler–Croft SDM with
  * BM25 feature weighting): hand-replayed scores on a corpus chosen so
  * every feature decides something — ordered adjacency vs reversed
  * order, the unordered-window boundary (distance exactly N excluded),
  * duplicated query terms, a corpus-absent term, and the m = 1
  * degeneration to pure weighted unigrams.
  */
class SdmSpec extends SparkSpec {
  import spark.implicits._

  // d0: "a b" adjacent twice; d1: "b a" once (reversed), 'a' again at 6;
  // d2: a…b at distance exactly 8 (window-excluded); d3/d4: background.
  private val docs = Seq(
    (0L, "a b c a b"),
    (1L, "b a x y z a"),
    (2L, "a q q q q q q q b"),
    (3L, "c c"),
    (4L, "z z z")
  ).toDF("doc_id", "text")

  private val nDocs = 5.0
  private val avgdl = (5 + 6 + 9 + 2 + 3) / 5.0
  private def idf(df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
  private def sat(tf: Long, dl: Long): Double =
    (tf * 2.2) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))

  private def run(q: String, k: Int = 10): Seq[(Long, Long, Double, Int)] =
    Lexical.sdmTopK(docs, "text", "doc_id",
        Seq((1L, q)).toDF("q_id", "qtext"), "qtext", "q_id", k)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._4)

  private def score(sT: Double, sO: Double, sU: Double): Double =
    0.85 * sT + 0.1 * sO + 0.05 * sU

  test("query 'a b': ordered + windowed features hand-replayed") {
    val got = run("a b")
    assert(got.map(_._2) == Seq(0L, 1L, 2L)) // d0 > d1 > d2
    // d0: a@{1,4} b@{2,5} → tfO = 2 (1→2, 4→5), tfU = 4 pairs; df_a=df_b=3,
    // df_o = 1 (only d0), df_u = 2 (d0, d1).
    val s0 = score(idf(3) * sat(2, 5) + idf(3) * sat(2, 5),
      idf(1) * sat(2, 5), idf(2) * sat(4, 5))
    // d1: b@{1} a@{2,6} → tfO = 0 (no a-then-b), tfU = 2 ((2,1),(6,1)).
    val s1 = score(idf(3) * sat(2, 6) + idf(3) * sat(1, 6),
      0.0, idf(2) * sat(2, 6))
    // d2: a@1 b@9 — |1−9| = 8 is NOT < 8: both pair features zero.
    val s2 = score(idf(3) * sat(1, 9) + idf(3) * sat(1, 9), 0.0, 0.0)
    val want = Seq(s0, s1, s2)
    got.map(_._3).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"got $g want $w")
    }
  }

  test("order sensitivity: 'b a' rewards d1's reversed bigram") {
    val got = run("b a")
    // d1: b@1, a@2 → tfO = 1; d0: b@{2,5}, a@{1,4} → 2+1=3∉P_a, 5+1=6∉P_a
    // → tfO = 0. tfU is symmetric (same pairs as 'a b').
    val byDoc = got.map(r => r._2 -> r._3).toMap
    val s1 = score(idf(3) * sat(1, 6) + idf(3) * sat(2, 6),
      idf(1) * sat(1, 6), idf(2) * sat(2, 6))
    val s0 = score(idf(3) * sat(2, 5) + idf(3) * sat(2, 5),
      0.0, idf(2) * sat(4, 5))
    assert(math.abs(byDoc(1L) - s1) < 1e-6)
    assert(math.abs(byDoc(0L) - s0) < 1e-6)
  }

  test("duplicated query term: 'a a' counts both positions and self-pairs") {
    val got = run("a a")
    val byDoc = got.map(r => r._2 -> r._3).toMap
    // d0: a@{1,4}: unigram scored TWICE (j=1 and j=2); pair (a,a):
    // tfO = 0 (no consecutive a), tfU = |{(1,4),(4,1)}| = 2.
    // d1: a@{2,6}: tfO = 0, tfU = 2. d2: a@{1}: tfU = 0 (p1 ≠ p2 required).
    // df_u = 2 (d0, d1); df_o would be 0 — no doc carries it, so the
    // ordered feature contributes nothing anywhere.
    val s0 = score(idf(3) * sat(2, 5) + idf(3) * sat(2, 5),
      0.0, idf(2) * sat(2, 5))
    val s1 = score(idf(3) * sat(2, 6) + idf(3) * sat(2, 6),
      0.0, idf(2) * sat(2, 6))
    val s2 = score(idf(3) * sat(1, 9) + idf(3) * sat(1, 9), 0.0, 0.0)
    assert(math.abs(byDoc(0L) - s0) < 1e-6)
    assert(math.abs(byDoc(1L) - s1) < 1e-6)
    assert(math.abs(byDoc(2L) - s2) < 1e-6)
  }

  test("m = 1 degenerates to weighted unigram BM25; absent term is silent") {
    val got = run("c")
    val byDoc = got.map(r => r._2 -> r._3).toMap
    assert(got.map(_._2).toSet == Set(0L, 3L))
    assert(math.abs(byDoc(0L) - 0.85 * (idf(2) * sat(1, 5))) < 1e-6)
    assert(math.abs(byDoc(3L) - 0.85 * (idf(2) * sat(2, 2))) < 1e-6)

    // a query term absent from the corpus scores zero everywhere and
    // kills the pair features that reference it — the present term
    // still scores its unigram.
    val got2 = run("a zzzz")
    val byDoc2 = got2.map(r => r._2 -> r._3).toMap
    assert(got2.map(_._2).toSet == Set(0L, 1L, 2L))
    assert(math.abs(byDoc2(0L) - 0.85 * (idf(3) * sat(2, 5))) < 1e-6)

    assert(run("   ").isEmpty) // whitespace-only: silent
  }

  private def runRerank(q: String, n: Int, k: Int = 10) =
    Lexical.sdmTopK(docs, "text", "doc_id",
        Seq((1L, q)).toDF("q_id", "qtext"), "qtext", "q_id", k,
        rerank = Some(n))
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._4)

  test("rerank with n >= candidate count equals the full traversal") {
    assert(runRerank("a b", n = 10) == run("a b"))
    assert(runRerank("a a", n = 10) == run("a a"))
  }

  test("rerank n=2 keeps the unigram top-2 and reranks only those") {
    val got = runRerank("a b", n = 2, k = 2)
    // unigram s_t order: d0 (tf 2+2, dl 5) > d1 (2+1, dl 6) > d2 —
    // the rerank set is {d0, d1}; d2 never receives pair probes and
    // never ranks. Here d2 carries no pair feature, so the subset pair
    // dfs equal the full ones and the surviving scores are unchanged.
    assert(got.map(_._2) == Seq(0L, 1L))
    val full = run("a b").filter(r => r._2 == 0L || r._2 == 1L)
    assert(got.map(r => (r._2, r._3)) == full.map(r => (r._2, r._3)))
  }
}
