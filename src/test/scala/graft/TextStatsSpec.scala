package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana common"),
    (2L, "banana cherry common"),
    (3L, "cherry cherry cherry common")
  ).toDF("doc_id", "text")

  test("termFrequencies counts within-doc occurrences") {
    val tf = TextStats.termFrequencies(docs, "text", "doc_id")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "apple", 2L)))
    assert(tf.contains((3L, "cherry", 3L)))
    assert(tf.contains((2L, "common", 1L)))
  }

  test("tfidf ranks rare-but-frequent terms above ubiquitous ones") {
    val top = TextStats.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .select("doc_id", "term", "rank").as[(Long, String, Int)]
      .collect().groupBy(_._1)
    // doc 1: apple tf=2 df=1 → score 6; banana tf=1 df=2 → 1.5;
    // common tf=1 df=3 → 1. Top-2 = apple, banana.
    assert(top(1L).sortBy(_._3).map(_._2).toSeq == Seq("apple", "banana"))
    // doc 3: cherry tf=3 df=2 → 4.5 beats common tf=1 df=3 → 1
    assert(top(3L).sortBy(_._3).map(_._2).toSeq == Seq("cherry", "common"))
  }

  test("tfidf score_micro is floor(tf * n/df * 1e6)") {
    val row = TextStats.tfidfTopTerms(docs, "text", "doc_id", k = 3)
      .filter(col("doc_id") === 1 && col("term") === "banana")
      .select("tf", "df", "score_micro").as[(Long, Long, Long)].head()
    assert(row == ((1L, 2L, 1500000L))) // 1 * 3/2 = 1.5
  }

  test("tfidf ties break on term ascending") {
    val tied = Seq((1L, "zeta alpha"), (2L, "zeta alpha")).toDF("doc_id", "text")
    val top = TextStats.tfidfTopTerms(tied, "text", "doc_id", k = 2)
      .filter(col("doc_id") === 1)
      .orderBy("rank").select("term").as[String].collect().toSeq
    assert(top == Seq("alpha", "zeta"))
  }

  test("packTokenBudget assigns bins by cumulative offset, straddling allowed") {
    // one shard, docs of 3/4/2 tokens, budget 5:
    // offsets 0,3,7 -> bins 0,0,1 (doc 2 straddles the 5-token boundary)
    val d = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val out = TextStats.packTokenBudget(d, "text", lit(0), col("doc_id"), budget = 5)
      .select("doc_id", "n_tokens", "tok_offset", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L, 0L, 0L), (2L, 4L, 3L, 0L), (3L, 2L, 7L, 1L)))
  }

  test("packTokenBudget packs shards independently") {
    val d = Seq((1L, "a b c d e f"), (2L, "x y"), (3L, "p q r"), (4L, "s t u v"))
      .toDF("doc_id", "text")
    val out = TextStats.packTokenBudget(d, "text", col("doc_id") % 2,
        col("doc_id"), budget = 4)
      .select("doc_id", "tok_offset", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // shard 1: docs 1 (6 toks, off 0, bin 0), 3 (off 6, bin 1)
    // shard 0: docs 2 (2 toks, off 0, bin 0), 4 (off 2, bin 0)
    assert(out == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 6L, 1L), (4L, 2L, 0L)))
  }

  test("repetitionStats separates repetitive from varied docs") {
    val d = Seq(
      (1L, "spam spam spam spam spam"),            // one token repeated
      (2L, "alpha beta gamma delta epsilon zeta")  // all distinct
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("distinct_ratio") == 0.2)
    assert(out(1L).getAs[Double]("top_token_ratio") == 1.0)
    // "spam spam spam" × 3 identical shingles → 1 - 1/3
    assert(out(1L).getAs[Double]("dup_shingle_ratio") == 0.666667)
    assert(out(2L).getAs[Double]("distinct_ratio") == 1.0)
    assert(out(2L).getAs[Double]("dup_shingle_ratio") == 0.0)
  }

  test("packTokenBudget property: offsets tile each shard exactly, bins never regress") {
    for (seed <- Seq(3, 17, 41)) {
      val rnd = new scala.util.Random(seed)
      val d = (0 until 120).map(i =>
          (i.toLong, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")))
        .toDF("doc_id", "text")
      val rows = TextStats.packTokenBudget(d, "text", col("doc_id") % 5,
          col("doc_id"), budget = 37)
        .select((col("doc_id") % 5).as("shard"), col("doc_id"),
          col("n_tokens"), col("tok_offset"), col("bin"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      rows.values.foreach { shard =>
        val ordered = shard.sortBy(_._2)
        // each doc starts exactly where the previous one ended
        ordered.foldLeft(0L) { case (expOff, (_, _, n, off, _)) =>
          assert(off == expOff, s"seed=$seed"); expOff + n
        }
        // bins are nondecreasing and consistent with the offsets
        ordered.foreach { case (_, _, _, off, bin) => assert(bin == off / 37) }
      }
    }
  }

  test("bigramLmScore: exact integer MLE bigram scoring with verdicts") {
    // corpus: "a b" x3 docs and one "a c" doc →
    //   bigrams: "a b":3, "a c":1; context "a": 4
    //   t("a b") = 3_000_000 div 4 = 750_000; t("a c") = 250_000
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramLmScore(corpus, "text", "doc_id",
        dropBelowMicro = 500000L)
      .select("doc_id", "n_bigrams", "fluency_micro", "verdict")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 750000L, "keep"), (2L, 1L, 750000L, "keep"),
      (3L, 1L, 750000L, "keep"), (4L, 1L, 250000L, "drop")))
    // high-probability (repeated) sequences outscore rare ones on a
    // larger mixed corpus, and every score is within (0, 1e6]
    val mixed = (0 until 50).map(i =>
      (i.toLong, if (i % 5 == 0) "x y x y x y" else s"w$i z${i % 7} q$i v$i"))
      .toDF("doc_id", "text")
    val rows = TextStats.bigramLmScore(mixed, "text", "doc_id", 1L)
      .select("doc_id", "fluency_micro").as[(Long, Long)].collect().toMap
    assert(rows.values.forall(v => v > 0 && v <= 1000000L))
    val fluent = (0 until 50).filter(_ % 5 == 0).map(i => rows(i.toLong)).min
    val salad = (0 until 50).filter(_ % 5 != 0).map(i => rows(i.toLong)).max
    assert(fluent > salad, s"fluent=$fluent salad=$salad")
  }

  test("bigramLmScore is partitioning-independent (the all-integer claim)") {
    val corpus = (0 until 200).map(i =>
      (i.toLong, s"t${i % 9} u${i % 4} t${i % 9} u${i % 6} w$i"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, String)] =
      TextStats.bigramLmScore(df, "text", "doc_id", dropBelowMicro = 100000L)
        .select("doc_id", "n_bigrams", "fluency_micro", "verdict")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val base = run(corpus.coalesce(1))
    assert(run(corpus.repartition(17)) == base)
    assert(run(corpus.repartition(col("doc_id"))) == base)
  }

  test("dropBoilerplate removes cross-doc repeated paragraphs, preserves order") {
    val corpus = Seq(
      (1L, "intro one¶shared footer¶body one"),
      (2L, "intro two¶shared footer¶body two"),
      (3L, "intro three¶shared footer"),
      (4L, "shared footer")) // every paragraph boilerplate → empty doc
      .toDF("doc_id", "text")
    val got = TextStats.dropBoilerplate(corpus, "text", "doc_id", "¶", minDocs = 3)
      .select("doc_id", "clean_text", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "intro one¶body one", 2L, 1L),
      (2L, "intro two¶body two", 2L, 1L),
      (3L, "intro three", 1L, 1L),
      (4L, "", 0L, 1L)))
    // below the threshold nothing is dropped and order is untouched
    val loose = TextStats.dropBoilerplate(corpus, "text", "doc_id", "¶", minDocs = 10)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(loose(1L) == "intro one¶shared footer¶body one")
  }

  test("temperatureRates boosts small sources and hits the target in expectation") {
    import graft.operators.Mixture
    val counts = Map("big" -> 90000L, "mid" -> 9000L, "small" -> 900L)
    val rates = Mixture.temperatureRates(counts, alpha = 0.5,
      targetFraction = 0.1)
    // expected kept mass = target fraction of the corpus (holds while
    // no per-source rate is capped at 1)
    val expected = counts.map { case (s0, n) => rates(s0) * n }.sum
    assert(math.abs(expected - 0.1 * counts.values.sum) < 1.0)
    // alpha < 1 boosts the small source's keep RATE above the big one's
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"))
    // alpha = 1 keeps every source at the same flat rate
    val flat = Mixture.temperatureRates(counts, alpha = 1.0,
      targetFraction = 0.25)
    assert(flat.values.toSeq.distinct.size == 1)
    assert(math.abs(flat("big") - 0.25) < 1e-9)
    // rates are capped at 1
    val capped = Mixture.temperatureRates(counts, alpha = 0.0,
      targetFraction = 0.9)
    assert(capped.values.forall(_ <= 1.0))
    intercept[IllegalArgumentException](
      Mixture.temperatureRates(Map.empty, 0.5, 0.3))
  }

  test("redactPii scrubs emails and phones, leaves clean text alone") {
    import graft.functions.TextFunctions
    val d = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.org or +44-123-456-7890 now"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("clean"),
        TextFunctions.patternCount(col("text"), TextFunctions.EmailPattern).as("ne"),
        TextFunctions.patternCount(col("text"), TextFunctions.PhonePattern).as("np"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("clean") == "reach me at <EMAIL> or <PHONE> now")
    assert(out(1L).getAs[Long]("ne") == 1 && out(1L).getAs[Long]("np") == 1)
    assert(out(2L).getAs[String]("clean") == "no pii here at all")
    assert(out(2L).getAs[Long]("ne") == 0)
  }

  test("contaminatedDocs counts distinct shared shingle hashes") {
    graft.plans.GraftExtensions.register(spark)
    val train = Seq(
      (1L, "the quick brown fox jumps"),      // shares "the quick brown",
                                              // "quick brown fox", "brown fox jumps"
      (2L, "completely different text here"), // clean
      (3L, "one brown fox jumps high")        // shares "brown fox jumps"
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val out = graft.operators.Contamination
      .contaminatedDocs(train, eval, "text", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L), (3L, 1L)))
  }

  test("fuzzyContaminatedDocs flags verbatim and near copies of eval docs, not unrelated text") {
    val evalText = ("the quick brown fox jumps over the lazy dog while " +
      "seventeen astronomers chart distant quasars beyond the nebula tonight")
    val nearCopy = evalText.split(" ").updated(9, "as").mkString(" ")
    val train = Seq(
      (1L, evalText),                                    // verbatim leak
      (2L, nearCopy),                                    // one token edited
      (3L, "completely unrelated prose about cooking rice and lentils slowly")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    val df = graft.operators.Contamination
      .fuzzyContaminatedDocs(train, eval, "text", "doc_id")
    val out = df.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // verbatim copy: identical signature → collides in every band, sim 1
    assert(out.head == ((1L, 1L, 1.0)))
    // the unrelated doc never surfaces
    assert(!out.exists(_._1 == 3L))
    // the near copy keeps most shingles, so most minhash components
    // agree; it must score strictly below the verbatim copy
    out.find(_._1 == 2L).foreach { case (_, hits, sim) =>
      assert(hits == 1L && sim > 0.5 && sim < 1.0)
    }
    // plan shape: eval side broadcasts, the train side never shuffles —
    // ONE exchange total (round 17: the per-pair distinct + per-doc
    // rollup fused into a single map-side-combined aggregate, so the
    // old second exchange is gone), and nothing degrades to a
    // nested-loop join
    val c = graft.tools.PlanIntrospect.counts(df)
    assert(c.broadcasts == 1 && c.shuffles == 1 && c.bnlj == 0 && c.cartesian == 0)
  }

  test("chunkTokens tiles with the configured overlap and covers every token") {
    val docs = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")),
                   (2L, "single"),
                   (3L, "a b c")).toDF("doc_id", "text")
    val out = graft.operators.TextStats
      .chunkTokens(docs, "doc_id", "text", chunkLen = 10, stride = 7)
      .as[(Long, Long, String, Long)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts every 7 tokens; all but the tail chunks hold 10 tokens
    assert(d1.map(_._2).toSeq == (0L until 100L by 7L).toSeq)
    assert(d1.init.init.forall(_._4 == 10L))
    // consecutive chunks overlap by 3 tokens
    val first = d1(0)._3.split(" ").toSeq
    val second = d1(1)._3.split(" ").toSeq
    assert(first.drop(7) == second.take(3))
    // every token of the doc appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert((1 to 100).forall(i => covered(s"w$i")))
    // degenerate docs: one chunk each
    assert(out.count(_._1 == 2L) == 1 && out.count(_._1 == 3L) == 1)
  }

  test("capPerGroup keeps exactly k per group, independent of partitioning") {
    import org.apache.spark.sql.functions.{col, md5}
    val df = (0 until 200).map(i => (i.toLong, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val order = Seq(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    val a = graft.operators.Mixture.capPerGroup(df, Seq(col("source")), 10, order)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = graft.operators.Mixture
      .capPerGroup(df.repartition(13), Seq(col("source")), 10, order)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 30)
  }
}
