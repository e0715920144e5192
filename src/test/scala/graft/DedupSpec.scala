package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different words entirely here now ok")
  ).toDF("doc_id", "text")

  test("exactGroups: dup pair collapses, whitespace/case-insensitive") {
    val g = Dedup.exactGroups(
      docs.withColumn("text", when(col("doc_id") === 2, upper(col("text")))
        .otherwise(col("text"))), "text", "doc_id")
    val dup = g.filter(col("n_docs") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keeper") == 1L)
    assert(g.count() == 3)
  }

  test("minhash LSH: exact+near dups collide, distinct docs don't") {
    val sigs = docs
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("sh", graft.functions.TextFunctions.shingles3(col("toks")))
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 8).as("sig"))
    val pairs = Dedup.candidatePairs(
      Dedup.lshBuckets(sigs, "sig", "doc_id", 4, 2), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs at hamming 0, near dups close, found by pairs") {
    val sigs = Dedup.simhash(docs, "text", "doc_id")
    val pairs = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 16)
      .as[(Long, Long, Int)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 == 0)
    val near = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(near.isDefined && near.get._3 <= 16)
  }

  test("jaccard pairs: thresholds separate near dups from unrelated") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.jaccardPairs(blocked, "text", "doc_id", Seq("blk"), 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("connectedComponents: chain, clique, singleton-free labeling") {
    // chain 1-2-3, separate pair 10-11, triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val comps = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L).forall(comps(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
    assert(comps.size == 8) // only nodes that appear in edges
  }

  test("connectedComponents: long path converges past one round") {
    // path 1-2-3-...-9: diameter 8, forces multiple propagation rounds
    val edges = (1L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Dedup.connectedComponentsLabelProp(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 9L).forall(comps(_) == 1L))
  }

  test("connectedComponents front door defaults to star contraction") {
    // diameter-31 path: label propagation needs ~31 rounds to push the
    // min label down the chain; star contraction lands it in O(log²).
    // A small round count from the FRONT DOOR proves the default is
    // the star algorithm — a caller picking the plain name by accident
    // gets the scale path.
    val path = (1L until 32L).map(i => (i, i + 1)).toDF("a", "b")
    Dedup.lastCcRounds = 0
    val comps = Dedup.connectedComponents(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 32L).forall(comps(_) == 1L))
    assert(Dedup.lastCcRounds <= 12,
      s"front door took ${Dedup.lastCcRounds} rounds — label-prop would need ~31")
    // the explicit opt-in really is label propagation: diameter-bound
    Dedup.lastCcRounds = 0
    Dedup.connectedComponentsLabelProp(path, "a", "b").count()
    assert(Dedup.lastCcRounds >= 13,
      s"label-prop took only ${Dedup.lastCcRounds} rounds on a diameter-31 path")
  }

  test("connectedComponents: differential vs in-memory union-find on random graphs") {
    for (seed <- Seq(11, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: classic union-find, components named by min member
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.connectedComponentsLabelProp(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed=$seed")
      // the star-contraction variant must agree exactly
      val gotStar = Dedup.connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(gotStar == expected, s"star seed=$seed")
    }
  }

  test("connectedComponentsStar: chain, clique, self-loop, long path") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 30L)).toDF("a", "b")
    val comps = Dedup.connectedComponentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L).forall(comps(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
    assert(comps(30L) == 30L) // self-loop-only node labels itself
    assert(comps.size == 9)

    // diameter-31 path: label propagation would need ~31 rounds; the
    // star alternation must still land exact min labels well under the
    // default iteration cap (O(log² n) contraction)
    val path = (1L until 32L).map(i => (i, i + 1)).toDF("a", "b")
    val pathComps = Dedup.connectedComponentsStar(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 32L).forall(pathComps(_) == 1L))
  }

  test("connectedComponentsStar: 1M-node path graph (adversarial diameter)") {
    // diameter 10^6: label propagation would need 10^6 rounds; star
    // contraction must finish in O(log n) alternations under the
    // default cap, with per-round lineage truncation keeping the
    // driver alive
    val n = 1000000L
    val path = spark.range(1L, n)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val comps = Dedup.connectedComponentsStar(path, "a", "b")
    val r = comps.agg(
      count(lit(1)), countDistinct(col("component")), min("component")).head()
    assert(r.getLong(0) == n && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(Dedup.lastCcRounds <= 25, s"took ${Dedup.lastCcRounds} rounds")
  }

  test("connectedComponentsStar: star graph with a 100k-degree hub (skew)") {
    // hub has the LARGEST id, so every canonical edge has src = hub:
    // the neighborhood-min must partial-aggregate, not funnel the whole
    // adjacency into one window task (the paper's high-degree concern)
    val hub = 100000L
    val star = spark.range(0L, hub).select(lit(hub).as("a"), col("id").as("b"))
    val comps = Dedup.connectedComponentsStar(star, "a", "b")
    val r = comps.agg(
      count(lit(1)), countDistinct(col("component")), min("component")).head()
    assert(r.getLong(0) == hub + 1 && r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(Dedup.lastCcRounds <= 5, s"took ${Dedup.lastCcRounds} rounds")
  }

  test("duplicateSpans finds verbatim cross-doc runs at different offsets") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared alpha beta gamma delta one two three"),
      (2L, s"x1 x2 x3 $shared y1 y2"), // same run, different offset
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9"), // unique spans only
      (4L, "a b c")) // shorter than the window: no spans at all
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "text", "doc_id",
        width = 8, stride = 1, minDocs = 2L)
      .select("n_docs", "n_occurrences").as[(Long, Long)].collect().toSeq
    // exactly ONE span crosses docs: the planted 8-token run (its
    // neighbors differ, so every other window is unique); whole-doc
    // Jaccard of docs 1 and 2 is ~0.4 — MinHash would not pair them
    assert(out == Seq((2L, 2L)))
  }

  test("removeDuplicateSpans cuts non-canonical occurrences, merges overlaps, keeps order") {
    val run = (1 to 20).map(i => s"r$i").mkString(" ") // 13 overlapping 8-windows
    val docs = Seq(
      (1L, s"head1 head2 $run tail1 tail2"), // canonical (min doc): untouched
      (2L, s"a1 a2 a3 $run z1 z2 z3"), // whole run cut as ONE merged range
      // internal repetition: second occurrence of the same 8-token run cut
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 mid p1 p2 p3 p4 p5 p6 p7 p8 end"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")) // unique: untouched
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", width = 8)
      .select("doc_id", "clean_text", "n_kept", "n_cut")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == s"head1 head2 $run tail1 tail2" && out(1L)._4 == 0L)
    assert(out(2L)._2 == "a1 a2 a3 z1 z2 z3", out(2L)._2)
    assert(out(2L)._4 == 20L)
    assert(out(3L)._2 == "p1 p2 p3 p4 p5 p6 p7 p8 mid end", out(3L)._2)
    assert(out(4L)._4 == 0L)
  }

  test("removeDuplicateSpans survives primary span-hash collisions (120-bit key)") {
    // 30 all-unique docs, each with 9 tokens = 2 stride-1 8-windows →
    // 60 distinct spans. With the primary key shrunk to 1 hex char
    // (16 values) the pigeonhole forces dozens of primary collisions
    // among DISTINCT spans; the secondary 60-bit key must keep them
    // apart, so nothing may be cut.
    val unique = (1 to 30)
      .map(i => (i.toLong, (1 to 9).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val hardened = Dedup.removeDuplicateSpansImpl(unique, "text", "doc_id",
      width = 8, minOccurrences = 2L, primaryHexChars = 1, secondaryHexChars = 15)
    assert(hardened.agg(sum("n_cut")).as[Long].head() == 0L)
    // the seam is live: with BOTH keys shrunk the same collisions DO
    // produce false cuts — proving the test exercised real collisions
    // and the secondary key is what prevented them
    val weakened = Dedup.removeDuplicateSpansImpl(unique, "text", "doc_id",
      width = 8, minOccurrences = 2L, primaryHexChars = 1, secondaryHexChars = 1)
    assert(weakened.agg(sum("n_cut")).as[Long].head() > 0L)
    // and true duplicates still cut through the hardened path
    val realDup = Seq(
      (1L, "d1 d2 d3 d4 d5 d6 d7 d8"),
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8")).toDF("doc_id", "text")
    val cut = Dedup.removeDuplicateSpans(realDup, "text", "doc_id", width = 8)
      .filter(col("doc_id") === 2L).select("n_cut").as[Long].head()
    assert(cut == 8L)
  }

  test("newAgainstKnown admits only unseen fingerprints") {
    val known = Seq("hello world", "old doc").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val batch = Seq(
      (1L, "hello   world"),   // ws-variant of a known doc
      (2L, "brand new doc"),
      (3L, "old doc")
    ).toDF("doc_id", "text")
    val fresh = Dedup.newAgainstKnown(batch, "text", known)
      .select("doc_id").as[Long].collect().toSet
    assert(fresh == Set(2L))
    // schema round trip: no helper column leaks
    assert(Dedup.newAgainstKnown(batch, "text", known).columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("mixture sampling is deterministic, source-targeted, and growth-stable") {
    import graft.operators.Mixture
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "web" else "code", s"doc $i")).toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Mixture.sampleByWeights(d, "doc_id", "source", Map("web" -> 0.25))
        .select("doc_id").as[Long].collect().toSet
    val kept = run(docs)
    // code passes untouched; web downsampled near the target rate
    assert(kept.count(_ % 2 == 1) == 200)
    val webKept = kept.count(_ % 2 == 0)
    assert(webKept > 25 && webKept < 75, s"webKept=$webKept")
    // growth stability: the same docs keep their fate in a larger corpus
    val grown = (0L until 800L).map(i =>
      (i, if (i % 2 == 0) "web" else "code", s"doc $i")).toDF("doc_id", "source", "text")
    assert(run(grown).filter(_ < 400L) == kept)
  }

  test("embedding near-dup finds planted copy via sign buckets") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.2f, 0.1f, 0.9f)),
      (2L, Array(0.5f, -0.2f, 0.1f, 0.9f)),
      (3L, Array(-0.5f, 0.2f, -0.1f, -0.9f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      bits = 4, minCosine = 0.99).as[(Long, Long, Double)].collect()
    assert(pairs.length == 1 && pairs(0)._1 == 1L && pairs(0)._2 == 2L)
  }
}
