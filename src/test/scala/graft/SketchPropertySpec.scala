package graft

import scala.util.Random
import graft.operators.Sketches

/** Differential tests for the sketch aggregates: random multisets,
  * random partition splits, and random (even nested) merge trees
  * checked against brute-force references — the merge-tree-invariance
  * claim the oracle queries rely on, exercised far beyond the fixed
  * shapes Spark's planner happens to produce. Seeded → deterministic.
  */
class SketchPropertySpec extends SparkSpec {

  private def kmvRef(values: Seq[Long], k: Int): Seq[Long] =
    values.distinct.sorted.take(k)

  /** Apply a random merge tree: split the input into `parts` chunks,
    * reduce each, then merge in a random binary order.
    */
  private def kmvViaTree(agg: Sketches.KmvAgg, values: Seq[Long],
                         parts: Int, rnd: Random): Seq[Long] = {
    val chunks = values.grouped(math.max(1, values.size / parts)).toBuffer
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size)
      val a = bufs.remove(i)
      val j = rnd.nextInt(bufs.size)
      val b = bufs.remove(j)
      bufs.insert(rnd.nextInt(bufs.size + 1), agg.merge(a, b))
    }
    agg.finish(bufs.head).toSeq
  }

  test("KmvAgg == brute-force k-min under random data and random merge trees") {
    val rnd = new Random(4242)
    for (trial <- 0 until 40) {
      val k = 2 + rnd.nextInt(63)
      val n = rnd.nextInt(3000)
      // heavy duplication on purpose: dedup is half the contract
      val values = Seq.fill(n)(rnd.nextInt(500).toLong * 7919L)
      val agg = new Sketches.KmvAgg(k)
      val expected = kmvRef(values, k)
      val parts = 1 + rnd.nextInt(8)
      assert(kmvViaTree(agg, values, parts, rnd) == expected,
        s"trial $trial k=$k n=$n parts=$parts")
    }
  }

  private def priRef(items: Seq[(Long, Long, Long)], k: Int)
      : Seq[(Double, Long, Long)] = {
    val rows = items.map { case (h, w, id) =>
      val u = if (h <= 0) 1.0 else h.toDouble / Sketches.HashSpace.toDouble
      (w.toDouble / u, w, id)
    }
    rows.sortBy(r => (-r._1, r._3)).take(k + 1)
  }

  test("PriorityAgg == brute-force top-(k+1) under random data and merge trees") {
    val rnd = new Random(1717)
    for (trial <- 0 until 40) {
      val k = 1 + rnd.nextInt(32)
      val n = rnd.nextInt(1500)
      // ids unique (the aggregate's contract); hashes collide sometimes
      // so the (priority DESC, id ASC) tie-break actually fires
      val items = (0 until n).map { i =>
        (rnd.nextInt(50).toLong * (Sketches.HashSpace / 50),
          1L + rnd.nextInt(100), i.toLong)
      }
      val agg = new Sketches.PriorityAgg(k)
      val chunks = items.grouped(math.max(1, n / (1 + rnd.nextInt(6)))).toBuffer
      val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      var acc = agg.zero
      rnd.shuffle(bufs.toSeq).foreach(b => acc = agg.merge(acc, b))
      assert(agg.finish(acc) == priRef(items, k), s"trial $trial k=$k n=$n")
    }
  }

  private def freqViaTree(agg: Sketches.FreqAgg, items: Seq[String],
                          parts: Int, rnd: Random)
      : (Seq[(String, Long)], Long) = {
    val chunks = items.grouped(math.max(1, items.size / parts)).toBuffer
    val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size)
      val a = bufs.remove(i)
      val j = rnd.nextInt(bufs.size)
      val b = bufs.remove(j)
      bufs.insert(rnd.nextInt(bufs.size + 1), agg.merge(a, b))
    }
    agg.finish(if (bufs.isEmpty) agg.zero else bufs.head)
  }

  test("FreqAgg exact regime: distinct <= k is bit-exact under any merge tree") {
    val rnd = new Random(9090)
    for (trial <- 0 until 40) {
      val k = 1 + rnd.nextInt(32)
      val vocab = (0 until 1 + rnd.nextInt(k)).map(i => s"w$i")
      val n = rnd.nextInt(2000)
      val items = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val agg = new Sketches.FreqAgg(k)
      val expected = items.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val (got, gotN) = freqViaTree(agg, items, 1 + rnd.nextInt(8), rnd)
      assert(gotN == n && got == expected, s"trial $trial k=$k n=$n")
    }
  }

  test("FreqAgg over capacity: MG guarantees hold under random merge trees") {
    val rnd = new Random(3131)
    for (trial <- 0 until 60) {
      val k = 1 + rnd.nextInt(12)
      val nv = k + 1 + rnd.nextInt(60)
      // skewed multiset so real heavy hitters exist
      val vocab = (0 until nv).map(i => s"t$i")
      val n = 50 + rnd.nextInt(3000)
      val items = Seq.fill(n) {
        val r = rnd.nextDouble()
        // ~zipf-ish: a few hot items, a long uniform tail
        if (r < 0.5) vocab(rnd.nextInt(math.min(3, nv)))
        else vocab(rnd.nextInt(nv))
      }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = new Sketches.FreqAgg(k)
      val (got, gotN) = freqViaTree(agg, items, 1 + rnd.nextInt(8), rnd)
      assert(gotN == n, s"trial $trial: n bookkeeping")
      assert(got.size <= k, s"trial $trial: size ${got.size} > k=$k")
      assert(got.map(_._1) == got.map(_._1).sorted,
        s"trial $trial: canonical item order violated")
      val shat = got.map(_._2).sum
      got.foreach { case (item, est) =>
        val t = truth(item)
        assert(est >= 1 && est <= t, s"trial $trial: overcount $item")
        assert((t - est) * (k + 1) <= n - shat,
          s"trial $trial: undercount bound $item est=$est true=$t")
      }
      // heavy-hitter recall: true count > n/(k+1) must appear
      val inSketch = got.map(_._1).toSet
      truth.foreach { case (item, t) =>
        if (t * (k + 1) > n)
          assert(inSketch(item), s"trial $trial: heavy $item ($t of $n) missing")
      }
    }
  }

  test("priority subset-sum reference: estimate formula matches a direct replay") {
    // the column expression is pinned vs DuckDB in q127/q128; here the
    // SAME arithmetic is checked against a scala replay on the agg's
    // own output, closing the loop kernel-side
    val rnd = new Random(77)
    val k = 16
    val items = (0 until 400).map(i =>
      ((rnd.nextLong() >>> 4), 1L + rnd.nextInt(50), i.toLong))
    val agg = new Sketches.PriorityAgg(k)
    val sample = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    val tau = if (sample.size >= k + 1) sample(k)._1 else 0.0
    val topK = sample.take(k)
    def est(member: Long => Boolean): Double =
      topK.filter(r => member(r._3)).foldLeft(0.0)((a, r) =>
        a + math.max(r._2.toDouble, tau))
    val exactEven = items.filter(_._3 % 2 == 0).map(_._2).sum.toDouble
    val e = est(_ % 2 == 0)
    assert(math.abs(e - exactEven) / exactEven <= 0.6)
    // total estimate is within the published k error regime
    val exactTot = items.map(_._2).sum.toDouble
    assert(math.abs(est(_ => true) - exactTot) / exactTot <= 0.45)
  }
}
