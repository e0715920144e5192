package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK
import graft.operators.TopK.Cand

/** The bounded top-k aggregate must be output-identical to the
  * collect_list → array_sort → slice form it replaces (including NaN
  * ordering and duplicate keys), and its buffer must be bounded at k
  * through EVERY reduce and merge — the property that caps streaming
  * state and shuffled partials.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def ref(xs: Seq[Cand], k: Int): Seq[Cand] =
    xs.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a.d, b.d)
      if (c != 0) c < 0 else a.id < b.id
    }.take(k)

  /** NaN-proof structural key (Scala's Double == makes NaN != NaN, so
    * case-class equality cannot compare buffers that legally hold NaN).
    */
  private def keys(s: Seq[Cand]): Seq[(Long, Long)] =
    s.map(c => (java.lang.Double.doubleToLongBits(c.d), c.id))

  test("aggregate == collect_list/array_sort/slice on a DataFrame, NaN sorts last") {
    val rows = (0 until 500).map { i =>
      val d =
        if (i % 97 == 0) Double.NaN
        else ((i * 7919) % 1000) / 8.0 // duplicates by construction
      (i % 7L, d, i.toLong) // 7 groups
    }
    val df = rows.toDF("g", "d", "id")
    val k = 5
    val viaAgg = df.groupBy("g").agg(TopK.topK(k)(col("d"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.d"), col("t.id"))
      .collect().map(_.toSeq).toSet
    val viaSort = df.groupBy("g")
      .agg(slice(array_sort(collect_list(struct(col("d"), col("id")))),
        1, k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.d"), col("t.id"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaSort, "bounded aggregate must match the sort form")
    // and both match a local reference per group
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val expect = ref(grp.map(r => Cand(r._2, r._3)), k)
      val got = viaAgg.toSeq.filter(_.head == g)
        .sortBy(_(1).asInstanceOf[Int])
        .map(r => Cand(r(2).asInstanceOf[Double], r(3).asInstanceOf[Long]))
      assert(got == expect, s"group $g: $got vs $expect")
    }
  }

  test("buffer is bounded at k through every reduce and merge; merge order-insensitive") {
    val k = 4
    val agg = new TopK.TopKAgg(k)
    val rnd = new scala.util.Random(42)
    val xs = (0 until 300).map(i =>
      Cand(if (i % 53 == 0) Double.NaN else rnd.nextInt(40) / 3.0, i.toLong))
    // reduce in arrival order, assert the bound at every step
    var buf = agg.zero
    xs.foreach { c =>
      buf = agg.reduce(buf, c)
      assert(buf.length <= k, s"reduce let the buffer grow past k: ${buf.length}")
      assert(keys(buf) == keys(ref(buf, k)), "buffer must stay sorted")
    }
    assert(keys(buf) == keys(ref(xs, k)))
    // arbitrary partitioning + merges reach the same value, bound held
    val parts = xs.grouped(37).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    parts.foreach(p => assert(p.length <= k))
    val merged = parts.foldLeft(agg.zero)(agg.merge)
    assert(merged.length <= k)
    assert(keys(merged) == keys(ref(xs, k)),
      "merged partials must equal the global top-k")
    val mergedRev = parts.reverse.foldLeft(agg.zero)(agg.merge)
    assert(keys(mergedRev) == keys(merged), "merge must be order-insensitive")
    // fewer rows than k: everything retained, sorted
    val small = xs.take(2).foldLeft(agg.zero)(agg.reduce)
    assert(keys(agg.finish(small)) == keys(ref(xs.take(2), k)))
  }
}
