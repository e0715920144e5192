package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Differential pin for the native ordered fold
  * ([[graft.plans.OrderedFoldSum]]): bit-identical to the
  * collect_list + sort_array + lambda-fold pipeline it replaced on the
  * lexical hot paths — including duplicate keys (value tiebreak),
  * negative/denormal-ish magnitudes where float addition order shows,
  * empty-after-null groups, and the multi-partition merge path.
  */
class OrderedFoldSumSpec extends SparkSpec {
  import spark.implicits._

  private def oldFold(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("g")
    .agg(sort_array(collect_list(struct(col("k"), col("v")))).as("cs"))
    .select(col("g"), aggregate(col("cs"), lit(0.0),
      (acc, x) => acc + x.getField("v")).as("s"))

  private def newFold(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("g")
    .agg(TopK.orderedFoldSum(col("k"), col("v")).as("s"))

  test("bit-identical to the sorted-collect fold across orders, " +
       "duplicate keys, and partition merges") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val g = i % 37
      val k = "k" + rnd.nextInt(20) // duplicate keys within groups
      val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(13) - 6)
      (g.toLong, k, v)
    }
    val df = rows.toDF("g", "k", "v").repartition(16) // force merges
    val a = oldFold(df).as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = newFold(df).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a.length == b.length)
    a.zip(b).foreach { case ((g1, s1), (g2, s2)) =>
      assert(g1 == g2)
      assert(java.lang.Double.doubleToRawLongBits(s1) ==
        java.lang.Double.doubleToRawLongBits(s2),
        s"group $g1: $s1 != $s2 (bitwise)")
    }
  }

  test("null keys/values are skipped like null structs; all-null " +
       "group sums to +0.0") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (1L, None, Some(2.5)),          // null key — skipped
      (1L, Some("b"), None),          // null value — skipped
      (2L, Option.empty[String], Option.empty[Double])
    ).toDF("g", "k", "v")
    val got = newFold(df).as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.5)
    assert(got(2L) == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(got(2L)) == 0L) // +0.0
  }

  test("binary UTF8 key order — not locale order — decides the fold") {
    // "Z" < "a" in UTF8 bytes; magnitudes chosen so order changes the
    // rounded-to-ulp sum if violated
    val df = Seq(
      (1L, "a", 1e16),
      (1L, "Z", 1.0),
      (1L, "b", -1e16)
    ).toDF("g", "k", "v")
    val a = oldFold(df).as[(Long, Double)].collect().head._2
    val b = newFold(df).as[(Long, Double)].collect().head._2
    assert(java.lang.Double.doubleToRawLongBits(a) ==
      java.lang.Double.doubleToRawLongBits(b))
  }
}
