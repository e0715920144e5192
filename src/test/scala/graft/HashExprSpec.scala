package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

class HashExprSpec extends SparkSpec {
  import spark.implicits._

  private def composedHashes(text: org.apache.spark.sql.Column) =
    Dedup.shingleHashes(TextFunctions.shingles3(TextFunctions.tokens(text)))

  test("shingle_hash60 equals the shingles3+md5 composition exactly") {
    graft.plans.GraftExtensions.register(spark)
    val df = (0 until 200).map(i =>
        (i.toLong, s"word$i the quick brown fox ${i % 7} jumps over token${i % 13} end"))
      .toDF("id", "text")
      .withColumn("composed", composedHashes(col("text")))
      .withColumn("native",
        Dedup.tokenShingleHashes(TextFunctions.tokens(col("text"))))
    assert(df.filter(not(col("composed") <=> col("native"))).count() == 0)
    assert(df.filter(size(col("native")) < 1).count() == 0)
  }

  test("shingle_hash60 edge cases: short docs, empty text, null tokens, null array") {
    graft.plans.GraftExtensions.register(spark)
    val edge = Seq(
      (1L, "one"),            // fewer tokens than width -> 1 shingle
      (2L, "two words"),
      (3L, "exactly three words"),
      (4L, ""),               // split("") -> [""] -> md5("")
      (5L, "   ")             // trim -> "" again
    ).toDF("id", "text")
      .withColumn("composed", composedHashes(col("text")))
      .withColumn("native",
        Dedup.tokenShingleHashes(TextFunctions.tokens(col("text"))))
    assert(edge.filter(not(col("composed") <=> col("native"))).count() == 0)

    // null elements skipped like concat_ws; null array -> null result
    val withNulls = Seq(Tuple1(Seq[String]("a", null, "c", "d")))
      .toDF("toks")
      .select(
        Dedup.shingleHashes(TextFunctions.shingles3(col("toks"))).as("composed"),
        Dedup.tokenShingleHashes(col("toks")).as("native"))
      .head
    assert(withNulls.getSeq[Long](0) == withNulls.getSeq[Long](1))
    val nullArr = spark.sql("SELECT shingle_hash60(CAST(NULL AS ARRAY<STRING>), 3, CAST(7 AS BIGINT)) AS h")
    assert(nullArr.head.isNullAt(0))
  }

  test("span_hashes equals the explode+slice+concat_ws+md5+conv chain " +
      "exactly (both keys, every width/stride/key-width combo)") {
    graft.plans.GraftExtensions.register(spark)
    val docs = ((0 until 60).map(i =>
        (i.toLong, (0 until (i % 17)).map(t => s"w${(i + t) % 11}")
          .mkString(" "))) ++
      Seq((100L, ""), (101L, "   "), (102L, "a")))
      .toDF("id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    for ((w, st, p, s) <- Seq((8, 4, 15, 15), (8, 1, 15, 15),
        (3, 2, 15, 15), (2, 1, 4, 7), (1, 1, 15, 1))) {
      val composed = docs
        .filter(size(col("toks")) >= w)
        .select(col("id"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - lit(w) + 1,
            lit(st))).as("start"))
        .select(col("id"), col("start").cast("long").as("start"),
          md5(concat_ws(" ", slice(col("toks"), col("start"), lit(w))))
            .as("mh"))
        .select(col("id"), col("start"),
          conv(substring(col("mh"), 1, p), 16, 10).cast("long").as("h1"),
          conv(substring(col("mh"), 18, s), 16, 10).cast("long").as("h2"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val native = docs
        .select(col("id"),
          explode(call_function("span_hashes", col("toks"),
            lit(w), lit(st), lit(p), lit(s))).as("sp"))
        .select(col("id"), col("sp.start"), col("sp.h1"), col("sp.h2"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(native == composed, s"(w=$w, stride=$st, p=$p, s=$s)")
      assert(composed.nonEmpty, s"(w=$w) corpus exercises no spans")
    }
  }

  test("int_minhash equals the composed array(array_min(transform)) " +
      "signature exactly") {
    graft.plans.GraftExtensions.register(spark)
    val df = (0 until 300).map(i =>
        (i.toLong, s"w${i % 5} w${(i + 1) % 7} w${(i + 2) % 11} " +
          s"w${(i * 3) % 13} tail${i % 3}"))
      .toDF("id", "text")
      .withColumn("bh",
        Dedup.tokenShingleHashes(TextFunctions.tokens(col("text"))))
    for (k <- Seq(1, 8, 64)) {
      val bad = df
        .withColumn("composed", Dedup.intMinhashSignatureComposed(col("bh"), k))
        .withColumn("native", Dedup.intMinhashSignature(col("bh"), k))
        .filter(not(col("composed") <=> col("native")))
      assert(bad.count() == 0, s"k=$k")
    }
    // null base array -> array of k nulls, exactly like the composed
    // form (array() never returns null; each array_min is null)
    val nullRows = Seq(Tuple1(null: Seq[Long])).toDF("bh")
      .select(Dedup.intMinhashSignatureComposed(col("bh"), 4).as("composed"),
        Dedup.intMinhashSignature(col("bh"), 4).as("native"))
      .filter(not(col("composed") <=> col("native")))
    assert(nullRows.count() == 0)
  }

  test("md5_long60 equals conv(substring(md5,1,15),16,10) and stays in codegen") {
    graft.plans.GraftExtensions.register(spark)
    val df = (0 until 100).map(i => (i.toLong, s"token-$i payload"))
      .toDF("id", "s").repartition(2)
      .select(col("id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"),
        call_function("md5_long60", col("s")).as("native"))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project .*md5long60.*"), plan)
  }
}
