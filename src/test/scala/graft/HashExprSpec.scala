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
