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
}
