package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for the exact BM25 traversal at 10⁶ docs — built the
  * round the single-field control in the BM25F row read 350 s against
  * the round-14 record of 75–90 s, to attribute the regression among
  * the round-15 changes: the bm25TopK postings persist (cache
  * round-trip vs re-tokenizing) and the ObjectHashAggregate
  * sort-fallback threshold (the per-(query, doc) collect_list fold has
  * ~hundreds of millions of groups — the worst case for a bigger hash
  * map that must then fall back anyway).
  *
  *   sbt "runMain graft.tools.Bm25Debug [docs] [queries] [threshold]"
  *
  * Prints walls for (a) bm25TopKFromStore over persisted postings (the
  * round-14 measurement shape), (b) bm25TopK (the persist convenience
  * form), each under the given fallback threshold.
  */
object Bm25Debug {
  def main(args: Array[String]): Unit = {
    val nd = if (args.length > 0) args(0).toLong else 1000000L
    val nq = if (args.length > 1) args(1).toLong else 1000L
    val thr = if (args.length > 2) args(2).toInt else -1
    val spark = graft.core.GraftSession.local()
    if (thr > 0)
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        thr.toString)
    import graft.operators.Lexical
    val root = java.nio.file.Files
      .createTempDirectory("bm25-debug").toString
    ScaleBench.synthDocs(spark, nd).write.mode("overwrite")
      .parquet(s"$root/docs")
    val d = spark.read.parquet(s"$root/docs")
    val every = math.max(1L, nd / nq)
    val qs = d.filter(col("doc_id") % every === 0)
      .select(col("doc_id").as("q_id"),
        concat_ws(" ", slice(
          graft.functions.TextFunctions.tokens(col("text")), 1, 3))
          .as("qtext")).persist()
    qs.count()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $tag: rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(threshold=${spark.conf.get(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")})")
    }
    val post = Lexical.postings(d, "text", "doc_id").persist()
    val dfreq = Lexical.docFreq(post).persist()
    val stats = Lexical.corpusStats(d, "text")
    post.count(); dfreq.count()
    timed("fromStore (round-14 shape)") {
      Lexical.bm25TopKFromStore(post, dfreq, stats,
        qs, "qtext", "q_id", k = 10).count()
    }
    timed("bm25TopK (persist form)") {
      Lexical.bm25TopK(d, "text", "doc_id", qs, "qtext", "q_id",
        k = 10).count()
    }
    spark.stop()
  }
}
