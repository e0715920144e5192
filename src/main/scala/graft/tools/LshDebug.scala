// Narrow which ANN operator trips the whole-stage-codegen fallback
// (janino "is not an rvalue") the ann_recall bench logs. Run each
// candidate in isolation; the CodeGenerator ERROR lands on stderr
// between the section markers.
package graft.tools

import org.apache.spark.sql.functions._

object LshDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    import graft.operators.Similarity
    val corpus = ScaleBench.synthEmbeddings(spark, 20000L).cache()
    corpus.count()
    val queries = ScaleBench.embQueries(spark, 50L)
    def section(name: String)(f: => Long): Unit = {
      System.err.println(s"=== SECTION $name ===")
      val n = f
      System.err.println(s"=== END $name rows=$n ===")
    }
    section("brute") {
      Similarity.bruteForceTopK(corpus, queries, "doc_id", "embedding",
        k = 10).count()
    }
    section("lsh1") {
      Similarity.lshTopK(corpus, queries, "doc_id", "embedding",
        bits = 16, k = 10).count()
    }
    section("lshmp4") {
      Similarity.lshTopKMultiProbe(corpus, queries, "doc_id", "embedding",
        bits = 16, nProbe = 4, k = 10).count()
    }
    section("ivf") {
      val cents = Similarity.centroidVectors(corpus, "doc_id",
        "embedding", 16)
      Similarity.ivfTopKWith(corpus, queries, "doc_id", "embedding",
        cents, 4, k = 10).count()
    }
    spark.stop()
  }
}
