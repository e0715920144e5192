package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: find training documents that share
  * word-n-grams with an evaluation/benchmark corpus, so they can be
  * dropped before training (the standard "test-set contamination"
  * sweep, e.g. GPT-3 appendix C / PaLM-style 3-gram overlap checks).
  *
  * Plan shape at scale: the eval corpus is tiny next to training data
  * (thousands of docs vs billions), so its distinct shingle-hash set
  * broadcasts; the training side is one explode + broadcast hash join +
  * one groupBy — the ONLY corpus-sized shuffle is the per-doc count,
  * and the training corpus is never repartitioned or self-joined.
  * Shingles hash through the fused `shingle_hash60` expression
  * ([[graft.plans.ShingleHash60]]), the same 60-bit md5-prefix family
  * the MinHash pipeline uses, so the oracle derives identical values.
  */
object Contamination {

  /** Training docs sharing at least one `width`-gram with the eval
    * corpus: (idCol, n_shared) where n_shared counts DISTINCT shared
    * shingle hashes. Clean docs don't appear (filter semantics);
    * left-join downstream to keep them with n_shared = 0.
    */
  def contaminatedDocs(train: DataFrame, eval: DataFrame,
                       textCol: String, idCol: String,
                       width: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.register(train.sparkSession)
    def hashes(df: DataFrame) = df.select(col(idCol),
      explode(array_distinct(Dedup.tokenShingleHashes(
        TextFunctions.tokens(col(textCol)), width))).as("h"))
    val evalHashes = hashes(eval).select("h").distinct()
    hashes(train)
      .join(broadcast(evalHashes), "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
