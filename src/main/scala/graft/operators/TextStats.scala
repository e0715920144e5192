package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-statistics operators (TF-IDF term weighting) for
  * training-data pipelines.
  *
  * Plan shape at scale: per-doc term frequencies are one explode +
  * groupBy with map-side combine; document frequencies aggregate the
  * (already tiny relative to the corpus) vocabulary; both the DF table
  * and the single-row corpus count join back via broadcast, so the only
  * corpus-sized shuffles are the TF groupBy and the final per-doc
  * top-k window. No global sort, no driver-side collection.
  */
object TextStats {

  /** Per-(doc, term) frequency table: idCol, term, tf. */
  def termFrequencies(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Smoothed log idf: ln((n+1)/(df+1)) + 1. libm-dependent — last-ulp
    * results may differ across engines; use [[linearIdf]] when exact
    * cross-engine reproducibility matters.
    */
  def logIdf(n: Column, df: Column): Column =
    log((n + 1).cast("double") / (df + 1).cast("double")) + 1.0

  /** Linear inverse document frequency n/df. Exactly reproducible in
    * any IEEE-754 engine: the integer product and the division are
    * single correctly-rounded operations.
    */
  def linearIdf(n: Column, df: Column): Column =
    n.cast("double") / df.cast("double")

  /** Intra-document repetition statistics — the Gopher-rule family of
    * corpus quality filters (repetitious documents are boilerplate /
    * spam signals):
    *
    *   - distinct_ratio: |distinct tokens| / |tokens|
    *   - dup_shingle_ratio: 1 − |distinct 3-grams| / |3-grams|
    *   - top_token_ratio: max single-token count / |tokens|
    *
    * Plan shape: the array ratios are scan-local column math; the top
    * token count is one explode + two-phase count + per-doc max (the
    * n-gram-stats shape), joined back on the doc key. Ratios round to
    * 6 dp so they're engine-exact (single correctly-rounded division).
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("toks"))).cast("double") /
          col("n_tokens").cast("double"), 6))
      .withColumn("sh", TextFunctions.shingles3(col("toks")))
      .withColumn("dup_shingle_ratio",
        round(lit(1.0) - size(array_distinct(col("sh"))).cast("double") /
          size(col("sh")).cast("double"), 6))
      .select(col(idCol), col("n_tokens"), col("distinct_ratio"),
        col("dup_shingle_ratio"))
    val top = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max("c").as("top_c"))
    base.join(top, Seq(idCol))
      .withColumn("top_token_ratio",
        round(col("top_c").cast("double") / col("n_tokens").cast("double"), 6))
      .drop("top_c")
  }

  /** Sequence packing: assign each document a fixed token-budget bin
    * for training-shard assembly. Documents are laid out in `orderCol`
    * order within each `shardCol` partition; a document starting at
    * cumulative token offset `off` lands in bin `off div budget`
    * (documents may straddle a budget boundary — the streaming
    * concatenation model, where a doc spills into the next context
    * window rather than re-packing).
    *
    * Scale: bin assignment is ONE window cumsum per shard — no global
    * sort, no sequential fold. Shard count bounds window-partition
    * size; shard by a hash bucket so layout is growth-stable.
    *
    * Output: all input columns + n_tokens, tok_offset (cumulative
    * tokens before this doc within the shard), bin.
    */
  def packTokenBudget(docs: DataFrame, textCol: String, shardCol: Column,
                      orderCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens",
        size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer `div`, not `/`: bins stay exact past 2^53 offsets
      .withColumn("bin", expr(s"tok_offset div $budget"))
  }

  /** Top-k terms per document by tf·idf.
    *
    * Output: idCol, term, tf, df, score_micro (= floor(score·10⁶),
    * integer so hash-comparable across engines), rank. Ranking breaks
    * score ties on term ascending, so the result is fully deterministic.
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String, k: Int,
                    idf: (Column, Column) => Column = linearIdf): DataFrame = {
    val tf = termFrequencies(docs, textCol, idCol)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * idf(col("n"), col("df")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        floor(col("score") * 1e6).cast("long").as("score_micro"),
        col("rank"))
  }

  /** SCALE PATH for per-group top n-grams (q46's surface): one
    * Misra–Gries summary per group — the shuffle carries ≤ `capacity`
    * counters per group instead of every distinct (group, gram) pair.
    * EXACT below capacity (bounded vocabularies — and the q150 oracle
    * pins bit-equality to the full-count answer there); over capacity
    * the PODS'12 theorems hold: no overcount, bounded undercount,
    * heavy hitters retained (q133's verdict surface). At web scale the
    * exact path ships tens of millions of tail grams per language that
    * the caller immediately discards — the q133 asymmetry, measured on
    * this operator in ScaleBench `text_freq`.
    *
    * Output: groupCol, `gram_sk` (the mergeable summary — persist it,
    * roll it up with [[Sketches.freqMerge]], or read the top-m with
    * [[Sketches.freqTopCsv]] / [[topFromSketch]]).
    */
  def topBigramsSketch(docs: DataFrame, textCol: String, groupCol: String,
                       capacity: Int): DataFrame =
    docs
      .select(col(groupCol),
        explode(TextFunctions.bigrams(TextFunctions.tokens(col(textCol))))
          .as("gram"))
      .groupBy(groupCol)
      .agg(Sketches.freqSketch(col("gram"), capacity).as("gram_sk"))

  /** SCALE PATH for the document-frequency table (the side q47
    * broadcasts): per-group DF summaries — distinct terms per doc
    * explode once, then one MG summary per group. Same exact-below-
    * capacity / theorems-above contract as [[topBigramsSketch]].
    */
  def docFreqSketch(docs: DataFrame, textCol: String, groupCol: String,
                    capacity: Int): DataFrame =
    docs
      .select(col(groupCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))
      .groupBy(groupCol)
      .agg(Sketches.freqSketch(col("term"), capacity).as("df_sk"))

  /** Explode a frequent-items summary into the (group, item, n, rank)
    * shape the exact top-k queries produce: top `m` by (count desc,
    * item asc) — bit-equal to the window-ranked exact answer while the
    * summary is in its exact regime.
    */
  def topFromSketch(sk: DataFrame, skCol: String, itemName: String,
                    m: Int): DataFrame = {
    val sorted = array_sort(Sketches.freqItems(col(skCol)), (l, r) =>
      when(l.getField("_2") > r.getField("_2"), -1)
        .when(l.getField("_2") < r.getField("_2"), 1)
        .when(l.getField("_1") < r.getField("_1"), -1)
        .when(l.getField("_1") > r.getField("_1"), 1)
        .otherwise(0))
    sk.select(col("*"), posexplode(slice(sorted, 1, m)))
      .select(sk.columns.filter(_ != skCol).map(col) :+
        col("col._1").as(itemName) :+ col("col._2").as("n") :+
        (col("pos") + 1).cast("int").as("rank"): _*)
  }

  /** CCNet-style language-model filtering, log-free: an MLE bigram
    * model is trained on the corpus itself (bigram and context counts
    * — two aggregations), and every document is scored by its average
    * conditional bigram probability in EXACT integer micro-units:
    * per bigram `t = (c12·10⁶) div c(w1)`, per document
    * `fluency_micro = Σt div n_bigrams`. All-integer arithmetic — no
    * log, no FP sum — so the score is bit-identical across engines and
    * partitionings (the perplexity ordering survives: avg conditional
    * probability is a monotone fluency proxy; boilerplate-ish token
    * salads score near uniform 10⁶/|V|, fluent text far above).
    *
    * Plan: one explode, ONE map-side-combined count aggregation of the
    * stream (by gram); the context count derives from the distinct-gram
    * table (`c1 = Σ c12 over the context's bigrams`), and the two
    * counts pre-join into a gram→score table BEFORE touching the
    * stream again — so the corpus-sized bigram stream is shuffled
    * exactly twice (the gram join + the per-doc aggregation), never by
    * w1. The first formulation joined the stream twice and measured
    * 19 min at 10⁷ docs in ScaleBench; everything after the gram
    * count moves distinct-gram-sized tables only (broadcast while the
    * vocab is small, SMJ at web-corpus vocab sizes).
    *
    * Output: idCol, n_bigrams, fluency_micro, verdict
    * ("drop" below `dropBelowMicro`).
    */
  def bigramLmScore(docs: DataFrame, textCol: String, idCol: String,
                    dropBelowMicro: Long): DataFrame = {
    val grams = docs
      .select(col(idCol),
        explode(TextFunctions.bigrams(
          TextFunctions.tokens(col(textCol)))).as("gram"))
    val bigramCounts = grams.groupBy("gram").agg(count(lit(1)).as("c12"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
    // context count = how many bigram INSTANCES start with w1; summing
    // the per-gram counts is exactly that, without re-shuffling the
    // stream: c(w1) = Σ_{g : w1(g)=w1} c12(g)
    val contextCounts = bigramCounts.groupBy("w1").agg(sum("c12").as("c1"))
    val gramScore = bigramCounts
      .join(contextCounts, "w1")
      .select(col("gram"), expr("(c12 * 1000000) div c1").as("t"))
    grams
      .join(gramScore, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(t) div count(1)").as("fluency_micro"))
      .withColumn("verdict",
        when(col("fluency_micro") < dropBelowMicro, "drop").otherwise("keep"))
  }

  /** C4/CCNet boilerplate removal: drop paragraphs that recur across
    * `minDocs`+ distinct documents (nav bars, footers, cookie banners
    * — the content that repeats verbatim across a crawl), keeping each
    * document's surviving paragraphs in original order.
    *
    * Plan: one paragraph explode, one distinct-doc count per paragraph
    * (the only corpus-wide shuffle), an equi join back, and a per-doc
    * reassembly aggregation (collect_list + struct sort — order
    * restored without a global sort). Paragraph identity is
    * xxhash64(para): the frequency count and the join shuffle 8-byte
    * keys, never multi-KB paragraph strings — on a crawl-scale corpus
    * the wide key would dominate shuffle bytes. The paragraph text
    * rides only on the reassembly (paras) side. A 64-bit collision
    * would merge two distinct paragraphs' doc counts; at 2^32
    * distinct paragraphs the expected collision count is ~0.5
    * (birthday bound) and the failure mode is one spuriously dropped
    * paragraph — acceptable for boilerplate filtering.
    *
    * Output: idCol, clean_text, n_kept, n_dropped.
    */
  def dropBoilerplate(docs: DataFrame, textCol: String, idCol: String,
                      sep: String, minDocs: Long): DataFrame = {
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
      .withColumn("para_h", xxhash64(col("para")))
    val freq = paras.groupBy("para_h")
      .agg(countDistinct(col(idCol)).as("n_docs"))
    paras.join(freq, "para_h")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("n_docs") < minDocs, struct(col("pos"), col("para"))))),
          x => x.getField("para")), sep).as("clean_text"),
        sum(when(col("n_docs") < minDocs, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("n_docs") >= minDocs, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Overlapping token-window chunks — training-sequence prep (split
    * each document into windows of `chunkLen` tokens starting every
    * `stride` tokens, so consecutive chunks overlap by chunkLen−stride).
    * Scan-local: tokenize once, explode the window starts, slice — zero
    * shuffle at any corpus size.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0, "chunkLen and stride must be positive")
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 1, lit(stride)))
          .as("_start"))
      .select(col(idCol),
        col("_start").cast("long").as("chunk_start"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(chunkLen)), " ")
          .as("chunk_text"),
        size(slice(col("_toks"), col("_start") + 1, lit(chunkLen)))
          .cast("long").as("n_chunk_tokens"))
  }
}
