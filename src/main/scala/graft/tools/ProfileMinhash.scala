package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Stage-by-stage timing of the q26 MinHash+LSH pipeline at a given SF
  * dir — identifies whether the cost is tokenize/shingle, md5 hashing,
  * the k affine mins, bucketing, or the pair expansion. Scratch tool,
  * not part of the driver contract.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    def corpus: DataFrame = {
      val d = Tables.documents(spark, dir)
      d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
    }
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    time("scan+count")(corpus.count())
    time("tokenize")(corpus.select(TextFunctions.tokens(col("text")).as("t"))
      .select(sum(size(col("t")))).count())
    val sh = corpus.withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("sh", TextFunctions.shingles3(col("toks")))
    time("+shingles")(sh.select(sum(size(col("sh")))).count())
    val hs = sh.withColumn("hs", Dedup.shingleHashes(col("sh")))
    time("+md5 shingle hashes")(hs.select(sum(size(col("hs")))).count())
    val sigs = hs.select(col("doc_id"),
      Dedup.intMinhashSignature(col("hs"), k = 8).as("sig"))
    time("+8 affine minhash")(sigs.select(sum(size(col("sig")))).count())
    val buckets = Dedup.lshBuckets(sigs, "sig", "doc_id", 4, 2)
    time("+lsh buckets")(buckets.count())
    time("full pairs")(Dedup.candidatePairs(buckets, "doc_id").count())
    // isolate the downstream cost: same pair expansion over a
    // materialized buckets table (no lineage recompute possible)
    val cached = buckets.cache()
    cached.count()
    time("pairs from cached")(Dedup.candidatePairs(cached, "doc_id").count())
    time("cached groupBy count")(
      cached.groupBy("band", "bucket").agg(count(lit(1))).count())
    time("cached collect_list")(
      cached.groupBy("band", "bucket")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids")).count())
    cached.unpersist()
    // planning cost alone: analysis + optimization + physical planning
    // of the full pair pipeline, no execution
    def planOnly(): Long = {
      Dedup.candidatePairs(
        Dedup.lshBuckets(
          corpus.withColumn("toks", TextFunctions.tokens(col("text")))
            .withColumn("sh", TextFunctions.shingles3(col("toks")))
            .withColumn("hs", Dedup.shingleHashes(col("sh")))
            .select(col("doc_id"),
              Dedup.intMinhashSignature(col("hs"), k = 8).as("sig")),
          "sig", "doc_id", 4, 2), "doc_id")
        .queryExecution.executedPlan
      0L
    }
    time("plan only (no exec)")(planOnly())
    spark.stop()
  }
}
