package graft

import graft.core.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(
        (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v"),
        "bkt_fact", Seq("k"), 4)
      Bucketing.writeBucketed(
        (1 to 200).map(i => (i.toLong % 50, s"d$i")).toDF("k", "d"),
        "bkt_dim", Seq("k"), 4)

      val joined = spark.table("bkt_fact").join(spark.table("bkt_dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000L * 4) // 200 dim rows / 50 keys = 4 each

      // aggregation on the bucket key is also shuffle-free
      val agg = spark.table("bkt_fact").groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(agg.count() == 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }
}
