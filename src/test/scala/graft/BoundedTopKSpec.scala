package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

/** The native bounded_topk aggregate must be output-identical to the
  * typed TopK Aggregator it replaces — same total order (NaN last,
  * ties id asc), same bounded result, across group shapes and under
  * serialize/merge paths (shuffled partials).
  */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("native ≡ typed aggregate on a DataFrame with NaN and dup keys") {
    graft.plans.GraftExtensions.register(spark)
    val rows = (0 until 2000).map { i =>
      val d =
        if (i % 97 == 0) Double.NaN
        else if (i % 5 == 0) 1.0 // heavy ties
        else ((i * 2654435761L) % 1000) / 7.0
      (i % 7L, d, i.toLong)
    }.toDF("g", "d", "id").repartition(8)

    for (k <- Seq(1, 3, 50)) {
      val typed = rows.groupBy("g")
        .agg(TopK.topK(k)(col("d"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("g"), col("pos"),
          col("t.d").as("d"), col("t.id").as("id"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getLong(3))).toSet
      val native = rows.groupBy("g")
        .agg(TopK.topKNative(k, col("d"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("g"), col("pos"),
          col("t.d").as("d"), col("t.id").as("id"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getLong(3))).toSet
      assert(native == typed, s"k=$k diverged")
    }
  }

  test("buffer: bounded inserts, reject path, serde round trip, merge") {
    val b = new graft.plans.TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 2L), (9.0, 3L), (1.0, 1L), (0.5, 9L))
      .foreach { case (d, i) => b.insert(d, i) }
    assert(b.size == 3)
    assert((0 until 3).map(i => (b.d(i), b.id(i))) ==
      Seq((0.5, 9L), (1.0, 1L), (1.0, 2L)))
    b.insert(99.0, 7L) // reject: >= last
    assert(b.size == 3 && b.d(2) == 1.0)

    val agg = graft.plans.BoundedTopK(3, null, null)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.size == 3 &&
      (0 until 3).forall(i => back.d(i) == b.d(i) && back.id(i) == b.id(i)))

    val o = new graft.plans.TopKBuffer(3)
    o.insert(0.7, 5L)
    o.insert(Double.NaN, 1L)
    b.mergeIn(o)
    assert((0 until 3).map(i => (b.d(i), b.id(i))) ==
      Seq((0.5, 9L), (0.7, 5L), (1.0, 1L))) // NaN sorts last, drops
  }

  test("streaming state rows stay bounded at k through the native agg") {
    // windowed streaming aggregation with the native aggregate: the
    // state row count is (windows × groups), each row ≤ k entries
    import org.apache.spark.sql.streaming.Trigger
    graft.plans.GraftExtensions.register(spark)
    val t0 = 1_600_000_000_000_000_000L
    val data = (0 until 5000).map(i =>
      (i % 4L, (i * 37 % 101) / 3.0, i.toLong, t0 + i * 1_000L))
      .toDF("g", "d", "id", "ts")
    val flush = Seq((99L, 0.0, 0L, t0 + 8L * 3600L * 1_000_000_000L))
      .toDF("g", "d", "id", "ts")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-btk").toString
    data.unionByName(flush).repartition(4)
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val out = stream
      .select(col("g"), col("d"), col("id"),
        timestamp_micros(expr("ts div 1000")).as("_ts"))
      .withWatermark("_ts", "10 seconds")
      .groupBy(window(col("_ts"), "6 hours"), col("g"))
      .agg(TopK.topKNative(5, col("d"), col("id")).as("top"))
    val sink = "btk_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(sink).filter(col("g") < 10)
      .select(col("g"), col("top")).collect()
    assert(got.length == 4)
    assert(got.forall(_.getSeq[Any](1).length == 5))
    val peak = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).max
    assert(peak <= 5 + 1, s"state rows must be (windows × groups): $peak")
    spark.catalog.dropTempView(sink)
  }
}
