package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f),
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("id", "a", "b")
  }

  test("vec_dot equals the zip_with/aggregate composition bit-for-bit") {
    graft.plans.GraftExtensions.register(spark)
    val df = randVecs(500, 64, seed = 7)
      .withColumn("hof", VectorFunctions.dot(col("a"), col("b")))
      .withColumn("native", VectorFunctions.dotNative(col("a"), col("b")))
    // exact comparison — same FP ops in the same order must give the
    // same double, not merely a close one
    assert(df.filter(col("hof") =!= col("native")).count() == 0)
    assert(df.filter(col("hof").isNull).count() == 0)
  }

  test("vec_l2 equals the zip_with/aggregate squared-difference composition bit-for-bit") {
    graft.plans.GraftExtensions.register(spark)
    val hofL2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x)
    val df = randVecs(500, 64, seed = 11)
      .withColumn("hof", hofL2(col("a"), col("b")))
      .withColumn("native", VectorFunctions.l2Native(col("a"), col("b")))
    assert(df.filter(col("hof") =!= col("native")).count() == 0)
    assert(df.filter(col("hof").isNull).count() == 0)
    // null on length mismatch, like vec_dot
    val mm = Seq((1L, Array(1f, 2f, 3f), Array(3f, 4f))).toDF("id", "a", "b")
    assert(mm.select(VectorFunctions.l2Native(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("adc_dist equals the composed per-subspace vec_l2 sum bit-for-bit; null on shape violations") {
    graft.plans.GraftExtensions.register(spark)
    val m = 4; val subDim = 4; val k = 3
    val rnd = new scala.util.Random(19)
    val cb: Seq[Seq[Seq[Float]]] = Seq.fill(m)(Seq.fill(k)(
      Seq.fill(subDim)(rnd.nextFloat() * 2f - 1f)))
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(m * subDim)(rnd.nextFloat() * 2f - 1f).toSeq,
        Seq.fill(m)(rnd.nextInt(k)))
    }
    val df = rows.toDF("id", "qr", "codes")
    val cbLit = typedlit(cb)
    val composed = (0 until m).map { s =>
      VectorFunctions.l2Native(slice(col("qr"), s * subDim + 1, subDim),
        element_at(element_at(cbLit, s + 1),
          element_at(col("codes"), s + 1) + 1))
    }.reduce(_ + _)
    val out = df.select(
      composed.as("c"),
      call_function("adc_dist", col("qr"), col("codes"), cbLit).as("n"))
    assert(out.filter(col("c") =!= col("n")).count() == 0)
    assert(out.filter(col("c").isNull).count() == 0)
    // shape violations are null, never a crash: out-of-range code and
    // a qr length that doesn't match m*subDim
    val bad = Seq(
      (1L, Seq.fill(m * subDim)(0.5f), Seq(0, 1, 2, 99)), // code 99 >= k
      (2L, Seq.fill(m * subDim - 1)(0.5f), Seq.fill(m)(0)) // short qr
    ).toDF("id", "qr", "codes")
    val badOut = bad.select(
      call_function("adc_dist", col("qr"), col("codes"), cbLit).as("n"))
      .collect()
    assert(badOut.forall(_.isNullAt(0)))
  }

  test("adc_table + adc_dist_tbl ≡ adc_dist bit-for-bit; shape " +
       "violations null through the table path too") {
    graft.plans.GraftExtensions.register(spark)
    val m = 4; val subDim = 4; val k = 3
    val rnd = new scala.util.Random(23)
    val cb: Seq[Seq[Seq[Float]]] = Seq.fill(m)(Seq.fill(k)(
      Seq.fill(subDim)(rnd.nextFloat() * 2f - 1f)))
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(m * subDim)(rnd.nextFloat() * 2f - 1f).toSeq,
        Seq.fill(m)(rnd.nextInt(k)))
    }
    val df = rows.toDF("id", "qr", "codes")
    val cbLit = typedlit(cb)
    val out = df
      .withColumn("tbl", call_function("adc_table", col("qr"), cbLit))
      .select(
        call_function("adc_dist", col("qr"), col("codes"), cbLit).as("f"),
        call_function("adc_dist_tbl", col("tbl"), col("codes"),
          lit(m)).as("t"))
    assert(out.filter(col("f") =!= col("t")).count() == 0)
    assert(out.filter(col("f").isNull || col("t").isNull).count() == 0)
    // shape violations: out-of-range code nulls the lookup; a short qr
    // nulls the table itself
    val bad = Seq(
      (1L, Seq.fill(m * subDim)(0.5f), Seq(0, 1, 2, 99)),
      (2L, Seq.fill(m * subDim - 1)(0.5f), Seq.fill(m)(0)),
      // wrong m that still divides the table (m/2 codes vs an [m·k]
      // table) — the round-16 advisory case: must null, not return a
      // plausible k'=2k lookup
      (3L, Seq.fill(m * subDim)(0.5f), Seq.fill(m / 2)(0))
    ).toDF("id", "qr", "codes")
    val badOut = bad
      .withColumn("tbl", call_function("adc_table", col("qr"), cbLit))
      .select(col("id"), col("tbl"),
        call_function("adc_dist_tbl", col("tbl"), col("codes"),
          lit(m)).as("t"))
      .orderBy("id").collect()
    assert(badOut(0).isNullAt(2)) // code 99 >= k
    assert(badOut(1).isNullAt(1) && badOut(1).isNullAt(2)) // short qr
    assert(!badOut(2).isNullAt(1) && badOut(2).isNullAt(2)) // wrong m
  }

  test("vec_dot null semantics match zip_with padding: length mismatch and null element") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),          // ok: 11.0
      (2L, Array(1f, 2f, 3f), Array(3f, 4f))       // length mismatch
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("hof"),
        VectorFunctions.dotNative(col("a"), col("b")).as("native"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0 && out(0).getDouble(2) == 11.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("vec_dot stays inside whole-stage codegen") {
    graft.plans.GraftExtensions.register(spark)
    // repartition blocks ConvertToLocalRelation from pre-evaluating
    // the projection driver-side (which would leave no codegen stage)
    val df = randVecs(10, 8, seed = 1).repartition(2)
      .select(VectorFunctions.dotNative(col("a"), col("b")).as("d"))
    // run first: AQE only finalizes (and codegens) the plan on execution
    val rows = df.collect()
    assert(rows.length == 10 && rows.forall(!_.isNullAt(0)))
    // "*(n)" prefixes mark WholeStageCodegen spans in the compact plan
    // string; the vecdot projection must sit inside one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[vecdot.*"), plan)
  }
}
