package graft.tools

/** Diagnostic harness for the non-parametric OPQ Procrustes solve
  * (round 13): prints the orthonormality defect of U (power stages of
  * M·Mᵀ, WITHOUT degenerate-stage completion — the raw failure mode)
  * and of the final R (WITH completion) on the sf embeddings corpus.
  * This is the probe that established M = E[x·ŷᵀ] is rank ≤ k·m by
  * construction at small codebooks (defect exactly 1.0: stages beyond
  * rank collapse to duplicates under the float-cast noise floor) and
  * that the deterministic basis completion restores R·Rᵀ = I (defect
  * ~1e-7).
  */
object NpDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val e = graft.core.Tables.embeddings(spark, args(0))
    import graft.operators.ProductQuantizer
    val pi = if (args.length > 1) args(1).toInt else 4
    val opq = ProductQuantizer.fitOpq(e, "vec_id", "embedding",
      m = 4, k = 4, iters = 2, powerIters = pi)
    val mm = ProductQuantizer.debugCrossCov(e, "vec_id", "embedding", opq, 64)
    val d = 64
    val s = Array.tabulate(d, d) { (r, c) =>
      (0 until d).map(j => mm(r)(j) * mm(c)(j)).sum
    }
    def defect(vs: Array[Array[Float]]): Double = {
      var worst = 0.0
      for (a <- 0 until d; b <- a until d) {
        val dot = (0 until d).map(i => vs(a)(i).toDouble * vs(b)(i).toDouble).sum
        val want = if (a == b) 1.0 else 0.0
        worst = math.max(worst, math.abs(dot - want))
      }
      worst
    }
    val (usRaw, lams) = ProductQuantizer.eigenStages(s, d, pi)
    println(s"[npdebug] U defect (no completion) = ${defect(usRaw)}")
    println(s"[npdebug] lams head = ${lams.take(8).mkString(",")}")
    println(s"[npdebug] lams tail = ${lams.takeRight(8).mkString(",")}")
    val rot = ProductQuantizer.procrustesRotation(mm, d, pi)
    println(s"[npdebug] R defect (with completion) = ${defect(rot)}")
    spark.stop()
  }
}
