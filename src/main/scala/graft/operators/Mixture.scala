package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain-mixture sampling: downsample each source
  * (domain/language/quality tier) to a target rate, the way a training
  * mix is tuned ("webtext ×0.3, code ×1.0, wiki ×0.8").
  *
  * The keep decision is a pure hash threshold — `h(salt, id) mod 10⁶ <
  * rate·10⁶` — so it is (a) reproducible across runs, engines and
  * cluster layouts, (b) scan-local: ZERO shuffle, the filter pushes
  * into the scan pipeline, and (c) stable under corpus growth: a doc's
  * fate never depends on other rows (unlike rank-based quotas).
  * The hash rides the fused `md5_long60` expression
  * ([[graft.plans.Md5Long60]]), same family the oracle can derive.
  */
object Mixture {

  private val Scale = 1000000L

  /** Keep-decision column for one rate (0.0–1.0). */
  def keep(idCol: Column, rate: Double, salt: String = "mix"): Column =
    call_function("md5_long60",
      concat(lit(salt + ":"), idCol.cast("string"))) % Scale <
      math.round(rate * Scale)

  /** Filter `df` to the per-source target rates; sources absent from
    * the map keep rate 1.0 (pass through).
    */
  def sampleByWeights(df: DataFrame, idCol: String, sourceCol: String,
                      rates: Map[String, Double],
                      salt: String = "mix"): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val rateCol = rates.foldLeft(lit(1.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(
      call_function("md5_long60",
        concat(lit(salt + ":"), col(idCol).cast("string"))) % Scale <
        round(rateCol * Scale).cast("long"))
  }

  /** Cap each group (source/domain/host) at `k` rows, chosen by a
    * deterministic order — the RefinedWeb/C4-style per-domain quota
    * that stops a handful of giant domains from dominating a corpus.
    *
    * One shuffle on `groupCols`; the `row_number <= k` filter activates
    * Spark's WindowGroupLimit, so each map task pre-prunes to its local
    * top-k before the exchange — the shuffle carries O(groups × k),
    * not the corpus, no matter how skewed the domains are. Pass a
    * hash-of-id ordering for an unbiased quota (position in the archive
    * must not decide survival).
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column], k: Int,
                  order: Seq[Column],
                  rankCol: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*).orderBy(order: _*)
    // collision-safe internal name: suffix a counter past any caller
    // column, and refuse to silently replace an existing rankCol
    rankCol.foreach(name => require(!df.columns.contains(name),
      s"capPerGroup: rank column '$name' already exists in the input"))
    val internal = Iterator.from(0)
      .map(i => if (i == 0) "_graft_qrank" else s"_graft_qrank$i")
      .find(n => !df.columns.contains(n)).get
    val ranked = df.withColumn(internal, row_number().over(w))
      .filter(col(internal) <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed(internal, name)
      case None => ranked.drop(internal)
    }
  }
}
