package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Fnmatch

/** Scans, projections, filters, joins, aggregations, sorts, set ops —
  * the relational substrate of SURVEY.md §2.1–2.4/2.6/2.7, expressed
  * over the driver's TPC-H-ish tables.
  *
  * Scale notes: filters/projections push to parquet (Catalyst);
  * dimension joins are broadcast; aggregates are partial (map-side)
  * automatically. Exact-decimal sums keep results reproducible across
  * partitionings — double summation order would not be.
  */
object CoreQueries {

  private val globType  = "PRO*"         // reference NSLC-style glob
  private val globBrand = "Brand#?[13]"  // ?, [seq] forms
  private val reType    = Fnmatch.translate(globType)
  private val reBrand   = Fnmatch.translate(globBrand)

  val all: Seq[Q] = Seq(

    // ---- §2.4 aggregation: grouped sums/counts/averages (TPC-H Q1 shape;
    //      obsplus availability-style groupBy-agg generalization)
    Q("q01_pricing_summary", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit("1999-06-30 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            ).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)), 4).as("avg_qty"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""), headline = true),

    // ---- §2.2 NSLC wildcard filter: fnmatch glob → anchored rlike
    Q("q02_glob_filter", (s, dir) => {
      val p = Tables.part(s, dir)
      p.filter(Fnmatch.matches(col("p_type"), globType) ||
               Fnmatch.matches(col("p_brand"), globBrand))
        .select("p_partkey", "p_name", "p_brand", "p_type")
    }, Some(s"""
      SELECT p_partkey, p_name, p_brand, p_type FROM part
      WHERE regexp_matches(p_type, '$reType') OR regexp_matches(p_brand, '$reBrand')""")),

    // ---- §2.2 min_/max_ prefix predicates — STRICT inequalities
    //      (obsplus `utils/bank.py:371-374`)
    Q("q03_minmax_strict", (s, dir) => {
      val p = Tables.part(s, dir)
      p.filter(col("p_size") > 10 && col("p_size") < 40 && col("p_retailprice") > 950.0)
        .select("p_partkey", "p_size", "p_retailprice")
    }, Some("""
      SELECT p_partkey, p_size, p_retailprice FROM part
      WHERE p_size > 10 AND p_size < 40 AND p_retailprice > 950.0""")),

    // ---- §2.2 equality / IN filters
    Q("q04_in_filter", (s, dir) => {
      val c = Tables.customer(s, dir)
      c.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
               col("c_nationkey").isin(1, 3, 5, 7, 9))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"),
             sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }, Some("""
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      WHERE c_mktsegment IN ('BUILDING','MACHINERY') AND c_nationkey IN (1,3,5,7,9)
      GROUP BY c_mktsegment, c_nationkey""")),

    // ---- §2.6 sort + limit (deterministic tiebreak on unique key)
    Q("q05_topk_orders", (s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ---- §2.3 broadcast equi joins across the dimension chain
    Q("q06_join_agg", (s, dir) => {
      val r = Tables.region(s, dir); val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      // enrich the dim chain first (all tiny), then ONE broadcast
      // against the fact table — the probe side sees a single
      // build-side instead of three stacked broadcast stages
      val dim = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("r_name"))
      o.join(broadcast(dim), o("o_custkey") === dim("c_custkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }, Some("""
      SELECT r_name, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""), headline = true),

    // ---- §2.3 semi / anti joins (obsplus index trace-id semi join)
    Q("q07_semi_anti", (s, dir) => {
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("has_orders"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("no_orders"))
      semi.unionByName(anti)
    }, Some("""
      SELECT c_nationkey, COUNT(*) AS n, 'has_orders' AS kind FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_nationkey
      UNION ALL
      SELECT c_nationkey, COUNT(*) AS n, 'no_orders' AS kind FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_nationkey""")),

    // ---- §2.7 set operations: intersect / except (distinct semantics)
    Q("q08_set_ops", (s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val u = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
      f.intersect(u).withColumn("op", lit("both"))
        .unionByName(f.except(u).withColumn("op", lit("f_only")))
    }, Some("""
      SELECT k, 'both' AS op FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus='F'
        INTERSECT SELECT o_custkey AS k FROM orders WHERE o_orderpriority='1-URGENT')
      UNION ALL
      SELECT k, 'f_only' AS op FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus='F'
        EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderpriority='1-URGENT')""")),

    // ---- §2.4 median / percentiles (obsplus median pick time,
    //      `events/merge.py:238-248`) — exact interpolated percentile
    Q("q09_percentiles", (s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
             round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
             round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
             count(lit(1)).as("n"))
    }, Some("""
      SELECT o_orderpriority,
        ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority""")),

    // ---- §2.4 origin-quality-counts shape: conditional counts,
    //      distinct set, sorted CSV join (`events/pd.py:100-151`)
    Q("q10_group_detail", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_orderkey")
        .agg(count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
             count(when(col("l_linestatus") === "F", 1)).as("n_finished"),
             countDistinct(col("l_suppkey")).as("n_supp"),
             array_join(array_sort(collect_set(col("l_suppkey").cast("string"))), ",").as("supp_csv"))
    }, Some("""
      SELECT l_orderkey,
        COUNT(CASE WHEN l_returnflag='R' THEN 1 END) AS n_returned,
        COUNT(CASE WHEN l_linestatus='F' THEN 1 END) AS n_finished,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        string_agg(DISTINCT CAST(l_suppkey AS VARCHAR), ',' ORDER BY CAST(l_suppkey AS VARCHAR)) AS supp_csv
      FROM lineitem GROUP BY l_orderkey""")),

    // ---- §2.4 latest-per-group (obsplus "latest magnitude per type",
    //      `events/pd.py:166-175`) via ranked window
    Q("q11_latest_per_group", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
      // the ranking must order by every emitted column to be deterministic
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc,
                 col("l_quantity").desc, col("l_extendedprice").desc)
      li.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_shipdate").cast("date").as("ship_date"), col("l_quantity"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_quantity
      FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_shipdate DESC, l_linenumber DESC,
                       l_quantity DESC, l_extendedprice DESC) AS rn FROM lineitem)
      WHERE rn = 1""")),

    // ---- §2.4 distinct ids (obsplus `ids_in_bank`) + counts
    Q("q12_distinct_ids", (s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n_orders"))
    }, Some("""
      SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderstatus""")),

    // ---- the 100 TB scale path for q12/q09: sketch aggregates.
    //      COUNT(DISTINCT) needs a per-group dedup shuffle of every
    //      distinct value; HLL++ is a fixed-size mergeable buffer, and
    //      approx_percentile bounds memory where exact percentile_approx
    //      of a giant group can't. Sketch bytes aren't cross-engine
    //      reproducible, so the hashable surface is: the EXACT answers
    //      (rank-based discrete percentiles — element picks, no FP
    //      interpolation) plus in-bounds verdicts for each sketch
    //      against its published error guarantee (HLL rsd=2% → 6% =
    //      3σ; approx_percentile accuracy=1000 → rank error ≤ n/1000).
    //      The oracle recomputes the exact columns and asserts the
    //      verdicts are all 1 — a sketch drifting out of bounds fails
    //      the driver hash. SketchSpec covers tighter error curves.
    Q("q63_sketch_aggs", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
      val wS = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val wAll = Window.partitionBy("o_orderstatus")
      val tol = ceil(col("n") / 1000.0) + lit(1)
      val exact = o.withColumn("rn", row_number().over(wS).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust_exact"),
          max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice"))).as("p50_exact"),
          max(when(col("rn") === ceil(col("n") * 0.95), col("o_totalprice"))).as("p95_exact"),
          max(when(col("rn") === greatest(ceil(col("n") * 0.5) - tol, lit(1L)),
            col("o_totalprice"))).as("p50_lo"),
          max(when(col("rn") === least(ceil(col("n") * 0.5) + tol, col("n")),
            col("o_totalprice"))).as("p50_hi"),
          max(when(col("rn") === greatest(ceil(col("n") * 0.95) - tol, lit(1L)),
            col("o_totalprice"))).as("p95_lo"),
          max(when(col("rn") === least(ceil(col("n") * 0.95) + tol, col("n")),
            col("o_totalprice"))).as("p95_hi"))
      val sketched = o.groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n_cust_hll"),
             expr("approx_percentile(o_totalprice, array(0.5, 0.95), 1000)")
               .as("pq"))
      exact.join(sketched, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_cust_exact"),
          col("p50_exact"), col("p95_exact"),
          when(abs(col("n_cust_hll") - col("n_cust_exact"))
            <= col("n_cust_exact") * 0.06, 1L).otherwise(0L).as("hll_ok"),
          when(element_at(col("pq"), 1).between(col("p50_lo"), col("p50_hi")), 1L)
            .otherwise(0L).as("p50_ok"),
          when(element_at(col("pq"), 2).between(col("p95_lo"), col("p95_hi")), 1L)
            .otherwise(0L).as("p95_ok"))
    }, Some("""
      WITH ranked AS (
        SELECT o_orderstatus, o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders)
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_cust_exact,
             MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT)
                      THEN o_totalprice END) AS p50_exact,
             MAX(CASE WHEN rn = CAST(CEIL(n * 0.95) AS BIGINT)
                      THEN o_totalprice END) AS p95_exact,
             CAST(1 AS BIGINT) AS hll_ok,
             CAST(1 AS BIGINT) AS p50_ok,
             CAST(1 AS BIGINT) AS p95_ok
      FROM ranked GROUP BY o_orderstatus"""))
  )
}
