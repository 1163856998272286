package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP block over the TPC-H-ish tables (SURVEY.md §2 "Analytics").
  *
  * These are the bench headliners: pure declarative DataFrame plans so
  * Catalyst gets pushdown/pruning/join-reorder for free, dimension
  * joins explicitly broadcast, and all money sums carried in
  * DECIMAL(38,6) so results are bit-identical to the DuckDB oracle.
  */
object Analytics {

  /** Exact cross-engine money arithmetic. The money columns are
    * doubles that encode exact 2-dp decimals, so casting each OPERAND
    * to decimal before any arithmetic keeps every product and sum
    * exact — no rounding happens anywhere, hence no engine- or
    * version-dependent rounding-mode / accumulation-order effects.
    * The single final decimal→double cast is correctly rounded in
    * both engines (scaled integers stay below 2^53 at any realistic
    * SF), so outputs are plain float64 — the one numeric type that
    * hashes identically across engines; decimal outputs don't (their
    * width/scale rendering is engine- and version-dependent). */
  private def money(c: Column): Column = c.cast("decimal(18,2)")
  private val one: Column = lit(new java.math.BigDecimal("1.00"))
  private def discounted(price: Column, disc: Column): Column =
    money(price) * (one - money(disc))
  private def dsum(c: Column): Column = sum(c).cast("double")

  // q20's (supplier, part) pair frame is persisted because it feeds
  // two consumers (see the query's scaladoc). A lazy persist cannot
  // be unpersisted before the caller's action runs, so repeated
  // invocations (bench reruns, specs) used to leak a cached copy per
  // call; memoizing per (session, dir) — the graph caches' lifecycle —
  // makes it ONE cached frame, and eviction unpersists it (safe for a
  // persist: consumers just recompute through the original plan).
  private val q20PairCache =
    new graft.util.LruCache[(SparkSession, String), DataFrame](
      4, (df: DataFrame) => df.unpersist(false))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(money(col("l_quantity"))).as("sum_qty"),
          dsum(money(col("l_extendedprice"))).as("sum_base_price"),
          dsum(discounted(col("l_extendedprice"), col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_topk" -> { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      // no broadcast hint: customer⋈orders is fact-sized at scale, so
      // the orderkey join must be free to shuffle; AQE still picks a
      // broadcast join at runtime when the filtered side is small
      li.join(cust.join(ord, cust("c_custkey") === ord("o_custkey"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    "q5_join5" -> { (s, d) =>
      // revenue per nation: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
      // nation/region are true dims (25/5 rows at any SF) → broadcast
      // hints; customer grows with SF, so its join gets no hint —
      // statically or via AQE Spark still broadcasts it while it fits
      val reg = Tables.region(s, d)
      val nat = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    "q6_filter" -> { (s, d) =>
      // Selective scan-filter-agg: all three predicates reach the
      // parquet reader as PushedFilters.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(money(col("l_extendedprice")) * money(col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    "q7_window" -> { (s, d) =>
      // Top-3 orders per customer by totalprice (rank over partition).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          money(col("o_totalprice")).cast("double").as("totalprice"),
          col("rk"))
        .orderBy("o_custkey", "rk")
    },

    "q7_topk_native" -> { (s, d) =>
      // same result as q7_window minus the rank column, produced by
      // the custom TopKPerKeyExec operator (bounded heap per key,
      // no partition sort) — see graft.plans.TopKPerKey
      graft.plans.TopK.perKey(Tables.orders(s, d), Seq("o_custkey"),
          Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
        .select(col("o_custkey"), col("o_orderkey"),
          money(col("o_totalprice")).cast("double").as("totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q8_rollup" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(dsum(money(col("o_totalprice"))).as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    "q14_grouping_sets" -> { (s, d) =>
      // explicit GROUPING SETS with grouping_id: the status totals and
      // the priority totals in ONE pass (rollup/cube's general form —
      // Spark expands to a single expand+agg, no double scan), plus
      // the grouping_id disambiguator for NULL-valued group keys
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY gid, o_orderstatus, o_orderpriority""")
    },

    "q12_rolling" -> { (s, d) =>
      // rolling 30-day spend per customer: a RANGE-frame window
      // (value-based, not row-based — peers at the same date share
      // one frame, so ties are deterministic in any engine). Decimal
      // accumulation, cast once at the end.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("sec"))
        .rangeBetween(-2592000L, 0L)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          // NTZ→timestamp cast is wall-clock under the pinned UTC
          // session tz — the same instant DuckDB's epoch_ns reads
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000")
            .as("sec"),
          money(col("o_totalprice")).as("p"))
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("p")).over(w).cast("double").as("spend_30d"),
          count(lit(1)).over(w).as("n_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q13_pivot" -> { (s, d) =>
      // PIVOT: order counts per status × priority, explicit value
      // list so the output schema is static (the streaming-safe and
      // 100 TB-safe form — an implicit pivot scans twice to discover
      // values); absent cells coalesce to 0 like SQL's FILTER form
      val p = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
      p.select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("p1_urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("p2_high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("p3_medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p4_none"),
          coalesce(col("5-LOW"), lit(0L)).as("p5_low"))
        .orderBy("o_orderstatus")
    },

    "q10_percentiles" -> { (s, d) =>
      // exact interpolated percentiles (both engines do linear
      // interpolation over the sorted values) + exact distinct count.
      // The true percentile of 2-dp inputs with frac ∈ {.5,.9} has at
      // most 3 decimals, so round(·,4) on the double absorbs any
      // last-ulp interpolation-arithmetic difference between engines
      // without ever sitting on a rounding boundary.
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy("o_orderstatus")
    },

    "q11_sketch" -> { (s, d) =>
      // the 100 TB form of q10: HyperLogLog++ distinct counts and
      // quantile-sketch percentiles — bounded-memory partial
      // aggregates that merge associatively, so the plan is one
      // map-side-combined shuffle regardless of group cardinality,
      // where exact distinct/percentile would buffer per-group value
      // sets. Rows-only: sketch estimates are engine-specific; the
      // relative-error contract vs the exact q10 answers is pinned
      // in AnalyticsSpec.
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.01)
            .as("n_custs_approx"),
          round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4)
            .as("p50_approx"),
          round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 4)
            .as("p90_approx"))
        .orderBy("o_orderstatus")
    },

    "q15_correlated" -> { (s, d) =>
      // TPC-H Q15 shape: supplier(s) whose windowed revenue equals
      // the global max — the scalar-correlated-subquery pattern. The
      // revenue CTE is computed ONCE (both consumers reference the
      // same frame, Catalyst reuses the exchange); the scalar max is
      // a single-row aggregate broadcast into the equality filter,
      // and the surviving row set (≥1 row, usually 1) broadcasts
      // into the supplier join — at any SF the only fact-sized work
      // is the initial filtered scan+agg. Revenue is exact decimal
      // arithmetic cast once to double, so the max-equality compares
      // identical float64 values in both engines.
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(dsum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max("total_revenue").as("__mx"))
      val top = rev.join(broadcast(mx), col("total_revenue") === col("__mx"))
        .select("l_suppkey", "total_revenue")
      Tables.supplier(s, d)
        .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    "q9_exists" -> { (s, d) =>
      // Customers with ≥1 order (semi) minus those with any F order
      // (anti) — EXISTS / NOT EXISTS as left_semi / left_anti joins.
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val withOrders = cust.join(ord.select("o_custkey"),
        cust("c_custkey") === col("o_custkey"), "left_semi")
      val fCust = ord.filter(col("o_orderstatus") === "F").select("o_custkey")
      withOrders.join(fCust, withOrders("c_custkey") === fCust("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"),
          money(col("c_acctbal")).cast("double").as("acctbal"))
        .orderBy("c_custkey")
    },

    "q16_supplier_cnt" -> { (s, d) =>
      // TPC-H Q16 shape: distinct-supplier breadth per part attribute
      // group, minus an excluded-supplier set (the "complaints" anti
      // join). part⋈lineitem shuffles on partkey once; the excluded
      // set is a small fraction of suppliers at any SF → broadcast
      // anti join; count(DISTINCT) pays the one extra shuffle a
      // distinct aggregation inherently needs (partial distinct on
      // (group, suppkey) first, so the wide shuffle dedups map-side).
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excluded = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 1000).select("s_suppkey")
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    "q17_small_qty" -> { (s, d) =>
      // TPC-H Q17 shape: per-part average-quantity correlated
      // subquery — revenue from lineitems under half their part's
      // mean quantity. The correlated scalar becomes one per-partkey
      // aggregate joined back on the SAME key the brand join uses, so
      // the plan is two shuffles on l_partkey (agg + join), no
      // re-scan per row. Cross-engine exactness: l_quantity is
      // integral-valued, so every partial double sum is exact and
      // avg = sum/count is the correctly-rounded quotient in any
      // accumulation order; 0.5*avg is an exponent shift.
      val li = Tables.lineitem(s, d)
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#3")
        .select("p_partkey")
      li.join(brand, col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(money(col("l_extendedprice"))) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    },

    "q18_big_orders" -> { (s, d) =>
      // TPC-H Q18 shape: large-quantity orders via group-HAVING, then
      // the winner set (tiny) drives the orders/customer joins — at
      // scale only the initial lineitem agg is fact-sized; AQE
      // broadcasts the filtered aggregate into both joins.
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(dsum(money(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 190)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          money(col("o_totalprice")).cast("double").as("totalprice"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    },

    "q19_disjunctive" -> { (s, d) =>
      // TPC-H Q19 shape: an OR-of-ANDs predicate spanning both join
      // sides. Each disjunct's per-side implication is stated
      // explicitly (brand IN-list on part, quantity envelope on
      // lineitem) because an optimizer cannot derive single-side
      // prefilters from an OR that references both tables — with
      // them, each scan prunes BEFORE the join (PushedFilters carries
      // the IN-list and the quantity range).
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 45))
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 45))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(dsum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    "q20_supplier_share" -> { (s, d) =>
      // TPC-H Q20 shape: nested-aggregate semi-join chain — suppliers
      // who shipped >80 % of some part's 1995 volume. The part-level
      // total re-aggregates the (supplier, part) frame instead of
      // re-scanning lineitem, and the winner set semi-joins into the
      // supplier dim. The pair frame is persisted because it feeds
      // BOTH the share join and the part-total agg: Spark plans a
      // self-referencing frame as two full subtrees and (measured)
      // ReuseExchange does NOT collapse them at runtime — unpersisted,
      // lineitem scans twice; persisted, once (pinned in
      // PlanAuditSpec). Quantities are integral-valued, so double
      // sums are exact in any accumulation order (< 2^53) and the
      // 0.8 share compare sees identical IEEE operands in both
      // engines.
      val sp = q20PairCache.getOrElseUpdate((s, d))(
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(col("l_quantity")).as("q"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val pt = sp.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("q")).as("tq"))
      val dominant = sp.join(pt, col("l_partkey") === col("pk"))
        .filter(col("q") > lit(0.8) * col("tq"))
        .select("l_suppkey")
      Tables.supplier(s, d)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },

    "q21_deciles" -> { (s, d) =>
      // ntile decile stats per order status: ntile is deterministic
      // once the window order is total — (totalprice, orderkey)
      // breaks all ties identically in both engines.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("decile", ntile(10).over(w))
        .groupBy("o_orderstatus", "decile")
        .agg(count(lit(1)).as("n_orders"),
          min(money(col("o_totalprice"))).cast("double").as("min_price"),
          max(money(col("o_totalprice"))).cast("double").as("max_price"))
        .orderBy("o_orderstatus", "decile")
    },

    "q22_idle_rich" -> { (s, d) =>
      // TPC-H Q22 shape: scalar-subquery threshold + anti join. The
      // positive-balance mean is ONE row broadcast into the filter
      // (computed as exact-decimal sum → double, / bigint count, so
      // both engines IEEE-divide identical operands); customers above
      // it with no URGENT order roll up per nation.
      val cust = Tables.customer(s, d)
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg((dsum(money(col("c_acctbal"))) / count(lit(1))).as("thr"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      cust.crossJoin(broadcast(thr))
        .filter(money(col("c_acctbal")).cast("double") > col("thr"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_custs"),
          dsum(money(col("c_acctbal"))).as("total_bal"))
        .orderBy("c_nationkey")
    }
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_topk" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY o_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q5_join5" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem, orders, customer, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY n_name""",
    "q6_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q7_window" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, rk
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q7_topk_native" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, o_orderkey""",
    "q8_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         count(*) AS n_orders
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
           AS BIGINT) AS gid,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY gid, o_orderstatus, o_orderpriority""",
    // timestamp→long in Spark is epoch seconds; epoch_ns//1e9
    // replays it exactly as BIGINT (DuckDB's epoch() is a double)
    "q12_rolling" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY epoch_ns(o_orderdate) // 1000000000
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS spend_30d,
         count(*) OVER (
           PARTITION BY o_custkey ORDER BY epoch_ns(o_orderdate) // 1000000000
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q13_pivot" ->
      """SELECT o_orderstatus,
         count(*) FILTER (o_orderpriority = '1-URGENT') AS p1_urgent,
         count(*) FILTER (o_orderpriority = '2-HIGH') AS p2_high,
         count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3_medium,
         count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_none,
         count(*) FILTER (o_orderpriority = '5-LOW') AS p5_low
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q10_percentiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
         count(DISTINCT o_custkey) AS n_custs
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q15_correlated" ->
      """WITH revenue AS (
           SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier, revenue
         WHERE s_suppkey = l_suppkey
           AND total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",
    "q9_exists" ->
      """SELECT c_custkey, c_name,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem, part
         WHERE p_partkey = l_partkey
           AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 1000)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS avg_yearly,
         count(*) AS n_items
         FROM lineitem l, part
         WHERE p_partkey = l.l_partkey AND p_brand = 'Brand#3'
           AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)""",
    "q18_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
         total_qty
         FROM orders, customer,
           (SELECT l_orderkey,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 190) t
         WHERE o_orderkey = l_orderkey AND o_custkey = c_custkey
         ORDER BY total_qty DESC, o_orderkey LIMIT 100""",
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue,
         count(*) AS n_items
         FROM lineitem, part
         WHERE p_partkey = l_partkey
           AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
           AND l_quantity BETWEEN 1 AND 45
           AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 21)
             OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                 AND l_quantity BETWEEN 10 AND 30)
             OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                 AND l_quantity BETWEEN 20 AND 45))""",
    "q20_supplier_share" ->
      """WITH sp AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
                     FROM lineitem
                     WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                       AND l_shipdate < TIMESTAMP '1996-01-01'
                     GROUP BY l_suppkey, l_partkey),
         p AS (SELECT l_partkey AS pk, sum(q) AS tq FROM sp GROUP BY pk)
         SELECT s_suppkey, s_name, n_name
         FROM supplier, nation
         WHERE s_nationkey = n_nationkey
           AND s_suppkey IN (SELECT l_suppkey FROM sp, p
                             WHERE sp.l_partkey = p.pk AND sp.q > 0.8 * p.tq)
         ORDER BY s_suppkey""",
    "q21_deciles" ->
      """SELECT o_orderstatus, decile, count(*) AS n_orders,
         CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS min_price,
         CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS max_price
         FROM (SELECT o_orderstatus, o_totalprice,
                 ntile(10) OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice, o_orderkey) AS decile
               FROM orders)
         GROUP BY o_orderstatus, decile
         ORDER BY o_orderstatus, decile""",
    "q22_idle_rich" ->
      """SELECT c_nationkey, count(*) AS n_custs,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer
         WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) >
           (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey ORDER BY c_nationkey"""
  )
}
