package graft.queries

import graft.Tables
import graft.operators.ShardedWindow
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator coverage (SURVEY.md §2 C-block) on the
  * TPC-H-ish tables. Each query is declarative DataFrame code — Catalyst
  * handles pushdown/pruning/join selection; dims are broadcast-size so
  * the planner picks broadcast hash joins (verified in BenchSpec plans).
  *
  * Numeric discipline (see SURVEY.md §5): money inputs are exact
  * two-decimal doubles, so both engines cast them to DECIMAL(12,2)
  * before any arithmetic; products stay ≤ DECIMAL(38,6) — never lossy —
  * and sums are associative-exact. Averages convert the exact decimal
  * sum to double and ROUND(..,6).
  *
  * Output-type discipline: every emitted column is string, BIGINT, or
  * DOUBLE on BOTH engines. Decimal stays internal to the aggregation:
  * the exact decimal sum is cast to double only as the final step
  * (exact-input float division/conversion is correctly rounded on both
  * engines, so the float64 bits agree). Dates are emitted as
  * 'yyyy-MM-dd' strings. DuckDB SUM over ints widens to HUGEINT, so
  * the oracle casts those back to BIGINT. This keeps the driver-side
  * pandas representations byte-identical (Decimal vs float64 and
  * date vs datetime64 mismatches are what failed 9 round-1 hashes).
  */
object RelationalQueries {

  private def dec(name: String): Column = col(name).cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(12, 2))
  private def asDec2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")
  private def asDec4(c: Column): Column = c.cast(DecimalType(38, 4)).cast("double")
  private val discPrice: Column = dec("l_extendedprice") * (one - dec("l_discount"))

  private val decSql = "DECIMAL(12,2)"
  private def d(c: String) = s"CAST($c AS $decSql)"
  private val discPriceSql = s"${d("l_extendedprice")} * (CAST(1 AS $decSql) - ${d("l_discount")})"

  val defs: Map[String, QueryDef] = Map(
    // C3: hash aggregate with partial (map-side) aggregation
    "q1_agg" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            asDec2(sum(dec("l_quantity"))).as("sum_qty"),
            asDec2(sum(dec("l_extendedprice"))).as("sum_base_price"),
            asDec4(sum(discPrice)).as("sum_disc_price"),
            round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
         |  CAST(CAST(SUM(${d("l_extendedprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(SUM($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
         |  ROUND(CAST(SUM(${d("l_quantity")}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // C4: broadcast dim join + agg + deterministic top-k
    "q3_join" -> QueryDef.sql(
      (s, dir) =>
        Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp") &&
            col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("o_orderpriority"))
          .agg(asDec4(sum(discPrice)).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
         |  CAST(CAST(SUM($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin),

    // C5: multi-way join through region/nation dims
    "q5_multijoin" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy("n_name")
          .agg(asDec4(sum(discPrice)).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name")),
      s"""SELECT n_name, CAST(CAST(SUM($discPriceSql) AS DECIMAL(38,4)) AS DOUBLE) AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin),

    // C2: selective filter fully pushed to the scan
    "q6_filter" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
          .agg(asDec4(sum(dec("l_extendedprice") * dec("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items")),
      s"""SELECT CAST(CAST(SUM(${d("l_extendedprice")} * ${d("l_discount")}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin),

    // C6: fact-to-fact join (shuffle join at scale; AQE decides locally)
    "q_factjoin" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir).filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct("o_orderkey").as("n_orders"),
            asDec2(sum(dec("l_quantity"))).as("total_qty"))
          .orderBy("o_orderpriority"),
      s"""SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
         |  CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // C7: semi join (EXISTS)
    "q_semijoin" -> QueryDef.sql(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_totalprice") > 100000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // Bloom-prefiltered exact semi join (operators/BloomJoin): lineitem
    // rows belonging to urgent high-value orders. The build side
    // collapses to a bloom filter probed inside the lineitem scan
    // (codegen'd BloomMightContain), so at scale only the surviving
    // fraction reaches the exact verify join — the explicit, tunable
    // form of Catalyst's InjectRuntimeFilter. Oracle is the plain IN
    // subquery: bloom false positives die in the verify join, false
    // negatives are impossible, so results are exactly the semi join.
    "q_bloom_semijoin" -> QueryDef.sql(
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
          .select("o_orderkey")
        // expectedItems auto-sized from the build side — a hardcoded
        // capacity saturates silently at bigger scale factors
        graft.operators.BloomJoin.semiJoin(
          Tables.lineitem(s, dir), urgent, "l_orderkey", "o_orderkey", fpp = 0.01)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_items"), asDec2(sum(dec("l_quantity"))).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      s"""SELECT l_returnflag, COUNT(*) AS n_items,
         |  CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |                     WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Interval-overlap join (RangeJoin.intervalOverlap): same-customer
    // orders whose 7-day fulfillment windows overlap. Both sides bin
    // into week buckets; a pair matches ONLY in the bucket holding the
    // intersection's left edge, so the output is duplicate-free with no
    // distinct — one equi-join shuffle, never the nested-loop plan the
    // raw overlap predicate would get. RangeJoinSpec proves pair-set
    // equality with the theta join.
    "q_interval_join" -> QueryDef.sql(
      (s, dir) => {
        val weekUs = 7L * 86400000000L
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("w_start"))
          .withColumn("w_end", col("w_start") + weekUs)
        val a = o.select(col("o_custkey"), col("o_orderkey").as("o1"),
          col("w_start").as("s1"), col("w_end").as("e1"))
        val b = o.select(col("o_custkey"), col("o_orderkey").as("o2"),
          col("w_start").as("s2"), col("w_end").as("e2"))
        graft.operators.RangeJoin.intervalOverlap(
          a, b, "s1", "e1", "s2", "e2", keys = Seq("o_custkey"), width = weekUs)
          .filter(col("o1") < col("o2"))
          .select(col("o_custkey"), col("o1"), col("o2"),
            (least(col("e1"), col("e2")) - greatest(col("s1"), col("s2"))).as("overlap_us"))
          .orderBy("o_custkey", "o1", "o2")
      },
      """WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS w_start,
        |             epoch_us(o_orderdate) + 604800000000 AS w_end
        |           FROM orders)
        |SELECT a.o_custkey AS o_custkey, a.o_orderkey AS o1, b.o_orderkey AS o2,
        |       LEAST(a.w_end, b.w_end) - GREATEST(a.w_start, b.w_start) AS overlap_us
        |FROM o a JOIN o b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND a.w_start < b.w_end AND b.w_start < a.w_end
        |ORDER BY o_custkey, o1, o2""".stripMargin),

    // C8: anti join (NOT EXISTS)
    "q_antijoin" -> QueryDef.sql(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
          .agg(count(lit(1)).as("n_inactive"))
          .orderBy("c_nationkey"),
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // C9: global top-k (TakeOrderedAndProject — no full sort at scale)
    "q_topk" -> QueryDef.sql(
      (s, dir) =>
        Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .limit(20),
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 20""".stripMargin),

    // C10: distinct
    "q_distinct" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir).select("o_orderstatus", "o_orderpriority").distinct()
          .orderBy("o_orderstatus", "o_orderpriority"),
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // C11: window rank per group
    "q_window" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_custkey"), col("c_acctbal"),
            row_number().over(w).cast("long").as("rnk"))
          .filter(col("rnk") <= 3)
          .orderBy("c_nationkey", "rnk")
      },
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_nationkey, rnk""".stripMargin),

    // C11: window lag — inter-order gaps per customer
    "q_window_lag" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir).filter(col("o_custkey") < 20)
          .select(col("o_custkey"), col("o_orderkey"),
            ((unix_micros(col("o_orderdate").cast("timestamp_ltz")) -
              unix_micros(lag("o_orderdate", 1).over(w).cast("timestamp_ltz"))) / 1000000L)
              .cast("long").as("gap_s"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST((epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER (
        |     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) / 1000000 AS BIGINT) AS gap_s
        |FROM orders WHERE o_custkey < 20
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // C11: window frame — per-customer running order total (rows
    // unbounded-preceding frame), decimal-exact then double
    "q_window_runsum" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir).filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(dec("o_totalprice")).over(w).cast(DecimalType(38, 2)).cast("double")
              .as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(CAST(SUM(${d("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE)
         |    AS running_total
         |FROM orders WHERE o_custkey < 50
         |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // C12: union distinct of two dim-derived sets
    "q_union" -> QueryDef.sql(
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val fromCust = n.join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"), "left_semi")
        val fromSupp = n.join(Tables.supplier(s, dir), col("n_nationkey") === col("s_nationkey"), "left_semi")
        fromCust.select("n_nationkey", "n_name").union(fromSupp.select("n_nationkey", "n_name"))
          .distinct()
          .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
          .orderBy("n_nationkey")
      },
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        |WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
        |UNION
        |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        |WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
        |ORDER BY n_nationkey""".stripMargin),

    // C12b: EXCEPT — customers newly active in 1998 (ordered in 1998,
    // never before 1995): two fact projections set-differenced on the
    // key, ~1.5k rows at sf0.01
    "q_except" -> QueryDef.sql(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select("o_custkey").distinct()
          .except(
            o.filter(col("o_orderdate") < lit("1995-01-01").cast("timestamp"))
              .select("o_custkey").distinct())
          .orderBy("o_custkey")
      },
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
        |ORDER BY o_custkey""".stripMargin),

    // C12c: INTERSECT — customers active in both 1995 and 1998
    "q_intersect" -> QueryDef.sql(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select("o_custkey").distinct()
          .intersect(
            o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
              .select("o_custkey").distinct())
          .orderBy("o_custkey")
      },
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |ORDER BY o_custkey""".stripMargin),

    // C48: correlated LATERAL join — top-2 orders PER customer, the
    // per-row dependent subquery a plain join can't express (and a
    // window-over-everything materializes globally). Spark
    // decorrelates the LIMIT'd lateral into a partitioned rank —
    // exactly the distributed plan you'd hand-write — so SQL-surface
    // users get the operator without knowing the rewrite.
    "q_lateral" -> QueryDef.sql(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey, o.price
          FROM (SELECT c_custkey FROM customer_v WHERE c_custkey <= 100) c,
          LATERAL (SELECT o_orderkey, o_totalprice AS price
                   FROM orders_v WHERE o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          ORDER BY c.c_custkey, o.o_orderkey""")
      },
      """SELECT c.c_custkey, o.o_orderkey, o.price
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 100) c,
        |LATERAL (SELECT o_orderkey, o_totalprice AS price
        |         FROM orders WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin),

    // C31: FULL OUTER join — unmatched rows survive from BOTH sides
    // (segment customers with no urgent orders; urgent-order customers
    // outside the segment), null-extended and flagged. Shuffle join on
    // custkey; AQE handles any skew — full-outer can't broadcast.
    "q_fullouter" -> QueryDef.sql(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
        cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "full_outer")
          .select(
            coalesce(cust("c_custkey"), urgent("o_custkey")).as("custkey"),
            cust("c_custkey").isNotNull.cast("long").as("in_segment"),
            coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
          .orderBy("custkey")
      },
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  CAST(c.c_custkey IS NOT NULL AS BIGINT) AS in_segment,
        |  CAST(COALESCE(o.n_urgent, 0) AS BIGINT) AS n_urgent
        |FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
        |                 WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin),

    // C32: deterministic grouped string aggregation (LISTAGG) — per
    // region, the alphabetical comma-joined nation list. Sorted INSIDE
    // the group on both engines, so the strings are reproducible under
    // any partitioning (an unsorted collect_list would hash-diverge).
    "q_stringagg" -> QueryDef.sql(
      (s, dir) =>
        Tables.nation(s, dir)
          .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
            count(lit(1)).as("n"))
          .orderBy("r_name"),
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // C33: arg-max per group (MAX_BY) — richest customer per nation.
    // The ordering key is a STRUCT (acctbal, name) so ties break
    // deterministically; a bare max_by(name, acctbal) picks an
    // arbitrary winner under equal balances and can't be oracled. The
    // oracle spells the same selection as a ranked window since
    // DuckDB's arg_max-by-struct support isn't guaranteed.
    "q_maxby" -> QueryDef.sql(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            max_by(col("c_name"), struct(col("c_acctbal"), col("c_name"))).as("top_customer"),
            max(col("c_acctbal")).as("best_bal"))
          .orderBy("n_name"),
      """WITH r AS (
        |  SELECT n_name, c_name, c_acctbal,
        |    row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_name DESC) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, c_name AS top_customer, c_acctbal AS best_bal
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin),

    // C34: ordinal explode (POSEXPLODE) — the position-aware lateral
    // that plain explode loses; DuckDB spells it as a lateral UNNEST
    // over range(1, len+1) subscripting the list. Row-local expansion,
    // no shuffle before the final sort.
    "q_posexplode" -> QueryDef.sql(
      (s, dir) =>
        Tables.part(s, dir)
          .filter(col("p_partkey") <= 200)
          .select(col("p_partkey"), posexplode(split(col("p_type"), " ")))
          .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("col").as("word"))
          .orderBy("p_partkey", "pos"),
      """WITH t AS (SELECT p_partkey, string_split(p_type, ' ') AS l
        |           FROM part WHERE p_partkey <= 200)
        |SELECT p_partkey, CAST(x.i AS BIGINT) - 1 AS pos, l[x.i] AS word
        |FROM t, UNNEST(range(1, len(l) + 1)) AS x(i)
        |ORDER BY p_partkey, pos""".stripMargin),

    // C35: RANGE-frame window over event time — per priority class,
    // orders in the trailing 7 days. Epoch seconds derived by integer
    // floor-division of micros on BOTH engines (DuckDB's double→int
    // CAST rounds; Spark's truncates — floor-div sidesteps both). Tie
    // rows are frame PEERS under RANGE, so the count is
    // order-independent and deterministic.
    "q_window_range" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the
            // TIMESTAMP cast an identity relabeling
            expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("od_s"))
          .withColumn("n_7d", count(lit(1)).over(
            Window.partitionBy("o_orderpriority").orderBy(col("od_s"))
              .rangeBetween(-7L * 86400, 0)))
          .select(col("o_orderkey"), col("o_orderpriority"), col("n_7d")),
        // (no trailing global sort: every order row comes back out —
        // the gate compares row sets)
      """SELECT o_orderkey, o_orderpriority,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY epoch_us(o_orderdate) // 1000000
        |                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin),

    // C36: histogram binning — fixed-width value buckets. FLOOR first,
    // cast after: the division is one correctly-rounded IEEE op on
    // identical input bits, so both engines land every boundary value
    // in the same bucket.
    "q_histogram" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      """SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // C19b: UNPIVOT — wide per-row metric columns melted to (metric,
    // value) rows; the inverse of q_pivot, used to normalize wide
    // exports back into long form. Expand is row-local (no shuffle
    // beyond the final agg).
    "q_unpivot" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            dec("l_extendedprice").as("extendedprice"),
            dec("l_discount").as("discount"), dec("l_tax").as("tax"))
          .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("extendedprice"), col("discount"), col("tax")),
            "metric", "val")
          .groupBy("metric")
          .agg(count(lit(1)).as("n"), asDec2(sum(col("val"))).as("total"))
          .orderBy("metric"),
      s"""SELECT metric, COUNT(*) AS n,
         |  CAST(CAST(SUM(val) AS DECIMAL(38,2)) AS DOUBLE) AS total
         |FROM (
         |  UNPIVOT (SELECT l_orderkey, l_linenumber,
         |             ${d("l_extendedprice")} AS extendedprice,
         |             ${d("l_discount")} AS discount, ${d("l_tax")} AS tax
         |           FROM lineitem)
         |  ON extendedprice, discount, tax
         |  INTO NAME metric VALUE val)
         |GROUP BY metric ORDER BY metric""".stripMargin),

    // C15b: CUBE — all grouping-set combinations over two dims
    "q_cube" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), asDec2(sum(dec("o_totalprice"))).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  CAST(CAST(SUM(${d("o_totalprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // C15: rollup
    "q_rollup" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), asDec2(sum(dec("l_quantity"))).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // C15b: explicit GROUPING SETS (beyond rollup/cube): per-status,
    // per-priority, and grand-total rows in one aggregation pass, with
    // grouping() flags disambiguating a real NULL group from a
    // summary row. Spark expands the sets into one Expand + single
    // shuffle — same plan family as rollup.
    "q_grouping_sets" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_priority"),
            count(lit(1)).as("n"), asDec2(sum(dec("o_totalprice"))).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
         |  COUNT(*) AS n,
         |  CAST(CAST(SUM(${d("o_totalprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // Salted hot-key join (operators/SkewOps.saltedJoin): the join-side
    // twin of q_salted_agg — big side salted, small side replicated per
    // salt, equi-join on (key, salt) so a hot key spreads over `salts`
    // reducers. Results are exactly the plain inner join, which is the
    // oracle; the skew spread itself is asserted in SkewOpsSpec.
    "q_salted_join" -> QueryDef.sql(
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderstatus")
        graft.operators.SkewOps.saltedJoin(
          Tables.lineitem(s, dir), urgent, "l_orderkey", "o_orderkey", salts = 8)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_items"), asDec2(sum(dec("l_quantity"))).as("sum_qty"))
          .orderBy("o_orderstatus")
      },
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // C16: aggregate filter (HAVING)
    "q_having" -> QueryDef.sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_partkey").agg(count(lit(1)).as("n_items"))
          .filter(col("n_items") > 40)
          .orderBy("l_partkey"),
      """SELECT l_partkey, COUNT(*) AS n_items FROM lineitem
        |GROUP BY l_partkey HAVING COUNT(*) > 40 ORDER BY l_partkey""".stripMargin),

    // C17: conditional aggregation
    "q_caseagg" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_high"),
            sum(when(col("o_totalprice") <= 200000, 1L).otherwise(0L)).as("n_low"),
            asDec2(sum(when(col("o_orderstatus") === "F", dec("o_totalprice"))
              .otherwise(lit(0).cast(DecimalType(12, 2))))).as("f_total"))
          .orderBy("o_orderpriority"),
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         |  CAST(SUM(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${d("o_totalprice")}
         |           ELSE CAST(0 AS $decSql) END) AS DECIMAL(38,2)) AS DOUBLE) AS f_total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // C19: pivot — per-priority order counts spread across status columns
    "q_pivot" -> QueryDef.sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // C16b: correlated scalar subquery — parts priced above their
    // brand's average (decorrelates to an agg + broadcast join back)
    "q_correlated" -> QueryDef.sql(
      (s, dir) => {
        val p = Tables.part(s, dir)
        val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
          .agg(round(sum(dec("p_retailprice")).cast("double") / count(lit(1)), 6).as("brand_avg"))
        p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
          .filter(col("p_retailprice") > col("brand_avg"))
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
          .orderBy("p_partkey")
      },
      s"""SELECT p_partkey, p_brand, p_retailprice
         |FROM part p
         |WHERE p_retailprice > (SELECT ROUND(CAST(SUM(${d("p_retailprice")}) AS DOUBLE) / COUNT(*), 6)
         |                       FROM part p2 WHERE p2.p_brand = p.p_brand)
         |ORDER BY p_partkey""".stripMargin),

    // C13: explode / unnest with positions
    "q_explode" -> QueryDef.sql(
      (s, dir) =>
        Tables.embeddings(s, dir).filter(col("vec_id") < 20)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            col("val").cast("double").as("val"))
          .orderBy("vec_id", "pos"),
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY vec_id, pos""".stripMargin),

    // C39: statistical aggregates — stddev, correlation, regression
    // slope. Engine-native CORR/STDDEV accumulate doubles in partition
    // order, so their low bits are not reproducible across engines (or
    // even runs); instead both sides compute the five exact power sums
    // (map-side combinable, one shuffle — the same shape a native
    // partial aggregate uses) and evaluate the identical closed-form
    // IEEE expression tree on them.
    //
    // Exactness at LONG speed, not DECIMAL speed: the r8 sf10 pack
    // measured the DECIMAL(38) sum path at 141 s (a top-3 pole —
    // decimal aggregation is object math in every partial). The 2-dp
    // money values are exact cent-integer longs; per-row products fit
    // a long (price² ≤ 1e14 cents²), and each product sum runs as TWO
    // long sums over its (div 2^32, mod 2^32) legs — overflow-safe to
    // ~2e9 rows per group (beyond that, add a third leg) — recombined
    // exactly in DECIMAL on the handful of group rows, where decimal
    // cost is irrelevant. Same exact values, same final doubles.
    "q_stats_agg" -> QueryDef.sql(
      (s, dir) => {
        val M = 4294967296L // 2^32
        val rows = Tables.lineitem(s, dir).select(col("l_returnflag"),
          round(col("l_quantity") * 100, 0).cast("long").as("qc"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
          .select(col("l_returnflag"), col("qc"), col("pc"),
            (col("qc") * col("qc")).as("xqq"),
            (col("pc") * col("pc")).as("xpp"),
            (col("qc") * col("pc")).as("xqp"))
        val sums = rows.groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum("qc").as("sx_c"), sum("pc").as("sy_c"),
            sum(col("xqq") % M).as("sxx_lo"), sum(expr(s"xqq div $M")).as("sxx_hi"),
            sum(col("xpp") % M).as("syy_lo"), sum(expr(s"xpp div $M")).as("syy_hi"),
            sum(col("xqp") % M).as("sxy_lo"), sum(expr(s"xqp div $M")).as("sxy_hi"))
        // exact recombination on #group rows: hi·2^32 + lo in DECIMAL,
        // then undo the cent scaling through the same DECIMAL(38,2/4)
        // casts the direct decimal-sum formulation used, so the final
        // doubles are bit-identical to that (oracle-matched) form
        def comb(hi: String, lo: String): Column =
          (col(hi).cast(DecimalType(38, 0)) * lit(M) + col(lo))
            .cast(DecimalType(38, 0))
        val base = sums.select(
          col("l_returnflag"), col("n"),
          (col("sx_c").cast(DecimalType(38, 0)) / lit(100))
            .cast(DecimalType(38, 2)).as("sx"),
          (col("sy_c").cast(DecimalType(38, 0)) / lit(100))
            .cast(DecimalType(38, 2)).as("sy"),
          (comb("sxx_hi", "sxx_lo") / lit(10000)).cast(DecimalType(38, 4)).as("sxx"),
          (comb("syy_hi", "syy_lo") / lit(10000)).cast(DecimalType(38, 4)).as("syy"),
          (comb("sxy_hi", "sxy_lo") / lit(10000)).cast(DecimalType(38, 4)).as("sxy"))
        val n = col("n").cast("double")
        val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
          col("sy").cast("double"), col("sxx").cast("double"),
          col("syy").cast("double"), col("sxy").cast("double"))
        base.select(
          col("l_returnflag"), col("n"),
          round(sqrt((sxx - sx * sx / n) / (n - lit(1.0))), 6).as("sd_qty"),
          round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
            .as("corr_qty_price"),
          round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).as("slope_price_qty"))
          .orderBy("l_returnflag")
      },
      s"""WITH sums AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    CAST(CAST(SUM(${d("l_quantity")}) AS DECIMAL(38,2)) AS DOUBLE) AS sx,
         |    CAST(CAST(SUM(${d("l_extendedprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS sy,
         |    CAST(CAST(SUM(${d("l_quantity")} * ${d("l_quantity")}) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
         |    CAST(CAST(SUM(${d("l_extendedprice")} * ${d("l_extendedprice")}) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
         |    CAST(CAST(SUM(${d("l_quantity")} * ${d("l_extendedprice")}) AS DECIMAL(38,4)) AS DOUBLE) AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  ROUND(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 6) AS sd_qty,
         |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
         |        sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
         |    AS corr_qty_price,
         |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
         |    AS slope_price_qty
         |FROM sums ORDER BY l_returnflag""".stripMargin),

    // C40: distribution ranks — ntile quartiles, percent_rank,
    // cume_dist over per-customer spend. Spend is an exact decimal sum
    // (identical doubles on both engines) so the shared (spend desc,
    // custkey) order — and therefore every rank — is deterministic.
    // The unpartitioned Window.orderBy would sort the WHOLE customer
    // set in one task; the order is total (custkey unique), so all
    // three ranks derive from a ShardedWindow global row number
    // (sub-sharded on a spend band, exclusive offsets broadcast) plus
    // the broadcast total count: rank == rn, percent_rank = (rn-1)/
    // (n-1), cume_dist = rn/n, and ntile(4) is its closed form (the
    // first n mod 4 buckets take one extra row).
    "q_ntile" -> QueryDef.sql(
      (s, dir) => {
        val spend = Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(asDec2(sum(dec("o_totalprice"))).as("spend"),
            count(lit(1)).as("n_orders"))
        val ranked = ShardedWindow.rowNumber(
          spend,
          keys = Seq.empty,
          shard = -floor(col("spend") / 10000),
          order = Seq(col("spend").desc, col("o_custkey")),
          out = "rn")
        val total = spend.agg(count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(total))
          .withColumn("q4", expr("n div 4")) // exact long division throughout —
          .withColumn("r4", col("n") % 4)    // `/` on longs would go double
          .withColumn("big", (col("q4") + 1) * col("r4"))
          .select(
            col("o_custkey"), col("spend"), col("n_orders"),
            when(col("rn") <= col("big"), expr("(rn - 1) div (q4 + 1) + 1"))
              .otherwise(expr("r4 + (rn - big - 1) div q4 + 1"))
              .cast("long").as("quartile"),
            round((col("rn") - 1).cast("double") / (col("n") - 1).cast("double"), 6)
              .as("pr"),
            round(col("rn").cast("double") / col("n").cast("double"), 6).as("cd"))
          .orderBy("o_custkey")
      },
      s"""WITH spend AS (
         |  SELECT o_custkey,
         |    CAST(CAST(SUM(${d("o_totalprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS spend,
         |    COUNT(*) AS n_orders
         |  FROM orders GROUP BY o_custkey)
         |SELECT o_custkey, spend, n_orders,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |  ROUND(percent_rank() OVER w, 6) AS pr,
         |  ROUND(cume_dist() OVER w, 6) AS cd
         |FROM spend
         |WINDOW w AS (ORDER BY spend DESC, o_custkey)
         |ORDER BY o_custkey""".stripMargin),

    // C41: first/last/nth window values — each customer's first,
    // latest, and second order over an explicit unbounded ROWS frame
    // (last_value defaults to CURRENT ROW otherwise, a classic trap;
    // pinned identically on both engines).
    "q_first_last" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wn = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir).select(
          col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"),
          row_number().over(wn).as("rn"))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("o_custkey")
      },
      """SELECT o_custkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin),

    // C42: null-aware NOT IN — customers with no urgent order, where a
    // negative account balance nulls the probe key and SQL's NOT IN
    // three-valued logic must silently drop the row (a plain anti join
    // would keep it). Spark plans this as NullAwareAntiJoin; expressed
    // through SQL because the DataFrame API has no NOT IN form.
    "q_notin_null" -> QueryDef.sql(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("q_notin_customer")
        Tables.orders(s, dir).createOrReplaceTempView("q_notin_orders")
        s.sql("""
          |SELECT c_custkey, c_name
          |FROM (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k,
          |             c_custkey, c_name
          |      FROM q_notin_customer)
          |WHERE k NOT IN (SELECT o_custkey FROM q_notin_orders
          |                WHERE o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
      },
      """SELECT c_custkey, c_name
        |FROM (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k,
        |             c_custkey, c_name
        |      FROM customer)
        |WHERE k NOT IN (SELECT o_custkey FROM orders
        |                WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // C43: multi-distinct aggregation — three COUNT(DISTINCT)s with
    // different keys in one pass (Catalyst plans the Expand +
    // double-agg rewrite; one logical scan, no self-joins).
    "q_multi_distinct" -> QueryDef.sql(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("d_part"),
          countDistinct(col("l_suppkey")).as("d_supp"),
          countDistinct(when(col("l_discount") > 0.05, col("l_partkey"))).as("d_part_hidisc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_part,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_supp,
        |  CAST(COUNT(DISTINCT CASE WHEN l_discount > 0.05 THEN l_partkey END) AS BIGINT) AS d_part_hidisc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // C44: calendar rollup — month / quarter extraction feeding a
    // two-level time hierarchy (the report-dashboard scan shape; both
    // date parts computed once in the scan projection)
    "q_datetrunc" -> QueryDef.sql(
      (s, dir) => Tables.orders(s, dir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          quarter(col("o_orderdate")).cast("long").as("qtr"), dec("o_totalprice").as("p"))
        .groupBy("month", "qtr")
        .agg(count(lit(1)).as("n_orders"), asDec2(sum(col("p"))).as("revenue"))
        .orderBy("month"),
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         |  COUNT(*) AS n_orders,
         |  CAST(CAST(SUM(${d("o_totalprice")}) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
         |FROM orders GROUP BY month, qtr ORDER BY month""".stripMargin),

    // C45: string function family — edit distance, padding, translate,
    // split indexing — aggregated so the compare covers every row
    "q_string_fns" -> QueryDef.sql(
      (s, dir) => Tables.part(s, dir)
        .select(col("p_brand"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev"),
          length(translate(col("p_type"), "aeiou", "")).cast("long").as("consonants"),
          length(lpad(col("p_brand"), 12, "#")).cast("long").as("padded_len"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum("lev").as("sum_lev"), min("lev").as("min_lev"), max("lev").as("max_lev"),
          sum("consonants").as("sum_consonants"), max("padded_len").as("padded_len"))
        .orderBy("p_brand"),
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(levenshtein(p_name, p_type)) AS BIGINT) AS sum_lev,
        |  CAST(MIN(levenshtein(p_name, p_type)) AS BIGINT) AS min_lev,
        |  CAST(MAX(levenshtein(p_name, p_type)) AS BIGINT) AS max_lev,
        |  CAST(SUM(length(replace(replace(replace(replace(replace(p_type,
        |       'a',''),'e',''),'i',''),'o',''),'u',''))) AS BIGINT) AS sum_consonants,
        |  CAST(MAX(length(lpad(p_brand, 12, '#'))) AS BIGINT) AS padded_len
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // C46: bitwise / boolean aggregates — OR/AND-folded key masks and
    // any/every flags per nation (index-bitmap building blocks)
    "q_bitagg" -> QueryDef.sql(
      (s, dir) => Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(
          bit_or(col("c_custkey") % 256).as("or_mask"),
          bit_and(col("c_custkey") % 256).as("and_mask"),
          max(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("any_negative"),
          min(when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)).as("all_building"))
        .orderBy("c_nationkey"),
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(bit_or(c_custkey % 256) AS BIGINT) AS or_mask,
        |  CAST(bit_and(c_custkey % 256) AS BIGINT) AS and_mask,
        |  CAST(MAX(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS any_negative,
        |  CAST(MIN(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS all_building
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // C47: exact percentiles — discrete p50/p95 (an actual data value,
    // so bit-identical across engines by construction) plus the
    // interpolated median (midpoint of two exact stored doubles — one
    // add, one divide, deterministic).
    //
    // NOT percentile_disc/median aggregates: those buffer a per-group
    // value->count map in ONE reducer per group (the r8 sf10 pack
    // measured 124 s, the pack's third pole) and at 100 TB a 3-group
    // percentile would hold a third of the corpus's distinct values in
    // one task. operators/ExactQuantiles computes the same numbers via
    // map-combined (flag, value) counts + sharded prefix sums + rank
    // selection in long arithmetic (and Spark Percentile's own double
    // formula for the interpolated median, so the hash can't drift).
    "q_percentiles" -> QueryDef.sql(
      (s, dir) => graft.operators.ExactQuantiles.percentiles(
          Tables.lineitem(s, dir),
          keys = Seq("l_returnflag"), value = col("l_extendedprice"),
          shardWidth = 512.0,
          pcts = Seq(
            graft.operators.ExactQuantiles.Disc("p50_disc", 1, 2),
            graft.operators.ExactQuantiles.Disc("p95_disc", 19, 20),
            graft.operators.ExactQuantiles.Cont("med", 1, 2)))
        .select("l_returnflag", "p50_disc", "p95_disc", "med")
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.5) AS p50_disc,
        |  quantile_disc(l_extendedprice, 0.95) AS p95_disc,
        |  median(l_extendedprice) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // C75: skyline / Pareto frontier — "cheapest part at every size
    // class it beats": minimize retail price, maximize size, exact
    // dominance semantics (both-dim ties survive). Two-phase
    // distributed skyline (SkylineOps): per-partition sorted sweeps
    // shrink the frontier before one single-task final sweep — the
    // O(n²) dominance join never runs. The oracle is the dominance
    // definition itself (NOT EXISTS), so the hash proves the sweep
    // algebra implements it exactly.
    "q_skyline" -> QueryDef.sql(
      (s, dir) => graft.operators.SkylineOps.skyline2d(
          Tables.part(s, dir), "p_partkey", "p_retailprice", "p_size")
        .select(col("key").as("p_partkey"), col("vmin").as("price"),
          col("vmax").as("size"))
        .orderBy("p_partkey"),
      """SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
        |       CAST(p_size AS BIGINT) AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin),

    // C73: MERGE INTO semantics — the full three-clause upsert
    // (WHEN MATCHED AND cond THEN DELETE / WHEN MATCHED THEN UPDATE /
    // WHEN NOT MATCHED THEN INSERT) as ONE full-outer join over the
    // key, with every clause a row-local CASE: the Delta/Iceberg
    // merge shape on plain Spark. Source = a derived change set
    // (every 5th customer re-priced, every 13th tombstoned, 100
    // fresh ids appended), so the result is a pure function of the
    // input. At scale this is one key-partitioned shuffle of each
    // side — no driver involvement, no per-row lookups.
    "q_merge" -> QueryDef.sql(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_acctbal"))
        val maxId = cust.agg(max("c_custkey").as("mx"))
        val changes = cust
          .filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("k"),
            (col("c_acctbal") + 100).as("new_bal"),
            (col("c_custkey") % 13 === 0).as("tombstone"))
          .unionByName(maxId.select(
            explode(expr("sequence(1, 100)")).as("i"), col("mx"))
            .select((col("mx") + col("i")).as("k"),
              (col("i") * 10).cast(cust.schema("c_acctbal").dataType).as("new_bal"),
              lit(false).as("tombstone")))
        cust.join(changes, col("c_custkey") === col("k"), "full_outer")
          .withColumn("action",
            when(col("k").isNotNull && col("c_custkey").isNotNull && col("tombstone"), "delete")
              .when(col("k").isNotNull && col("c_custkey").isNotNull, "update")
              .when(col("c_custkey").isNull, "insert")
              .otherwise("keep"))
          .filter(col("action") =!= "delete")
          .select(coalesce(col("c_custkey"), col("k")).as("c_custkey"),
            when(col("action") === "keep", col("c_acctbal"))
              .otherwise(coalesce(col("new_bal"), col("c_acctbal")))
              .cast("double").as("bal"),
            col("action"))
          .orderBy("c_custkey")
      },
      """WITH mx AS (SELECT MAX(c_custkey) AS mx FROM customer),
        |changes AS (
        |  SELECT c_custkey AS k, c_acctbal + 100 AS new_bal,
        |         c_custkey % 13 = 0 AS tombstone
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT mx + t.i, t.i * 10, FALSE
        |  FROM mx CROSS JOIN generate_series(1, 100) t(i)),
        |m AS (SELECT c.c_custkey, c.c_acctbal, ch.k, ch.new_bal, ch.tombstone,
        |        CASE WHEN ch.k IS NOT NULL AND c.c_custkey IS NOT NULL AND ch.tombstone THEN 'delete'
        |             WHEN ch.k IS NOT NULL AND c.c_custkey IS NOT NULL THEN 'update'
        |             WHEN c.c_custkey IS NULL THEN 'insert'
        |             ELSE 'keep' END AS action
        |      FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.k)
        |SELECT COALESCE(c_custkey, k) AS c_custkey,
        |       CAST(CASE WHEN action = 'keep' THEN c_acctbal
        |                 ELSE COALESCE(new_bal, c_acctbal) END AS DOUBLE) AS bal,
        |       action
        |FROM m WHERE action <> 'delete'
        |ORDER BY c_custkey""".stripMargin),

    // C71: IQR-rule outlier screen per group — Tukey fences over the
    // exact quartiles (ExactQuantiles rides one count-relation
    // exchange), then one broadcast join back to the fact scan for
    // the conditional counts. Fence comparisons are SCALED to avoid
    // division entirely: x is an outlier iff 2x > 2·q3 + 3·(q3−q1)
    // (resp. below) — exact decimal multiplication on both engines,
    // no half-up/half-even divergence possible. Quantiles cast to
    // DOUBLE only at the output edge.
    "q_iqr_outliers" -> QueryDef.sql(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val qs = graft.operators.ExactQuantiles.percentiles(
            li, keys = Seq("l_returnflag"), value = col("l_extendedprice"),
            shardWidth = 512.0,
            pcts = Seq(
              graft.operators.ExactQuantiles.Disc("q1", 1, 4),
              graft.operators.ExactQuantiles.Disc("q3", 3, 4)))
          .select(col("l_returnflag").as("g"), col("q1"), col("q3"))
        li.join(broadcast(qs), col("l_returnflag") === col("g"))
          .groupBy("l_returnflag")
          .agg(
            first("q1").as("q1v"), first("q3").as("q3v"),
            sum(when(col("l_extendedprice") * 2 >
              col("q3") * 2 + (col("q3") - col("q1")) * 3, 1L).otherwise(0L))
              .as("n_hi_outliers"),
            sum(when(col("l_extendedprice") * 2 <
              col("q1") * 2 - (col("q3") - col("q1")) * 3, 1L).otherwise(0L))
              .as("n_lo_outliers"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"),
            col("q1v").cast("double").as("q1"),
            col("q3v").cast("double").as("q3"),
            col("n_hi_outliers"), col("n_lo_outliers"), col("n_rows"))
          .orderBy("l_returnflag")
      },
      """WITH q AS (SELECT l_returnflag AS g,
        |             quantile_disc(l_extendedprice, 0.25) AS q1,
        |             quantile_disc(l_extendedprice, 0.75) AS q3
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(q1 AS DOUBLE) AS q1, CAST(q3 AS DOUBLE) AS q3,
        |  CAST(SUM(CASE WHEN l_extendedprice * 2 > q3 * 2 + (q3 - q1) * 3
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_outliers,
        |  CAST(SUM(CASE WHEN l_extendedprice * 2 < q1 * 2 - (q3 - q1) * 3
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_outliers,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN q ON l_returnflag = g
        |GROUP BY l_returnflag, q1, q3
        |ORDER BY l_returnflag""".stripMargin),

    // C49b: regexp extraction — pull the numeric id out of the entity
    // name and prove it round-trips to the key (Java and DuckDB regex
    // agree on these simple patterns, same as the langid lexicons)
    "q_regexp" -> QueryDef.sql(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_mktsegment"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long").as("extracted"),
          col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(when(col("extracted") === col("c_custkey"), 1L).otherwise(0L))
            .as("n_roundtrip"),
          sum("extracted").as("sum_extracted"))
        .orderBy("c_mktsegment"),
      // TRY_CAST, not CAST: on a non-matching name DuckDB's
      // regexp_extract returns '' and CAST('' AS BIGINT) ERRORS, while
      // Spark's .cast("long") yields null — TRY_CAST mirrors the
      // null-on-failure semantics so a data round without the
      // every-name-matches invariant mismatches instead of breaking
      // the verify run.
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN TRY_CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) = c_custkey
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
        |  CAST(SUM(TRY_CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_extracted
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // C49c: date arithmetic — ship delay in whole days (datediff is
    // exact int math; the mean divides two exact ints)
    "q_ship_delay" -> QueryDef.sql(
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("delay_days"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          min("delay_days").as("min_delay"), max("delay_days").as("max_delay"),
          round(sum("delay_days").cast("double") / count(lit(1)), 6).as("avg_delay"))
        .orderBy("o_orderpriority"),
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(MIN(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_delay,
        |  CAST(MAX(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_delay,
        |  ROUND(CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_delay
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // C54: WEIGHTED percentiles — price median/p95 weighted by units
    // sold, i.e. the per-unit price distribution without expanding each
    // line into `quantity` rows. No Spark builtin takes a weight
    // directly at the DataFrame layer; operators/ExactQuantiles does
    // (Σweight replaces counts in the same counts→prefix-sums→rank
    // pipeline — discrete selection stays exact long arithmetic). The
    // oracle spells out the identical cumulative-weight definition as
    // window SQL, so both engines compute from first principles.
    "q_weighted_median" -> QueryDef.sql(
      (s, dir) => graft.operators.ExactQuantiles.percentiles(
          Tables.lineitem(s, dir),
          keys = Seq("l_returnflag"), value = col("l_extendedprice"),
          shardWidth = 512.0,
          pcts = Seq(
            graft.operators.ExactQuantiles.Disc("wmed", 1, 2),
            graft.operators.ExactQuantiles.Disc("wp95", 19, 20)),
          weight = col("l_quantity").cast("long"),
          countOut = Some("total_weight"))
        .select("l_returnflag", "wmed", "wp95", "total_weight")
        .orderBy("l_returnflag"),
      """WITH vc AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |         SUM(CAST(l_quantity AS BIGINT)) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM vc)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum * 2 >= n THEN v END) AS wmed,
        |  MIN(CASE WHEN cum * 20 >= n * 19 THEN v END) AS wp95,
        |  CAST(MAX(n) AS BIGINT) AS total_weight
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // C62: SCD type-2 dimension build — change-capture the order-status
    // stream per customer into effective-dated rows (the standard
    // warehouse merge: keep a row only where the status DIFFERS from the
    // predecessor, then close each kept row with the next kept row's
    // start date; open rows are current). Two windows over the SAME
    // (custkey, date, key) partitioning — Catalyst plans one exchange +
    // one sort, the second window reuses both. At 100 TB the dimension
    // key is the partitioning key, so the build is shuffle-minimal and
    // append-friendly.
    "q_scd2" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val changes = Tables.orders(s, dir).filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate"),
            lag("o_orderstatus", 1).over(w).as("prev_status"))
          .filter(col("prev_status").isNull || col("prev_status") =!= col("o_orderstatus"))
        changes
          .withColumn("effective_to", lead("o_orderdate", 1).over(w))
          .withColumn("is_current", col("effective_to").isNull)
          .select(col("o_custkey"), col("o_orderstatus"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("effective_from"),
            date_format(col("effective_to"), "yyyy-MM-dd").as("effective_to"),
            col("is_current").cast("long").as("is_current"))
          .orderBy("o_custkey", "effective_from", "o_orderstatus")
      },
      """WITH changes AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev_status
        |  FROM orders WHERE o_custkey < 100),
        |kept AS (
        |  SELECT * FROM changes
        |  WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus,
        |  strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
        |  strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS effective_to,
        |  CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS BIGINT) AS is_current
        |FROM kept
        |ORDER BY o_custkey, effective_from, o_orderstatus""".stripMargin),

    // C87: MODE() / most-frequent-value aggregate — per order status,
    // the most common priority with a deterministic tie-break
    // (highest count, then smallest value). Engine-native MODE() has
    // an unspecified tie rule, so the surface spells the definition:
    // counts -> per-group max count -> min value among the tied. All
    // three steps are map-combined aggregates over the ≤ |status|x
    // |priority| cell relation; the corpus is touched once.
    "q_mode" -> QueryDef.sql(
      (s, dir) => {
        val g = Tables.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val m = g.groupBy(col("o_orderstatus").as("m_status"))
          .agg(max("n").as("max_n"), count(lit(1)).as("n_distinct"))
        g.join(m, col("o_orderstatus") === col("m_status") && col("n") === col("max_n"))
          .groupBy("o_orderstatus")
          .agg(min("o_orderpriority").as("mode_priority"),
            max("max_n").as("mode_count"), max("n_distinct").as("n_distinct"))
          .orderBy("o_orderstatus")
      },
      """WITH g AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT o_orderstatus AS m_status, MAX(n) AS max_n,
        |             COUNT(*) AS n_distinct
        |      FROM g GROUP BY 1)
        |SELECT o_orderstatus, MIN(o_orderpriority) AS mode_priority,
        |       CAST(MAX(max_n) AS BIGINT) AS mode_count,
        |       MAX(n_distinct) AS n_distinct
        |FROM g JOIN m ON o_orderstatus = m_status AND n = max_n
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // C88: chi-square independence test — the A/B-test / feature-vs-
    // outcome dependence check over the (status x priority)
    // contingency table. Per cell: observed O, marginals R (row), C
    // (column), grand total N, and the contribution
    // (O - E)^2 / E rewritten over exact integers as
    // (O*N - R*C)^2 / (R*C*N) — the squared numerator widens to
    // DECIMAL(38,0) because (O*N)^2 overflows a long past ~3e9 rows;
    // the division is ONE fixed-order double expression per cell (no
    // cross-row double accumulation anywhere — the chi2 total is a
    // decimal sum of 6-dp-rounded cell terms, the dot-product
    // tolerance idiom). Scale: one map-combined count pass; everything
    // after runs on the ≤ |status|*|priority| cell relation.
    "q_chisquare" -> QueryDef.sql(
      (s, dir) => {
        val g = Tables.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("o"))
        val r = g.groupBy(col("o_orderstatus").as("r_status"))
          .agg(sum("o").as("r_tot"))
        val c = g.groupBy(col("o_orderpriority").as("c_prio"))
          .agg(sum("o").as("c_tot"))
        val n = g.agg(sum("o").as("n_tot"))
        val cells = g
          .join(r, col("o_orderstatus") === col("r_status"))
          .join(c, col("o_orderpriority") === col("c_prio"))
          .crossJoin(broadcast(n))
          .withColumn("d", col("o") * col("n_tot") - col("r_tot") * col("c_tot"))
          .withColumn("contrib",
            (col("d").cast(DecimalType(38, 0)) * col("d").cast(DecimalType(38, 0)))
              .cast("double") /
              (col("r_tot").cast("double") * col("c_tot").cast("double") *
                col("n_tot").cast("double")))
        val chi2 = cells
          .agg(sum(round(col("contrib"), 6).cast(DecimalType(28, 6))).as("chi2d"),
            count(lit(1)).as("n_cells"))
          .select(col("chi2d").cast("double").as("chi2_total"), col("n_cells"))
        cells.select(col("o_orderstatus"), col("o_orderpriority"), col("o"),
            col("r_tot"), col("c_tot"), col("n_tot"),
            round(col("contrib"), 6).as("contrib"))
          .crossJoin(broadcast(chi2))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      """WITH g AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS o
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus AS r_status, CAST(SUM(o) AS BIGINT) AS r_tot
        |      FROM g GROUP BY 1),
        |c AS (SELECT o_orderpriority AS c_prio, CAST(SUM(o) AS BIGINT) AS c_tot
        |      FROM g GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM g),
        |cells AS (
        |  SELECT o_orderstatus, o_orderpriority, o, r_tot, c_tot, n_tot,
        |         CAST(CAST(o * n_tot - r_tot * c_tot AS DECIMAL(38,0))
        |              * CAST(o * n_tot - r_tot * c_tot AS DECIMAL(38,0)) AS DOUBLE)
        |         / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)
        |            * CAST(n_tot AS DOUBLE)) AS contrib
        |  FROM g JOIN r ON o_orderstatus = r_status
        |         JOIN c ON o_orderpriority = c_prio
        |         CROSS JOIN n),
        |t AS (SELECT CAST(SUM(CAST(ROUND(contrib, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |               AS chi2_total,
        |             COUNT(*) AS n_cells
        |      FROM cells)
        |SELECT o_orderstatus, o_orderpriority, o, r_tot, c_tot, n_tot,
        |       ROUND(contrib, 6) AS contrib, chi2_total, n_cells
        |FROM cells CROSS JOIN t
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // C89: Gini concentration index — per-nation inequality of
    // customer spend, the revenue-concentration statistic, via the
    // rank formula G = (2*Σr_i*x_i − (n+1)*Σx_i) / (n*Σx_i) over
    // ascending ranks. Every sum is EXACT: spend in cents (long),
    // Σr*x widened to DECIMAL(38,0) (at ~1e6 customers per key the
    // rank-weighted sum tops 1e24 — far past long range), and the
    // single output division converts two exact decimals to double.
    // The rank is [[ShardedWindow.rowNumber]] with shard =
    // spend div 1e6 — monotone along the (spend, custkey) order, so
    // a hot nation never sorts in one task (the 100 TB posture; a
    // plain 25-key window would).
    "q_gini" -> QueryDef.sql(
      (s, dir) => {
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("spend_c"))
        val named = spend
          .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("o_custkey").as("custkey"), col("spend_c"))
        val ranked = ShardedWindow.rowNumber(named, Seq("n_name"),
          expr("spend_c div 1000000"), Seq(col("spend_c"), col("custkey")), "r")
        ranked.groupBy("n_name")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("spend_c").cast(DecimalType(38, 0))).as("sx"),
            sum((col("r") * col("spend_c")).cast(DecimalType(38, 0))).as("srx"))
          .select(col("n_name"), col("n_customers"),
            col("sx").cast("long").as("total_spend_c"),
            ((lit(2).cast(DecimalType(38, 0)) * col("srx") -
              (col("n_customers") + 1).cast(DecimalType(38, 0)) * col("sx"))
              .cast("double") /
              (col("n_customers").cast(DecimalType(38, 0)) * col("sx")).cast("double"))
              .as("gini"))
          .orderBy("n_name")
      },
      """WITH spend AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |named AS (
        |  SELECT n_name, custkey, spend_c
        |  FROM spend JOIN customer ON custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey),
        |ranked AS (
        |  SELECT n_name, spend_c,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY spend_c, custkey) AS BIGINT) AS r
        |  FROM named)
        |SELECT n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(spend_c) AS BIGINT) AS total_spend_c,
        |  CAST(2 * SUM(CAST(r AS HUGEINT) * spend_c)
        |       - (COUNT(*) + 1) * SUM(CAST(spend_c AS HUGEINT)) AS DOUBLE)
        |  / CAST(COUNT(*) * SUM(CAST(spend_c AS HUGEINT)) AS DOUBLE) AS gini
        |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin),

    // C97: Benford first-digit audit — the classic fraud/data-quality
    // screen: distribution of the leading digit of order totals vs the
    // Benford expectation. All exact: cents are integers, the leading
    // digit comes from the decimal string, shares are floor-ppm, and
    // the Benford reference is the SAME floor(1e6*log10(1+1/d))
    // literals on both engines (log10 never evaluated at query time).
    // One map-combined digit count + a broadcast single-row total.
    "q_benford" -> QueryDef.sql(
      (s, dir) => {
        val cents = Tables.orders(s, dir)
          .select(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
          .filter(col("cents") > 0)
        val counts = cents
          .select(substring(col("cents").cast("string"), 1, 1).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        val total = cents.agg(count(lit(1)).as("n_total"))
        counts.crossJoin(broadcast(total))
          .select(col("digit"), col("n_orders"),
            expr("(n_orders * 1000000) div n_total").as("share_ppm"),
            expr(benfordCase).as("benford_ppm"))
          .withColumn("dev_ppm", col("share_ppm") - col("benford_ppm"))
          .orderBy("digit")
      },
      s"""WITH cents0 AS (
         |  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
         |  FROM orders),
         |cents AS (SELECT cents FROM cents0 WHERE cents > 0),
         |counts AS (
         |  SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
         |         COUNT(*) AS n_orders
         |  FROM cents GROUP BY 1),
         |total AS (SELECT COUNT(*) AS n_total FROM cents)
         |SELECT digit, n_orders,
         |  (n_orders * 1000000) // n_total AS share_ppm,
         |  $benfordCase AS benford_ppm,
         |  (n_orders * 1000000) // n_total - ($benfordCase) AS dev_ppm
         |FROM counts, total ORDER BY digit""".stripMargin),

    // C98: market-basket pair mining — co-occurrence support and lift
    // over order baskets, the association-rule primitive. The corpus
    // shuffles ONCE (groupBy orderkey → sorted distinct item set); the
    // C(n,2) pair fan-out, item counts, and basket count all derive
    // row-locally from that checkpointed basket relation (the first
    // cut self-joined the (ok, pk) relation — 4 corpus-sized shuffles
    // and 35.8 s at sf1 vs one shuffle now). Lift goes through
    // DECIMAL(38,0) so pair*baskets*1e6 cannot overflow at 100 TB.
    // Top-100 by (pair_orders DESC, part_a, part_b) via TakeOrdered —
    // never a full sort.
    "q_basket_pairs" -> QueryDef.sql(
      (s, dir) => {
        val baskets = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        // two codegen'd Generates (posexplode, then explode of the
        // inline slice) — the one-projection nested-lambda flatten form
        // evaluates interpreted and measured up to 33 s at sf1
        val pairs = baskets
          .select(col("items"), posexplode(col("items")).as(Seq("i", "a")))
          .select(col("a"),
            explode(expr("slice(items, i + 2, size(items) - i - 1)")).as("b"))
          .groupBy(col("a").as("part_a"), col("b").as("part_b"))
          .agg(count(lit(1)).as("pair_orders"))
        // item/basket counts come straight off lineitem as map-combined
        // distinct aggregations — deriving them from `baskets` re-ran
        // the collect_set shuffle once per leg (59.7 s vs 17.8 s, sf1)
        val items = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("pk"))
          .agg(countDistinct(col("l_orderkey")).as("item_orders"))
        val nb = Tables.lineitem(s, dir)
          .agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        pairs
          .join(items.withColumnRenamed("item_orders", "orders_a"),
            col("part_a") === col("pk")).drop("pk")
          .join(items.withColumnRenamed("item_orders", "orders_b"),
            col("part_b") === col("pk")).drop("pk")
          .crossJoin(broadcast(nb))
          .select(col("part_a"), col("part_b"), col("pair_orders"),
            expr("(pair_orders * 1000000) div n_baskets").as("support_ppm"),
            expr("CAST(pair_orders AS DECIMAL(38,0)) * n_baskets * 1000000" +
              " div (CAST(orders_a AS DECIMAL(38,0)) * orders_b)").as("lift_ppm"))
          .orderBy(col("pair_orders").desc, col("part_a"), col("part_b"))
          .limit(100)
      },
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS pair_orders
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2),
        |items AS (SELECT pk, COUNT(*) AS item_orders FROM li GROUP BY 1),
        |nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM li)
        |SELECT part_a, part_b, pair_orders,
        |  (pair_orders * 1000000) // n_baskets AS support_ppm,
        |  CAST(CAST(pair_orders AS HUGEINT) * n_baskets * 1000000
        |    // (CAST(ia.item_orders AS HUGEINT) * ib.item_orders) AS BIGINT)
        |    AS lift_ppm
        |FROM pairs JOIN items ia ON part_a = ia.pk
        |           JOIN items ib ON part_b = ib.pk, nb
        |ORDER BY pair_orders DESC, part_a, part_b LIMIT 100""".stripMargin),

    // C99: RFM customer segmentation — recency/frequency/monetary
    // quintile scores, the standard CRM cut. Scores use the exact
    // rank-based bucket ((rank-1)*5) div n + 1 (never NTILE, whose
    // remainder spreading differs between engines) with custkey
    // tie-breaks so the total order is identical on both sides. Ranks
    // come from ShardedWindow.rowNumber (shard = the leading metric —
    // monotone along each order) so no single-task window at scale;
    // the per-customer rollup is ONE map-combined pass over orders.
    "q_rfm" -> QueryDef.sql(
      (s, dir) => {
        val per = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(
            datediff(lit("2001-08-02").cast("date"),
              max(col("o_orderdate")).cast("date")).cast("long").as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("monetary_c"))
        val n = per.agg(count(lit(1)).as("n_cust"))
        // recency: SMALLER is better -> rank descending by recency so
        // bucket 5 = most recent. Descending via the negated column.
        val r1 = ShardedWindow.rowNumber(per, Seq.empty,
          expr("(-recency_days) div 100"),
          Seq(col("recency_days").desc, col("custkey")), "r_rank")
        val r2 = ShardedWindow.rowNumber(r1, Seq.empty,
          expr("frequency div 4"),
          Seq(col("frequency"), col("custkey")), "f_rank")
        val r3 = ShardedWindow.rowNumber(r2, Seq.empty,
          expr("monetary_c div 100000000"),
          Seq(col("monetary_c"), col("custkey")), "m_rank")
        r3.crossJoin(broadcast(n))
          .select(col("custkey"), col("recency_days"), col("frequency"),
            col("monetary_c"),
            expr("((r_rank - 1) * 5) div n_cust + 1").as("r_score"),
            expr("((f_rank - 1) * 5) div n_cust + 1").as("f_score"),
            expr("((m_rank - 1) * 5) div n_cust + 1").as("m_score"))
          .withColumn("segment",
            concat(col("r_score").cast("string"), col("f_score").cast("string"),
              col("m_score").cast("string")))
          .orderBy("custkey")
      },
      """WITH per AS (
        |  SELECT o_custkey AS custkey,
        |    date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '2001-08-02')
        |      AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS monetary_c
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT *,
        |    CAST(row_number() OVER (ORDER BY recency_days DESC, custkey) AS BIGINT) AS r_rank,
        |    CAST(row_number() OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_rank,
        |    CAST(row_number() OVER (ORDER BY monetary_c, custkey) AS BIGINT) AS m_rank,
        |    (SELECT COUNT(*) FROM per) AS n_cust
        |  FROM per)
        |SELECT custkey, recency_days, frequency, monetary_c,
        |  ((r_rank - 1) * 5) // n_cust + 1 AS r_score,
        |  ((f_rank - 1) * 5) // n_cust + 1 AS f_score,
        |  ((m_rank - 1) * 5) // n_cust + 1 AS m_score,
        |  CAST(((r_rank - 1) * 5) // n_cust + 1 AS VARCHAR)
        |    || CAST(((f_rank - 1) * 5) // n_cust + 1 AS VARCHAR)
        |    || CAST(((m_rank - 1) * 5) // n_cust + 1 AS VARCHAR) AS segment
        |FROM ranked ORDER BY custkey""".stripMargin),

    // C100: two-sample Kolmogorov–Smirnov distance — distribution drift
    // between two cohorts (return flags R vs A over price cents),
    // EXACT: D = max |F1-F2| evaluated as the integer max of
    // |cum1*n2 - cum2*n1| over the merged value grid (no doubles until
    // the single output division). Cumulatives via ShardedWindow
    // running sums (shard = cents div 1e6 — monotone along the value
    // order), so the CDF merge never collapses to one task.
    "q_ks_test" -> QueryDef.sql(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("R", "A"))
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        val grid = li.groupBy("cents").agg(
          sum(when(col("flag") === "R", 1L).otherwise(0L)).as("c1"),
          sum(when(col("flag") === "A", 1L).otherwise(0L)).as("c2"))
        val cum1 = ShardedWindow.runningSum(grid, Seq.empty,
          expr("cents div 1000000"), Seq(col("cents")), col("c1"), "cum1")
        val cum = ShardedWindow.runningSum(cum1, Seq.empty,
          expr("cents div 1000000"), Seq(col("cents")), col("c2"), "cum2")
        val tot = li.agg(
          sum(when(col("flag") === "R", 1L).otherwise(0L)).as("n1"),
          sum(when(col("flag") === "A", 1L).otherwise(0L)).as("n2"))
        cum.crossJoin(broadcast(tot))
          .select(
            abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dnum"),
            col("n1"), col("n2"))
          .groupBy("n1", "n2")
          .agg(max(col("dnum")).as("d_max"))
          .select(col("n1"), col("n2"),
            expr("CAST(d_max AS DECIMAL(38,0)) * 1000000 div " +
              "(CAST(n1 AS DECIMAL(38,0)) * n2)").as("d_ppm"))
      },
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |grid AS (
        |  SELECT cents,
        |    CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM li GROUP BY 1),
        |cum AS (
        |  SELECT
        |    CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
        |    CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS cum2
        |  FROM grid),
        |tot AS (
        |  SELECT CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM li)
        |SELECT n1, n2,
        |  CAST(CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS HUGEINT) * 1000000
        |    // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d_ppm
        |FROM cum, tot GROUP BY n1, n2""".stripMargin)
  ) ++ wave5 ++ wave6 ++ wave7

  /** C103–C105 (wave 5): Theil inequality, Wald–Wolfowitz runs test,
    * Bollinger bands — appended via ++ so `defs` stays one Map literal
    * per wave without exceeding the JVM method-size comfort zone. */
  private lazy val wave5: Map[String, QueryDef] = Map(
    // C103: Theil-T inequality index — the entropy-based complement to
    // q_gini over the same per-nation customer-spend relation.
    // T = Sum(x·(ln x + ln n − ln S))/S where every ln argument is an
    // EXACT INTEGER (the dsir/naive-bayes idiom: libm ln on integer-
    // valued doubles matches across engines), the x·ln x products sum
    // as doubles and the output is ROUND(...,6); n and S ride the same
    // single aggregation pass.
    "q_theil" -> QueryDef.sql(
      (s, dir) => {
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("spend_c"))
        val named = spend
          .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
        named.groupBy("n_name")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("spend_c")).as("total_spend_c"),
            sum(col("spend_c").cast("double") * log(col("spend_c").cast("double")))
              .as("sxlnx"))
          .select(col("n_name"), col("n_customers"), col("total_spend_c"),
            round(col("sxlnx") / col("total_spend_c").cast("double") +
              log(col("n_customers").cast("double")) -
              log(col("total_spend_c").cast("double")), 6).as("theil"))
          .orderBy("n_name")
      },
      """WITH spend AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |named AS (
        |  SELECT n_name, spend_c
        |  FROM spend JOIN customer ON custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(spend_c) AS BIGINT) AS total_spend_c,
        |  ROUND(SUM(CAST(spend_c AS DOUBLE) * ln(CAST(spend_c AS DOUBLE)))
        |          / CAST(SUM(CAST(spend_c AS HUGEINT)) AS DOUBLE)
        |        + ln(CAST(COUNT(*) AS DOUBLE))
        |        - ln(CAST(SUM(CAST(spend_c AS HUGEINT)) AS DOUBLE)), 6) AS theil
        |FROM named GROUP BY n_name ORDER BY n_name""".stripMargin),

    // C104: Wald–Wolfowitz runs test — randomness screen over the
    // daily order-volume sequence: days classified above/below the
    // grand mean by EXACT cross-multiplication (daily·n vs S in
    // DECIMAL(38,0) — never a float mean), runs counted via a rank
    // self-join on ShardedWindow row numbers (consecutive-rank pairs
    // shuffle-join on the rank key; no single-task global window),
    // expected runs (2·n1·n2 + n)/n as floor-milli.
    "q_runs_test" -> QueryDef.sql(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
          // the #days-sized rollup is referenced 4 ways below (totals,
          // signs, ranks, rank self-join) — truncate so the corpus
          // aggregation runs once, not per reference (12.6 s → 2 s sf1)
          .localCheckpoint()
        val tot = daily.agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"))
        val signed = daily.crossJoin(broadcast(tot))
          .withColumn("above",
            (col("x").cast(DecimalType(38, 0)) * col("n") > col("sx")).cast("long"))
        val ranked = ShardedWindow.rowNumber(signed, Seq.empty,
          expr("unix_date(CAST(day AS DATE)) div 64"), Seq(col("day")), "r")
        val prev = ranked.select((col("r") + 1).as("pr"), col("above").as("pabove"))
        val changes = ranked.join(prev, col("r") === col("pr"))
          .agg(sum(when(col("above") =!= col("pabove"), 1L).otherwise(0L)).as("ch"))
        ranked.groupBy("n")
          .agg(sum(col("above")).as("n_above"),
            sum(lit(1L) - col("above")).as("n_below"))
          .crossJoin(broadcast(changes))
          .select(col("n").as("n_days"), col("n_above"), col("n_below"),
            (col("ch") + 1L).as("runs"),
            expr("(CAST(2 AS DECIMAL(38,0)) * n_above * n_below + n) * 1000 div n")
              .as("expected_runs_milli"))
      },
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx FROM daily),
        |signed AS (
        |  SELECT day, CASE WHEN CAST(x AS HUGEINT) * n > sx THEN 1 ELSE 0 END AS above,
        |         n
        |  FROM daily, tot),
        |ranked AS (
        |  SELECT day, above, n,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS r
        |  FROM signed),
        |ch AS (
        |  SELECT CAST(SUM(CASE WHEN a.above <> b.above THEN 1 ELSE 0 END) AS BIGINT)
        |           AS ch
        |  FROM ranked a JOIN ranked b ON a.r = b.r + 1)
        |SELECT MAX(n) AS n_days,
        |  CAST(SUM(above) AS BIGINT) AS n_above,
        |  CAST(SUM(1 - above) AS BIGINT) AS n_below,
        |  MAX(ch) + 1 AS runs,
        |  CAST((2 * SUM(CAST(above AS HUGEINT)) * SUM(CAST(1 - above AS HUGEINT))
        |        + MAX(n)) * 1000 // MAX(n) AS BIGINT) AS expected_runs_milli
        |FROM ranked, ch""".stripMargin),

    // C105: Bollinger bands — 20-day rolling mean ± 2σ per nation over
    // daily spend. The window sums Σx and Σx² stay exact decimals; the
    // variance numerator cnt·Σx² − (Σx)² is exact, and every double op
    // after it (two divisions, one IEEE-correctly-rounded sqrt, one
    // fused add) is written in the SAME order on both engines, so the
    // bits agree without ROUND. Window partitions by nation (bounded
    // series per key — the EWMA discipline), frame = 19 PRECEDING.
    "q_bollinger" -> QueryDef.sql(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
        val w = Window.partitionBy("n_name").orderBy("day").rowsBetween(-19, 0)
        val dec = (c: Column) => c.cast(DecimalType(38, 0))
        daily
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("sx", sum(dec(col("x"))).over(w))
          .withColumn("sxx", sum(dec(col("x")) * dec(col("x"))).over(w))
          .select(col("n_name"), col("day"), col("x").as("spend_c"),
            (col("sx").cast("double") / col("cnt").cast("double")).as("ma20"),
            sqrt((col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("cnt") * col("cnt")).cast("double")).as("sigma"))
          .withColumn("upper", col("ma20") + lit(2.0) * col("sigma"))
          .withColumn("lower", col("ma20") - lit(2.0) * col("sigma"))
          .orderBy("n_name", "day")
      },
      """WITH daily AS (
        |  SELECT n_name, strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT n_name, day, x,
        |    COUNT(*) OVER w AS cnt,
        |    SUM(CAST(x AS HUGEINT)) OVER w AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx
        |  FROM daily
        |  WINDOW w AS (PARTITION BY n_name ORDER BY day
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT n_name, day, x AS spend_c,
        |  CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE) AS ma20,
        |  sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))
        |    AS sigma,
        |  CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE)
        |    + 2.0 * sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))
        |    AS upper,
        |  CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE)
        |    - 2.0 * sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))
        |    AS lower
        |FROM win ORDER BY n_name, day""".stripMargin)
  )

  /** C106 (wave 6): ABC/Pareto classification. */
  private lazy val wave6: Map[String, QueryDef] = Map(
    // C106: ABC (Pareto) classification — parts bucketed A/B/C by
    // cumulative revenue share (<=80% / <=95% / rest), the inventory-
    // analysis classic. Cumulative revenue via ShardedWindow running
    // sums in descending-revenue order (shard = negated revenue,
    // monotone under trunc-div); class cuts by exact decimal
    // cross-multiplication (cum·100 vs threshold·total — never a float
    // share); output is the 3-row class rollup with floor-ppm shares.
    "q_abc_pareto" -> QueryDef.sql(
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")).as("rev_c"))
        val cum = ShardedWindow.runningSum(rev, Seq.empty,
          expr("(-rev_c) div 100000000"),
          Seq(col("rev_c").desc, col("partkey")), col("rev_c"), "cum_c")
        val tot = rev.agg(sum(col("rev_c").cast(DecimalType(38, 0))).as("total_c"))
        cum.crossJoin(broadcast(tot))
          .withColumn("abc_class",
            when(col("cum_c").cast(DecimalType(38, 0)) * 100 <= col("total_c") * 80, "A")
              .when(col("cum_c").cast(DecimalType(38, 0)) * 100 <= col("total_c") * 95, "B")
              .otherwise("C"))
          .groupBy("abc_class")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("rev_c")).as("class_rev_c"))
          .crossJoin(broadcast(tot))
          .select(col("abc_class"), col("n_parts"), col("class_rev_c"),
            expr("CAST(class_rev_c AS DECIMAL(38,0)) * 1000000 div total_c")
              .as("rev_share_ppm"))
          .orderBy("abc_class")
      },
      """WITH rev AS (
        |  SELECT l_partkey AS partkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS rev_c
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT partkey, rev_c,
        |    CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, partkey) AS BIGINT) AS cum_c
        |  FROM rev),
        |tot AS (SELECT SUM(CAST(rev_c AS HUGEINT)) AS total_c FROM rev),
        |cls AS (
        |  SELECT CASE WHEN CAST(cum_c AS HUGEINT) * 100 <= total_c * 80 THEN 'A'
        |              WHEN CAST(cum_c AS HUGEINT) * 100 <= total_c * 95 THEN 'B'
        |              ELSE 'C' END AS abc_class,
        |         rev_c
        |  FROM cum, tot)
        |SELECT abc_class, COUNT(*) AS n_parts,
        |  CAST(SUM(rev_c) AS BIGINT) AS class_rev_c,
        |  CAST(SUM(CAST(rev_c AS HUGEINT)) * 1000000
        |    // (SELECT total_c FROM tot) AS BIGINT) AS rev_share_ppm
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** C107 (wave 7): Cramér's V effect size. */
  private lazy val wave7: Map[String, QueryDef] = Map(
    // C107: Cramér's V — the effect-size companion to q_chisquare over
    // the same status×priority contingency table: V =
    // sqrt(chi2 / (N·min(r−1,c−1))). chi2 sums the 6-dp cell terms as
    // exact decimals (the q_chisquare rule); the final divide + IEEE
    // sqrt are written in the same order on both engines (the
    // q_bollinger discipline), so V is hash-exact unrounded.
    "q_cramers_v" -> QueryDef.sql(
      (s, dir) => {
        val g = Tables.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("o"))
        val r = g.groupBy(col("o_orderstatus").as("r_status"))
          .agg(sum("o").as("r_tot"))
        val c = g.groupBy(col("o_orderpriority").as("c_prio"))
          .agg(sum("o").as("c_tot"))
        val n = g.agg(sum("o").as("n_tot"),
          countDistinct("o_orderstatus").as("n_rows"),
          countDistinct("o_orderpriority").as("n_cols"))
        g.join(r, col("o_orderstatus") === col("r_status"))
          .join(c, col("o_orderpriority") === col("c_prio"))
          .crossJoin(broadcast(n))
          .withColumn("d", col("o") * col("n_tot") - col("r_tot") * col("c_tot"))
          .withColumn("contrib",
            (col("d").cast(DecimalType(38, 0)) * col("d").cast(DecimalType(38, 0)))
              .cast("double") /
              (col("r_tot").cast("double") * col("c_tot").cast("double") *
                col("n_tot").cast("double")))
          .groupBy("n_tot", "n_rows", "n_cols")
          .agg(sum(round(col("contrib"), 6).cast(DecimalType(28, 6))).as("chi2d"))
          .select(col("n_tot"), col("n_rows"), col("n_cols"),
            col("chi2d").cast("double").as("chi2_total"),
            least(col("n_rows") - 1, col("n_cols") - 1).as("dof_min"),
            sqrt(col("chi2d").cast("double") /
              (col("n_tot") * least(col("n_rows") - 1, col("n_cols") - 1))
                .cast("double")).as("cramers_v"))
      },
      """WITH g AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS o
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus AS r_status, CAST(SUM(o) AS BIGINT) AS r_tot
        |      FROM g GROUP BY 1),
        |c AS (SELECT o_orderpriority AS c_prio, CAST(SUM(o) AS BIGINT) AS c_tot
        |      FROM g GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot,
        |             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_rows,
        |             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_cols
        |      FROM g),
        |cells AS (
        |  SELECT n_tot, n_rows, n_cols,
        |         CAST(CAST(o * n_tot - r_tot * c_tot AS DECIMAL(38,0))
        |              * CAST(o * n_tot - r_tot * c_tot AS DECIMAL(38,0)) AS DOUBLE)
        |         / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)
        |            * CAST(n_tot AS DOUBLE)) AS contrib
        |  FROM g JOIN r ON o_orderstatus = r_status
        |         JOIN c ON o_orderpriority = c_prio, n)
        |SELECT n_tot, n_rows, n_cols,
        |  CAST(SUM(CAST(ROUND(contrib, 6) AS DECIMAL(28,6))) AS DOUBLE) AS chi2_total,
        |  LEAST(n_rows - 1, n_cols - 1) AS dof_min,
        |  sqrt(CAST(SUM(CAST(ROUND(contrib, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |       / CAST(n_tot * LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)) AS cramers_v
        |FROM cells GROUP BY 1, 2, 3""".stripMargin),

    // C109: MAD robust outliers — the median-absolute-deviation screen
    // (the robust-stats sibling of q_iqr_outliers): per return flag,
    // med = discrete median of price cents (smallest value with
    // 2·cum ≥ n — ≡ percentile_disc(0.5)), MAD = discrete median of
    // |x − med|, outliers = |x − med| > 5·MAD in exact integers.
    // TWO corpus passes (the information-theoretic floor for MAD) +
    // type-level count rollups; medians broadcast back. Cumulatives
    // run through ShardedWindow (price cents has ~millions of distinct
    // values per flag — ExactQuantiles' per-key window was one task
    // per flag and 106 s at sf10; 3 flags ≠ bounded histogram).
    "q_mad_outliers" -> QueryDef.sql(
      (s, dir) => {
        def discMedian(grid: DataFrame, valueCol: String, out: String): DataFrame = {
          // per-flag n rides the sharded scan's own totals relation
          // (keyTotalOut) — the separate groupBy(flag) aggregate plus
          // its broadcast join-back were two extra jobs per call (r14)
          val cum = ShardedWindow.runningSum(grid, Seq("flag"),
            expr(s"$valueCol div 1000000"), Seq(col(valueCol)), col("cnt"), "cum",
            keyTotalOut = Some("n"))
          cum.filter(col("cum") * 2 >= col("n"))
            .groupBy("flag").agg(min(col(valueCol)).as(out))
        }
        val vals = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        // ONE corpus scan total: the corpus collapses to its (flag,
        // cents) count relation, and BOTH median passes plus the final
        // rollup run over count relations derived from it (|x − med|
        // is a function of cents, so deviation counts re-group vc —
        // the former per-row deviation join re-scanned the corpus).
        // Checkpoints: each grid feeds a ShardedWindow scan, which
        // reads its input twice (the q_gini_split sf100 lesson).
        val vc = vals.groupBy("flag", "cents").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val med = discMedian(vc, "cents", "med_c")
        val ac = vc.join(broadcast(med), "flag")
          .select(col("flag"), abs(col("cents") - col("med_c")).as("adev"),
            col("cnt"))
          .groupBy("flag", "adev").agg(sum("cnt").as("cnt"))
          .localCheckpoint(eager = false)
        val mad = discMedian(ac, "adev", "mad_c")
        ac.join(broadcast(mad), "flag")
          .groupBy("flag", "mad_c")
          .agg(sum(col("cnt")).as("n_items"),
            sum(when(col("adev") > lit(5L) * col("mad_c"), col("cnt"))
              .otherwise(0L)).as("n_outliers"))
          .join(broadcast(med), "flag")
          .select(col("flag"), col("med_c"), col("mad_c"), col("n_items"),
            col("n_outliers"),
            expr("(n_outliers * 1000000) div n_items").as("outlier_ppm"))
          .orderBy("flag")
      },
      """WITH vals AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |med AS (SELECT flag,
        |          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
        |            AS med_c
        |        FROM vals GROUP BY 1),
        |ad AS (SELECT v.flag, ABS(cents - med_c) AS adev
        |       FROM vals v JOIN med USING (flag)),
        |mad AS (SELECT flag,
        |          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT)
        |            AS mad_c
        |        FROM ad GROUP BY 1)
        |SELECT flag, med_c, mad_c, COUNT(*) AS n_items,
        |  CAST(SUM(CASE WHEN adev > 5 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(SUM(CASE WHEN adev > 5 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS outlier_ppm
        |FROM ad JOIN mad USING (flag) JOIN med USING (flag)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),

    // C110: rolling correlation — 20-day windowed Pearson correlation
    // between two nations' daily spend series, the co-movement view a
    // market/ops dashboard wants. Window sums stay exact decimals; the
    // correlation is assembled from identically-ordered double ops
    // (two IEEE sqrts, one multiply, one divide — the q_bollinger
    // discipline), hash-exact unrounded. Only full 20-row windows
    // emit (avoids the 0/0 NaN whose repr engines disagree on). The
    // joined series is calendar-bounded (#days rows), so the single
    // unpartitioned window is a bounded relation, not a scale risk.
    "q_rolling_corr" -> QueryDef.sql(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_name").isin("NATION_0", "NATION_1"))
          .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("v"))
        val x = daily.filter(col("n_name") === "NATION_0").select(col("day"), col("v").as("x"))
        val y = daily.filter(col("n_name") === "NATION_1").select(col("day").as("dy"), col("v").as("y"))
        val xy = x.join(y, col("day") === col("dy")).drop("dy")
        val w = Window.orderBy("day").rowsBetween(-19, 0)
        val dec = (c: Column) => c.cast(DecimalType(38, 0))
        xy
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("sx", sum(dec(col("x"))).over(w))
          .withColumn("sy", sum(dec(col("y"))).over(w))
          .withColumn("sxy", sum(dec(col("x")) * dec(col("y"))).over(w))
          .withColumn("sxx", sum(dec(col("x")) * dec(col("x"))).over(w))
          .withColumn("syy", sum(dec(col("y")) * dec(col("y"))).over(w))
          .filter(col("cnt") === 20)
          .select(col("day"), col("x").as("x_c"), col("y").as("y_c"),
            ((col("cnt") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("cnt") * col("syy") - col("sy") * col("sy")).cast("double"))))
              .as("corr20"))
          .orderBy("day")
      },
      """WITH daily AS (
        |  SELECT n_name, strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_0', 'NATION_1')
        |  GROUP BY 1, 2),
        |xy AS (
        |  SELECT a.day, a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b ON a.day = b.day
        |  WHERE a.n_name = 'NATION_0' AND b.n_name = 'NATION_1'),
        |win AS (
        |  SELECT day, x, y,
        |    COUNT(*) OVER w AS cnt,
        |    SUM(CAST(x AS HUGEINT)) OVER w AS sx,
        |    SUM(CAST(y AS HUGEINT)) OVER w AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) OVER w AS syy
        |  FROM xy
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT day, x AS x_c, y AS y_c,
        |  CAST(cnt * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(cnt * syy - sy * sy AS DOUBLE))) AS corr20
        |FROM win WHERE cnt = 20 ORDER BY day""".stripMargin),

    // C111: weighted sampling without replacement (Efraimidis–Spirakis
    // 2006) — top-10 orders per nation with inclusion probability ∝
    // spend, the one-pass distributed weighted reservoir: each row's
    // key is ln(u)/w for a deterministic hash uniform u (ln of an
    // exact integer — the shared-idiom guarantee — then one division;
    // identical double ops rank identically on both engines), and the
    // per-nation top-10 by key rides a rank window whose top-k pushes
    // down (WindowGroupLimit). No RNG, no resample pass, no global
    // sort.
    "q_weighted_sample" -> QueryDef.sql(
      (s, dir) => {
        val rows = Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("o_orderkey"),
            expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("spend_c"),
            expr("(((o_orderkey % 1048576) * 2654435761) div 1024) % 1000000 + 1")
              .as("u_ppm"))
          .withColumn("es_key",
            // ln(u) with u = u_ppm/1e6 MUST normalize before the
            // division: ln(u_ppm)/w alone ranks by -1/w (favors SMALL
            // weights — the spec's PPS skew check caught it)
            (log(col("u_ppm").cast("double")) - log(lit(1000000d))) /
              col("spend_c").cast("double"))
        val w = Window.partitionBy("n_name")
          .orderBy(col("es_key").desc, col("o_orderkey"))
        rows.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("n_name"), col("rk").cast("long").as("rk"),
            col("o_orderkey"), col("spend_c"), col("u_ppm"))
          .orderBy("n_name", "rk")
      },
      """WITH rows_ AS (
        |  SELECT n_name, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS spend_c,
        |    (((o_orderkey % 1048576) * 2654435761) // 1024) % 1000000 + 1 AS u_ppm
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey),
        |ranked AS (
        |  SELECT n_name, o_orderkey, spend_c, u_ppm,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY (ln(CAST(u_ppm AS DOUBLE)) - ln(CAST(1000000 AS DOUBLE)))
        |                 / CAST(spend_c AS DOUBLE) DESC,
        |               o_orderkey) AS BIGINT) AS rk
        |  FROM rows_)
        |SELECT n_name, rk, o_orderkey, spend_c, u_ppm
        |FROM ranked WHERE rk <= 10 ORDER BY n_name, rk""".stripMargin),

    // C113: Lorenz curve deciles — the distributional view behind
    // q_gini/q_theil: customers ranked by spend, bucketed by the exact
    // ((rank−1)·10) div n + 1 rule (the RFM discipline), each decile's
    // exact floor-ppm share of total spend plus the cumulative share —
    // the actual curve points a dashboard plots. Ranks through
    // ShardedWindow; two ppm divisions through DECIMAL(38,0).
    "q_lorenz" -> QueryDef.sql(
      (s, dir) => {
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).as("spend_c"))
        val ranked = ShardedWindow.rowNumber(spend, Seq.empty,
          expr("spend_c div 100000000"), Seq(col("spend_c"), col("custkey")), "r")
        val n = spend.agg(count(lit(1)).as("n_cust"),
          sum(col("spend_c").cast(DecimalType(38, 0))).as("total_c"))
        val deciles = ranked.crossJoin(broadcast(n))
          .withColumn("decile", expr("((r - 1) * 10) div n_cust + 1"))
          .groupBy("decile", "total_c")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("spend_c").cast(DecimalType(38, 0))).as("dec_c"))
        val cum = ShardedWindow.runningSum(
          deciles, Seq.empty, col("decile"), Seq(col("decile")),
          col("dec_c"), "cum_c")
        cum.select(col("decile"), col("n_customers"),
            col("dec_c").cast("long").as("decile_spend_c"),
            expr("dec_c * 1000000 div total_c").as("share_ppm"),
            expr("cum_c * 1000000 div total_c").as("cum_share_ppm"))
          .orderBy("decile")
      },
      """WITH spend AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT spend_c,
        |    CAST(row_number() OVER (ORDER BY spend_c, custkey) AS BIGINT) AS r,
        |    (SELECT COUNT(*) FROM spend) AS n_cust,
        |    (SELECT SUM(CAST(spend_c AS HUGEINT)) FROM spend) AS total_c
        |  FROM spend),
        |dec AS (
        |  SELECT ((r - 1) * 10) // n_cust + 1 AS decile, total_c,
        |         COUNT(*) AS n_customers,
        |         SUM(CAST(spend_c AS HUGEINT)) AS dec_c
        |  FROM ranked GROUP BY 1, 2)
        |SELECT decile, n_customers,
        |  CAST(dec_c AS BIGINT) AS decile_spend_c,
        |  CAST(dec_c * 1000000 // total_c AS BIGINT) AS share_ppm,
        |  CAST(SUM(dec_c) OVER (ORDER BY decile) * 1000000 // total_c AS BIGINT)
        |    AS cum_share_ppm
        |FROM dec ORDER BY decile""".stripMargin),

    // C114: Spearman rank correlation (tie-aware) — the robust
    // monotone-association companion to q_rolling_corr's Pearson:
    // quantity vs price per return flag over AVERAGE ranks, kept exact
    // by the ×2 scaling (avg rank of a tie group = (2·cum − cnt + 1)/2
    // — so 2·rank is the integer 2cum−cnt+1; cumulatives through
    // ShardedWindow over the distinct-value grids). Pearson over the
    // scaled ranks runs in DECIMAL(38,0) sums with the
    // identically-ordered double/sqrt finish (the q_bollinger
    // discipline) — hash-exact unrounded. The ×2 scale cancels in rho.
    "q_spearman" -> QueryDef.sql(
      (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        def rank2(valueCol: String, out: String): DataFrame = {
          // checkpoint: the sharded scan reads the grid twice, and each
          // re-run re-scanned the full pairs projection (the sf100
          // grid-recompute lesson)
          val grid = pairs.groupBy("flag", valueCol).agg(count(lit(1)).as("cnt"))
            .localCheckpoint()
          ShardedWindow.runningSum(grid, Seq("flag"),
            expr(s"$valueCol div 1000000"), Seq(col(valueCol)), col("cnt"), "cum")
            .select(col("flag").as(s"${out}_flag"), col(valueCol).as(s"${out}_v"),
              (col("cum") * 2 - col("cnt") + 1).as(out))
        }
        // qty is DOMAIN-bounded (ROUND(l_quantity) in 1..50, ≤50 distinct
        // values per flag at any corpus scale), so the compact one-window
        // path over its count grid is the right ExactQuantiles-style
        // strategy (r14) — the sharded scan + checkpoint machinery is for
        // unbounded domains like cents. Identical math: running sum over
        // the same (flag, qty) order.
        def rank2Bounded(valueCol: String, out: String): DataFrame = {
          val grid = pairs.groupBy("flag", valueCol).agg(count(lit(1)).as("cnt"))
          val wCum = Window.partitionBy("flag").orderBy(col(valueCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          grid.withColumn("cum", sum("cnt").over(wCum))
            .select(col("flag").as(s"${out}_flag"), col(valueCol).as(s"${out}_v"),
              (col("cum") * 2 - col("cnt") + 1).as(out))
        }
        val rq = rank2Bounded("qty", "rq2")
        val rp = rank2("cents", "rp2")
        val dec = (c: Column) => c.cast(DecimalType(38, 0))
        pairs
          .join(rq, col("flag") === col("rq2_flag") && col("qty") === col("rq2_v"))
          .join(rp, col("flag") === col("rp2_flag") && col("cents") === col("rp2_v"))
          .groupBy("flag")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("rq2"))).as("sx"), sum(dec(col("rp2"))).as("sy"),
            sum(dec(col("rq2")) * dec(col("rp2"))).as("sxy"),
            sum(dec(col("rq2")) * dec(col("rq2"))).as("sxx"),
            sum(dec(col("rp2")) * dec(col("rp2"))).as("syy"))
          .select(col("flag"), col("n"),
            ((dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("double"))))
              .as("spearman_rho"))
          .orderBy("flag")
      },
      """WITH pairs AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |gq AS (SELECT flag, qty, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
        |rq AS (SELECT flag, qty,
        |         CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY qty) AS BIGINT) * 2
        |           - cnt + 1 AS rq2
        |       FROM gq),
        |gp AS (SELECT flag, cents, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
        |rp AS (SELECT flag, cents,
        |         CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) * 2
        |           - cnt + 1 AS rp2
        |       FROM gp),
        |st AS (
        |  SELECT p.flag, COUNT(*) AS n,
        |    SUM(CAST(rq2 AS HUGEINT)) AS sx, SUM(CAST(rp2 AS HUGEINT)) AS sy,
        |    SUM(CAST(rq2 AS HUGEINT) * rp2) AS sxy,
        |    SUM(CAST(rq2 AS HUGEINT) * rq2) AS sxx,
        |    SUM(CAST(rp2 AS HUGEINT) * rp2) AS syy
        |  FROM pairs p JOIN rq ON p.flag = rq.flag AND p.qty = rq.qty
        |               JOIN rp ON p.flag = rp.flag AND p.cents = rp.cents
        |  GROUP BY 1)
        |SELECT flag, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman_rho
        |FROM st ORDER BY flag""".stripMargin),

    // C115: Mann-Whitney U — two-sample tie-aware rank test (linestatus
    // F vs O on quantity). Ranks derive from the qty distinct-value
    // grid, which is DOMAIN-bounded (qty in 1..50): the rank pass is
    // O(|domain|) regardless of row count, so the only full-data work
    // is one map-side-combined groupBy. 2·avg_rank = 2cum−cnt+1 stays
    // integral, so U, the rank sum, and the tie term Σ(t³−t) are exact
    // integers; only the final z goes through the identically-ordered
    // double/sqrt finish. Var uses the tie-corrected
    // n1·n2/12·((n+1) − Σ(t³−t)/(n(n−1))).
    //
    // SF ENVELOPE (the q_jarque_bera precedent): the ×2 rank sums
    // (cnt_f·rank2) accumulators and every N²-scale product run through
    // DECIMAL(38,0) / HUGEINT on the two engines (r9 advice closed),
    // so internal math is exact far past any reachable corpus; the
    // only remaining bound is the EMIT cast of the U statistics to
    // BIGINT (U ~ N²/4 exceeds a long around sf2500), where ANSI
    // throws loudly, never silently.
    "q_mann_whitney" -> QueryDef.sql(
      (s, dir) => {
        val rows = Tables.lineitem(s, dir)
          .select(col("l_linestatus").as("st"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"))
        val grid = rows.groupBy("qty").agg(
          count(lit(1)).as("cnt"),
          sum(when(col("st") === "F", 1L).otherwise(0L)).as("cnt_f"))
          .localCheckpoint() // the sharded scan reads its input twice
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val ranked = ShardedWindow.runningSum(grid, Seq.empty, expr("qty div 10"),
            Seq(col("qty")), col("cnt"), "cum")
          .withColumn("rank2", col("cum") * 2 - col("cnt") + 1)
        ranked
          .agg(sum(col("cnt_f")).as("n1"),
            sum(col("cnt") - col("cnt_f")).as("n2"),
            sum(dec38(col("cnt_f")) * dec38(col("rank2"))).as("r1_x2"),
            sum(dec38(col("cnt")) * dec38(col("cnt")) * dec38(col("cnt"))
              - dec38(col("cnt"))).as("tie3"))
          .withColumn("n", col("n1") + col("n2"))
          .withColumn("u1_x2",
            col("r1_x2") - dec38(col("n1")) * (dec38(col("n1")) + 1))
          .select(col("n1"), col("n2"),
            col("u1_x2").cast("long").as("u1_x2"),
            (dec38(col("n1")) * dec38(col("n2")) * 2 - col("u1_x2"))
              .cast("long").as("u2_x2"),
            ((col("u1_x2") - dec38(col("n1")) * dec38(col("n2"))).cast("double") /
              (sqrt(col("n1").cast("double") * col("n2").cast("double") *
                ((col("n") + 1).cast("double") -
                  col("tie3").cast("double") /
                    (dec38(col("n")) * (dec38(col("n")) - 1)).cast("double")) /
                lit(12.0)) * 2))
              .as("z"))
      },
      """WITH rows_ AS (
        |  SELECT l_linestatus AS st, CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty
        |  FROM lineitem),
        |grid AS (
        |  SELECT qty, COUNT(*) AS cnt,
        |         CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f
        |  FROM rows_ GROUP BY 1),
        |ranked AS (
        |  SELECT qty, cnt, cnt_f,
        |         CAST(SUM(cnt) OVER (ORDER BY qty) AS BIGINT) * 2 - cnt + 1 AS rank2
        |  FROM grid),
        |agg AS (
        |  SELECT CAST(SUM(cnt_f) AS BIGINT) AS n1,
        |         CAST(SUM(cnt - cnt_f) AS BIGINT) AS n2,
        |         SUM(CAST(cnt_f AS HUGEINT) * rank2) AS r1_x2,
        |         SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
        |  FROM ranked),
        |fin AS (
        |  SELECT n1, n2, n1 + n2 AS n,
        |         r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1_x2h, tie3
        |  FROM agg)
        |SELECT n1, n2, CAST(u1_x2h AS BIGINT) AS u1_x2,
        |  CAST(CAST(n1 AS HUGEINT) * n2 * 2 - u1_x2h AS BIGINT) AS u2_x2,
        |  CAST(u1_x2h - CAST(n1 AS HUGEINT) * n2 AS DOUBLE) /
        |    (sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
        |       (CAST(n + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE)
        |          / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) / 12.0) * 2) AS z
        |FROM fin""".stripMargin),

    // C116: Kruskal-Wallis H — k-group (returnflag A/N/R) tie-aware
    // rank ANOVA on quantity, the nonparametric companion to q_anova.
    // Same domain-bounded grid rank pass as q_mann_whitney; the three
    // per-group rank sums pivot into ONE row via conditional sums so
    // the double finish is a fixed-shape expression (Σ over groups has
    // engine-deterministic order). R_j²/n_j runs the ×2 rank sums
    // through DECIMAL(38,0) squares (fits to sf100: (7e17)² < 1e38)
    // before the double divide; 12/4 = the literal 3.0. Tie-corrected
    // H divides by 1 − Σ(t³−t)/(n³−n).
    //
    // The per-group ×2 rank-sum accumulators run through DECIMAL(38,0)
    // / HUGEINT like their squares (r9 advice closed) — no N²-scale
    // long products remain anywhere in this surface; its outputs are
    // N-scale counts and doubles only.
    "q_kruskal_wallis" -> QueryDef.sql(
      (s, dir) => {
        val rows = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"))
        val grid = rows.groupBy("qty").agg(
          count(lit(1)).as("cnt"),
          sum(when(col("flag") === "A", 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("flag") === "N", 1L).otherwise(0L)).as("cnt_n"),
          sum(when(col("flag") === "R", 1L).otherwise(0L)).as("cnt_r"))
          .localCheckpoint() // the sharded scan reads its input twice
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val ranked = ShardedWindow.runningSum(grid, Seq.empty, expr("qty div 10"),
            Seq(col("qty")), col("cnt"), "cum")
          .withColumn("rank2", col("cum") * 2 - col("cnt") + 1)
        def sq(c: String, nCol: String): Column =
          (dec38(col(c)) * dec38(col(c))).cast("double") / col(nCol).cast("double")
        ranked
          .agg(sum(col("cnt_a")).as("na"), sum(col("cnt_n")).as("nn"),
            sum(col("cnt_r")).as("nr"),
            sum(dec38(col("cnt_a")) * dec38(col("rank2"))).as("ra_x2"),
            sum(dec38(col("cnt_n")) * dec38(col("rank2"))).as("rn_x2"),
            sum(dec38(col("cnt_r")) * dec38(col("rank2"))).as("rr_x2"),
            sum(dec38(col("cnt")) * dec38(col("cnt")) * dec38(col("cnt"))
              - dec38(col("cnt"))).as("tie3"))
          .withColumn("n", col("na") + col("nn") + col("nr"))
          .withColumn("h",
            lit(3.0) * (sq("ra_x2", "na") + sq("rn_x2", "nn") + sq("rr_x2", "nr")) /
              (dec38(col("n")) * (dec38(col("n")) + 1)).cast("double") -
              lit(3.0) * (col("n") + 1).cast("double"))
          .withColumn("tie_c",
            lit(1.0) - col("tie3").cast("double") /
              (dec38(col("n")) * dec38(col("n")) * dec38(col("n"))
                - dec38(col("n"))).cast("double"))
          .select(col("n"), col("na"), col("nn"), col("nr"), col("h"),
            (col("h") / col("tie_c")).as("h_tie"))
      },
      """WITH rows_ AS (
        |  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty
        |  FROM lineitem),
        |grid AS (
        |  SELECT qty, COUNT(*) AS cnt,
        |    CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_n,
        |    CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_r
        |  FROM rows_ GROUP BY 1),
        |ranked AS (
        |  SELECT *, CAST(SUM(cnt) OVER (ORDER BY qty) AS BIGINT) * 2 - cnt + 1
        |    AS rank2
        |  FROM grid),
        |agg AS (
        |  SELECT CAST(SUM(cnt_a) AS BIGINT) AS na,
        |         CAST(SUM(cnt_n) AS BIGINT) AS nn,
        |         CAST(SUM(cnt_r) AS BIGINT) AS nr,
        |         SUM(CAST(cnt_a AS HUGEINT) * rank2) AS ra_x2,
        |         SUM(CAST(cnt_n AS HUGEINT) * rank2) AS rn_x2,
        |         SUM(CAST(cnt_r AS HUGEINT) * rank2) AS rr_x2,
        |         SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
        |  FROM ranked),
        |fin AS (SELECT *, na + nn + nr AS n FROM agg),
        |hh AS (
        |  SELECT *,
        |    3.0 * (CAST(ra_x2 * ra_x2 AS DOUBLE) / CAST(na AS DOUBLE)
        |         + CAST(rn_x2 * rn_x2 AS DOUBLE) / CAST(nn AS DOUBLE)
        |         + CAST(rr_x2 * rr_x2 AS DOUBLE) / CAST(nr AS DOUBLE))
        |      / CAST(CAST(n AS HUGEINT) * (n + 1) AS DOUBLE)
        |      - 3.0 * CAST(n + 1 AS DOUBLE) AS h
        |  FROM fin)
        |SELECT n, na, nn, nr, h,
        |  h / (1.0 - CAST(tie3 AS DOUBLE)
        |         / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE)) AS h_tie
        |FROM hh""".stripMargin),

    // C117: Kendall tau-b — concordance association (quantity vs $10k
    // price band per flag) computed ENTIRELY on the joint distinct-value
    // grid: concordant/discordant pair counts are Σ n_a·n_b over grid
    // CELL pairs (grid ≤ 50 qty × ~11 bands per flag — the pair join is
    // O(|domain|²) broadcast work, never O(n²) row pairs, so the shape
    // survives any row count). Pairs tied on qty are excluded from C/D
    // and enter only the marginal tie terms, per standard tau-b:
    // (C−D)/√((n0−n1)(n0−n2)). Exact integers to the final sqrt.
    "q_kendall_tau" -> QueryDef.sql(
      (s, dir) => {
        val cells = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) div 1000000")
              .as("band"))
          .groupBy("flag", "qty", "band").agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // read by both sides of the cell pair join
        val a = cells.select(col("flag"), col("qty").as("q1"),
          col("band").as("b1"), col("cnt").as("c1"))
        val b = cells.select(col("flag").as("flag2"), col("qty").as("q2"),
          col("band").as("b2"), col("cnt").as("c2"))
        val cd = a.join(broadcast(b),
            col("flag") === col("flag2") && col("q1") < col("q2"))
          .groupBy("flag")
          .agg(sum(when(col("b1") < col("b2"), col("c1") * col("c2"))
              .otherwise(0L)).as("concordant"),
            sum(when(col("b1") > col("b2"), col("c1") * col("c2"))
              .otherwise(0L)).as("discordant"))
        val tx = cells.groupBy("flag", "qty").agg(sum("cnt").as("t"))
          .groupBy("flag")
          .agg(sum(expr("t * (t - 1) div 2")).as("tx"), sum("t").as("n"))
        val ty = cells.groupBy("flag", "band").agg(sum("cnt").as("t"))
          .groupBy("flag").agg(sum(expr("t * (t - 1) div 2")).as("ty"))
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        cd.join(tx, "flag").join(ty, "flag")
          .withColumn("n0", expr("n * (n - 1) div 2"))
          .select(col("flag"), col("n"), col("concordant"), col("discordant"),
            ((col("concordant") - col("discordant")).cast("double") /
              sqrt((dec38(col("n0") - col("tx")) * dec38(col("n0") - col("ty")))
                .cast("double"))).as("tau_b"))
          .orderBy("flag")
      },
      """WITH cells AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) // 1000000
        |           AS band,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.flag,
        |    CAST(SUM(CASE WHEN a.band < b.band THEN a.cnt * b.cnt ELSE 0 END)
        |      AS BIGINT) AS concordant,
        |    CAST(SUM(CASE WHEN a.band > b.band THEN a.cnt * b.cnt ELSE 0 END)
        |      AS BIGINT) AS discordant
        |  FROM cells a JOIN cells b ON a.flag = b.flag AND a.qty < b.qty
        |  GROUP BY 1),
        |tx AS (
        |  SELECT flag, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS tx,
        |         CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT flag, qty, CAST(SUM(cnt) AS BIGINT) AS t
        |        FROM cells GROUP BY 1, 2) g GROUP BY 1),
        |ty AS (
        |  SELECT flag, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS ty
        |  FROM (SELECT flag, band, CAST(SUM(cnt) AS BIGINT) AS t
        |        FROM cells GROUP BY 1, 2) g GROUP BY 1)
        |SELECT cd.flag, n, concordant, discordant,
        |  CAST(concordant - discordant AS DOUBLE) /
        |    sqrt(CAST(CAST(n * (n - 1) // 2 - tx AS HUGEINT)
        |                * (n * (n - 1) // 2 - ty) AS DOUBLE)) AS tau_b
        |FROM cd JOIN tx ON cd.flag = tx.flag JOIN ty ON cd.flag = ty.flag
        |ORDER BY cd.flag""".stripMargin),

    // C118: one-way ANOVA F — price (exact cents) across returnflag
    // groups via the closed-form sum decomposition: SSB = Σ S_j²/n_j −
    // S²/n, SSW = SST − SSB, F = (SSB/(k−1))/(SSW/(n−k)). One full-data
    // pass of map-side-combined conditional sums (DECIMAL(38,0) — Σy²
    // ≤ 6e22 at sf100, exact); the k=3 groups pivot into one row so
    // the double finish is a fixed-shape expression on both engines.
    "q_anova" -> QueryDef.sql(
      (s, dir) => {
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val zero = lit(0).cast(DecimalType(38, 0))
        val y = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        def t(sCol: String, nCol: String): Column =
          (dec38(col(sCol)) * dec38(col(sCol))).cast("double") /
            col(nCol).cast("double")
        y.agg(count(lit(1)).as("n"),
            sum(when(col("flag") === "A", 1L).otherwise(0L)).as("na"),
            sum(when(col("flag") === "N", 1L).otherwise(0L)).as("nn"),
            sum(when(col("flag") === "R", 1L).otherwise(0L)).as("nr"),
            sum(when(col("flag") === "A", dec38(col("cents"))).otherwise(zero))
              .as("sa"),
            sum(when(col("flag") === "N", dec38(col("cents"))).otherwise(zero))
              .as("sn"),
            sum(when(col("flag") === "R", dec38(col("cents"))).otherwise(zero))
              .as("sr"),
            sum(dec38(col("cents"))).as("s"),
            sum(dec38(col("cents")) * dec38(col("cents"))).as("ss"))
          .withColumn("ssb",
            t("sa", "na") + t("sn", "nn") + t("sr", "nr") - t("s", "n"))
          .withColumn("sst", col("ss").cast("double") - t("s", "n"))
          .select(col("n"), col("na"), col("nn"), col("nr"), col("ssb"),
            (col("sst") - col("ssb")).as("ssw"),
            ((col("ssb") / lit(2.0)) /
              ((col("sst") - col("ssb")) / (col("n") - 3).cast("double")))
              .as("f_stat"))
      },
      """WITH y AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |agg AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        |    CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        |    SUM(CASE WHEN flag = 'A' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS sa,
        |    SUM(CASE WHEN flag = 'N' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS sn,
        |    SUM(CASE WHEN flag = 'R' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS sr,
        |    SUM(CAST(cents AS HUGEINT)) AS s,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS ss
        |  FROM y),
        |fin AS (
        |  SELECT n, na, nn, nr,
        |    CAST(sa * sa AS DOUBLE) / CAST(na AS DOUBLE)
        |      + CAST(sn * sn AS DOUBLE) / CAST(nn AS DOUBLE)
        |      + CAST(sr * sr AS DOUBLE) / CAST(nr AS DOUBLE)
        |      - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
        |    CAST(ss AS DOUBLE) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) AS sst
        |  FROM agg)
        |SELECT n, na, nn, nr, ssb, sst - ssb AS ssw,
        |  (ssb / 2.0) / ((sst - ssb) / CAST(n - 3 AS DOUBLE)) AS f_stat
        |FROM fin""".stripMargin),

    // C120: Welch's two-sample t — price (exact cents) across the two
    // linestatus populations without assuming equal variances (the
    // parametric companion to q_mann_whitney). ONE map-combined pass of
    // conditional sums (n/Σy/Σy² per group, DECIMAL(38,0) exact); the
    // t statistic and Welch–Satterthwaite df are a fixed-shape double
    // finish over those six scalars, written in the identical
    // association order on both engines so the float64 bits agree.
    "q_welch_ttest" -> QueryDef.sql(
      (s, dir) => {
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val zero = lit(0).cast(DecimalType(38, 0))
        val y = Tables.lineitem(s, dir)
          .select(col("l_linestatus").as("st"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("cents"))
        y.agg(
            sum(when(col("st") === "F", 1L).otherwise(0L)).as("n1"),
            sum(when(col("st") === "O", 1L).otherwise(0L)).as("n2"),
            sum(when(col("st") === "F", dec38(col("cents"))).otherwise(zero))
              .as("s1"),
            sum(when(col("st") === "O", dec38(col("cents"))).otherwise(zero))
              .as("s2"),
            sum(when(col("st") === "F", dec38(col("cents")) * dec38(col("cents")))
              .otherwise(zero)).as("ss1"),
            sum(when(col("st") === "O", dec38(col("cents")) * dec38(col("cents")))
              .otherwise(zero)).as("ss2"))
          .withColumn("mean1", col("s1").cast("double") / col("n1").cast("double"))
          .withColumn("mean2", col("s2").cast("double") / col("n2").cast("double"))
          .withColumn("var1",
            ((col("ss1").cast("double")
              - (col("s1") * col("s1")).cast("double") / col("n1").cast("double"))
              / (col("n1") - 1).cast("double")))
          .withColumn("var2",
            ((col("ss2").cast("double")
              - (col("s2") * col("s2")).cast("double") / col("n2").cast("double"))
              / (col("n2") - 1).cast("double")))
          .withColumn("se1", col("var1") / col("n1").cast("double"))
          .withColumn("se2", col("var2") / col("n2").cast("double"))
          .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
            ((col("mean1") - col("mean2")) / sqrt(col("se1") + col("se2")))
              .as("t_stat"),
            (((col("se1") + col("se2")) * (col("se1") + col("se2"))) /
              (col("se1") * col("se1") / (col("n1") - 1).cast("double")
                + col("se2") * col("se2") / (col("n2") - 1).cast("double")))
              .as("welch_df"))
      },
      """WITH y AS (
        |  SELECT l_linestatus AS st,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    SUM(CASE WHEN st = 'F' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s1,
        |    SUM(CASE WHEN st = 'O' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s2,
        |    SUM(CASE WHEN st = 'F' THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |      AS ss1,
        |    SUM(CASE WHEN st = 'O' THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |      AS ss2
        |  FROM y),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
        |    (CAST(ss1 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      / CAST(n1 - 1 AS DOUBLE) AS var1,
        |    (CAST(ss2 AS DOUBLE) - CAST(s2 * s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      / CAST(n2 - 1 AS DOUBLE) AS var2
        |  FROM agg),
        |se AS (
        |  SELECT n1, n2, mean1, mean2,
        |    var1 / CAST(n1 AS DOUBLE) AS se1, var2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM m)
        |SELECT n1, n2, mean1, mean2,
        |  (mean1 - mean2) / sqrt(se1 + se2) AS t_stat,
        |  ((se1 + se2) * (se1 + se2)) /
        |    (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
        |      + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS welch_df
        |FROM se""".stripMargin),

    // C121: Jarque-Bera normality — skewness / excess kurtosis / JB per
    // returnflag on quantity, from EXACT raw power sums (Σx..Σx⁴ in
    // DECIMAL(38,0); x ≤ 50 so Σx⁴ ≤ 4e15 even at sf100). Central
    // moments and the statistic are a fixed-shape double finish per
    // group row — identical expression trees on both engines, so the
    // k=3 group rows hash exactly without any pivot.
    "q_jarque_bera" -> QueryDef.sql(
      (s, dir) => {
        // the bounded domain (x ≤ 50 → x⁴ ≤ 6.25e6) makes every power
        // sum a plain codegen'd LONG aggregate, exact to ~1.5e12 rows
        // (250× this sf100 pack; ANSI mode throws rather than corrupts
        // beyond it) — decimal sums measured ~2.5× slower on the same
        // single pass at sf100
        val y = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("x"))
        y.groupBy("flag")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("s1"),
            sum(expr("x * x")).as("s2"),
            sum(expr("x * x * x")).as("s3"),
            sum(expr("x * x * x * x")).as("s4"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mu", col("s1").cast("double") / col("nd"))
          .withColumn("m2",
            col("s2").cast("double") / col("nd") - col("mu") * col("mu"))
          .withColumn("m3",
            col("s3").cast("double") / col("nd")
              - lit(3.0) * col("mu") * (col("s2").cast("double") / col("nd"))
              + lit(2.0) * col("mu") * col("mu") * col("mu"))
          .withColumn("m4",
            col("s4").cast("double") / col("nd")
              - lit(4.0) * col("mu") * (col("s3").cast("double") / col("nd"))
              + lit(6.0) * col("mu") * col("mu")
                * (col("s2").cast("double") / col("nd"))
              - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
          .withColumn("skew", col("m3") / (col("m2") * sqrt(col("m2"))))
          .withColumn("kurt_excess",
            col("m4") / (col("m2") * col("m2")) - lit(3.0))
          .select(col("flag"), col("n"), col("skew"), col("kurt_excess"),
            (col("nd") / lit(6.0) * (col("skew") * col("skew")
              + col("kurt_excess") * col("kurt_excess") / lit(4.0))).as("jb"))
          .orderBy("flag")
      },
      """WITH y AS (
        |  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS x
        |  FROM lineitem),
        |agg AS (
        |  SELECT flag, COUNT(*) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS s1,
        |    SUM(CAST(x AS HUGEINT) * x) AS s2,
        |    SUM(CAST(x AS HUGEINT) * x * x) AS s3,
        |    SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
        |  FROM y GROUP BY 1),
        |mo AS (
        |  SELECT flag, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM agg),
        |ce AS (
        |  SELECT flag, n, nd, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM mo),
        |st AS (
        |  SELECT flag, n, nd,
        |    m3 / (m2 * sqrt(m2)) AS skew,
        |    m4 / (m2 * m2) - 3.0 AS kurt_excess
        |  FROM ce)
        |SELECT flag, n, skew, kurt_excess,
        |  nd / 6.0 * (skew * skew + kurt_excess * kurt_excess / 4.0) AS jb
        |FROM st ORDER BY flag""".stripMargin),

    // C122: Brown-Forsythe (median-Levene) variance homogeneity —
    // ANOVA's equal-variance assumption, tested robustly: per-group
    // MEDIANS of quantity come EXACTLY off the domain-bounded (flag,
    // qty) grid (≤50 distinct values — the only full-data pass is the
    // grid groupBy; the ×2 scale keeps even-n half-medians integral),
    // absolute deviations z = |2x − med2| are then summed over the
    // GRID weighted by cell counts (never a per-row rejoin), and the
    // one-way F on z pivots the k=3 groups to one row for the
    // fixed-shape double finish — the q_anova discipline end to end.
    "q_levene" -> QueryDef.sql(
      (s, dir) => {
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val zero = lit(0).cast(DecimalType(38, 0))
        val grid = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"))
          .groupBy("flag", "qty").agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // read by the scan, the medians AND the z sums
        val cum = ShardedWindow.runningSum(grid, Seq("flag"),
          expr("qty div 10"), Seq(col("qty")), col("cnt"), "cum")
        val med = cum
          .withColumn("nj", sum("cnt").over(
            Window.partitionBy("flag")))
          .groupBy("flag")
          .agg(max("nj").as("nj"),
            min(when(col("cum") >= expr("(nj + 1) div 2"), col("qty")))
              .as("lo"),
            min(when(col("cum") >= expr("nj div 2 + 1"), col("qty")))
              .as("hi"))
          .select(col("flag"), (col("lo") + col("hi")).as("med2"))
        val z = grid.join(broadcast(med), "flag")
          .withColumn("z", abs(col("qty") * 2 - col("med2")))
        def grp(f: String, c: Column): Column =
          sum(when(col("flag") === f, c).otherwise(zero))
        val agg = z.agg(
          sum(col("cnt")).as("n"),
          grp("A", dec38(col("cnt"))).as("na"),
          grp("N", dec38(col("cnt"))).as("nn"),
          grp("R", dec38(col("cnt"))).as("nr"),
          grp("A", dec38(col("cnt")) * dec38(col("z"))).as("sa"),
          grp("N", dec38(col("cnt")) * dec38(col("z"))).as("sn"),
          grp("R", dec38(col("cnt")) * dec38(col("z"))).as("sr"),
          sum(dec38(col("cnt")) * dec38(col("z"))).as("sz"),
          sum(dec38(col("cnt")) * dec38(col("z")) * dec38(col("z"))).as("szz"))
        def t(sCol: String, nCol: String): Column =
          (dec38(col(sCol)) * dec38(col(sCol))).cast("double") /
            col(nCol).cast("double")
        agg
          .withColumn("ssb",
            t("sa", "na") + t("sn", "nn") + t("sr", "nr") - t("sz", "n"))
          .withColumn("sst", col("szz").cast("double") - t("sz", "n"))
          .select(col("n").cast("long").as("n"), col("ssb"),
            (col("sst") - col("ssb")).as("ssw"),
            ((col("ssb") / lit(2.0)) /
              ((col("sst") - col("ssb")) / (col("n") - 3).cast("double")))
              .as("f_stat"))
      },
      """WITH grid AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT flag, qty, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY qty) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY flag) AS BIGINT) AS nj
        |  FROM grid),
        |med AS (
        |  SELECT flag,
        |    MIN(CASE WHEN cum >= (nj + 1) // 2 THEN qty END)
        |      + MIN(CASE WHEN cum >= nj // 2 + 1 THEN qty END) AS med2
        |  FROM cum GROUP BY 1),
        |z AS (
        |  SELECT g.flag, g.cnt, ABS(g.qty * 2 - m.med2) AS z
        |  FROM grid g JOIN med m ON g.flag = m.flag),
        |agg AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |    SUM(CASE WHEN flag = 'A' THEN CAST(cnt AS HUGEINT) ELSE 0 END) AS na,
        |    SUM(CASE WHEN flag = 'N' THEN CAST(cnt AS HUGEINT) ELSE 0 END) AS nn,
        |    SUM(CASE WHEN flag = 'R' THEN CAST(cnt AS HUGEINT) ELSE 0 END) AS nr,
        |    SUM(CASE WHEN flag = 'A' THEN CAST(cnt AS HUGEINT) * z ELSE 0 END)
        |      AS sa,
        |    SUM(CASE WHEN flag = 'N' THEN CAST(cnt AS HUGEINT) * z ELSE 0 END)
        |      AS sn,
        |    SUM(CASE WHEN flag = 'R' THEN CAST(cnt AS HUGEINT) * z ELSE 0 END)
        |      AS sr,
        |    SUM(CAST(cnt AS HUGEINT) * z) AS sz,
        |    SUM(CAST(cnt AS HUGEINT) * z * z) AS szz
        |  FROM z),
        |fin AS (
        |  SELECT n,
        |    CAST(sa * sa AS DOUBLE) / CAST(na AS DOUBLE)
        |      + CAST(sn * sn AS DOUBLE) / CAST(nn AS DOUBLE)
        |      + CAST(sr * sr AS DOUBLE) / CAST(nr AS DOUBLE)
        |      - CAST(sz * sz AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
        |    CAST(szz AS DOUBLE)
        |      - CAST(sz * sz AS DOUBLE) / CAST(n AS DOUBLE) AS sst
        |  FROM agg)
        |SELECT n, ssb, sst - ssb AS ssw,
        |  (ssb / 2.0) / ((sst - ssb) / CAST(n - 3 AS DOUBLE)) AS f_stat
        |FROM fin""".stripMargin),

    // C125: directional association rules — q_basket_pairs exposes the
    // symmetric pair stats; rules add the DIRECTION: confidence(a→b) =
    // P(b ∈ basket | a ∈ basket), the quantity a recommender actually
    // thresholds. Same scale shape (per-basket pair Generate fan-out,
    // map-combined item/basket counts, broadcast corpus total); each
    // surviving pair emits both rule directions via one 2-way Generate,
    // and everything downstream of the pair counts is exact floor-ppm
    // on count ratios. Min support 3 baskets; top-100 by confidence.
    "q_assoc_rules" -> QueryDef.sql(
      (s, dir) => {
        val baskets = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        val pairs = baskets
          .select(col("items"), posexplode(col("items")).as(Seq("i", "a")))
          .select(col("a"),
            explode(expr("slice(items, i + 2, size(items) - i - 1)")).as("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("pair_orders"))
          .filter(col("pair_orders") >= 3)
        val items = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("pk"))
          .agg(countDistinct(col("l_orderkey")).as("item_orders"))
        val nb = Tables.lineitem(s, dir)
          .agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        val rules = pairs
          .select(explode(array(
            struct(col("a").as("antecedent"), col("b").as("consequent"),
              col("pair_orders")),
            struct(col("b").as("antecedent"), col("a").as("consequent"),
              col("pair_orders")))).as("r"))
          .select("r.antecedent", "r.consequent", "r.pair_orders")
        rules
          .join(items.withColumnRenamed("item_orders", "orders_ante"),
            col("antecedent") === col("pk")).drop("pk")
          .join(items.withColumnRenamed("item_orders", "orders_cons"),
            col("consequent") === col("pk")).drop("pk")
          .crossJoin(broadcast(nb))
          .select(col("antecedent"), col("consequent"), col("pair_orders"),
            expr("pair_orders * 1000000 div orders_ante")
              .as("confidence_ppm"),
            expr("CAST(pair_orders AS DECIMAL(38,0)) * n_baskets * 1000000" +
              " div (CAST(orders_ante AS DECIMAL(38,0)) * orders_cons)")
              .as("lift_ppm"))
          .orderBy(desc("confidence_ppm"), desc("pair_orders"),
            col("antecedent"), col("consequent"))
          .limit(100)
      },
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS pair_orders
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, pair_orders FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, pair_orders FROM pairs),
        |items AS (SELECT pk, COUNT(*) AS item_orders FROM li GROUP BY 1),
        |nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM li)
        |SELECT antecedent, consequent, pair_orders,
        |  pair_orders * 1000000 // a.item_orders AS confidence_ppm,
        |  CAST(CAST(pair_orders AS HUGEINT) * n_baskets * 1000000
        |    // (CAST(a.item_orders AS HUGEINT) * c.item_orders) AS BIGINT)
        |    AS lift_ppm
        |FROM rules JOIN items a ON rules.antecedent = a.pk
        |JOIN items c ON rules.consequent = c.pk, nb
        |ORDER BY confidence_ppm DESC, pair_orders DESC, antecedent, consequent
        |LIMIT 100""".stripMargin),

    // C129: cohort lifetime value — customers grouped by first-order
    // month, revenue accumulated along cohort age: the (cohort, age) →
    // cumulative-LTV-per-customer matrix a growth dashboard plots. Two
    // map-combined full-data passes (first-order month per customer,
    // then the (cohort, age) revenue rollup); the cumulative sum rides
    // the ≤ #months-wide matrix per cohort. Revenue in exact cents;
    // per-customer LTV by integer floor division.
    "q_cohort_ltv" -> QueryDef.sql(
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("ym"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        val first = o.groupBy("o_custkey").agg(min("ym").as("ym0"))
        val sized = first.groupBy("ym0").agg(count(lit(1)).as("cohort_size"))
        val aged = o.join(first, "o_custkey")
          .groupBy(col("ym0").as("cohort_ym"), (col("ym") - col("ym0")).as("age"))
          .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
        val w = Window.partitionBy("cohort_ym").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        aged.withColumn("cum_cents", sum("rev_cents").over(w))
          .join(sized.withColumnRenamed("ym0", "cohort_ym"), "cohort_ym")
          .select(col("cohort_ym"), col("age"), col("n_orders"),
            col("rev_cents"),
            expr("cum_cents div cohort_size").as("ltv_cents_per_cust"))
          .orderBy("cohort_ym", "age")
      },
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
        |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |f AS (SELECT o_custkey, MIN(ym) AS ym0 FROM o GROUP BY 1),
        |s AS (SELECT ym0, COUNT(*) AS cohort_size FROM f GROUP BY 1),
        |a AS (
        |  SELECT f.ym0 AS cohort_ym, o.ym - f.ym0 AS age, COUNT(*) AS n_orders,
        |    CAST(SUM(cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN f ON o.o_custkey = f.o_custkey GROUP BY 1, 2),
        |c AS (
        |  SELECT cohort_ym, age, n_orders, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_ym ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM a)
        |SELECT cohort_ym, age, n_orders, rev_cents,
        |  CAST(cum_cents // s.cohort_size AS BIGINT) AS ltv_cents_per_cust
        |FROM c JOIN s ON c.cohort_ym = s.ym0 ORDER BY 1, 2""".stripMargin),

    // C130: gaps-and-islands — longest consecutive-month order streak
    // per customer, reported as a streak-length histogram (the
    // retention-habit view). The classic island key ym − row_number()
    // is constant exactly along consecutive runs; windows partition by
    // customer (millions of small partitions — no ShardedWindow
    // needed), everything downstream is map-combined counts.
    "q_order_streaks" -> QueryDef.sql(
      (s, dir) => {
        val cm = Tables.orders(s, dir).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("ym"))
          .distinct()
        val w = Window.partitionBy("o_custkey").orderBy("ym")
        cm.withColumn("island", col("ym") - row_number().over(w))
          .groupBy("o_custkey", "island").agg(count(lit(1)).as("len"))
          .groupBy("o_custkey").agg(max("len").as("best_streak"))
          .groupBy("best_streak").agg(count(lit(1)).as("n_customers"))
          .orderBy("best_streak")
      },
      """WITH cm AS (
        |  SELECT DISTINCT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
        |  FROM orders),
        |i AS (
        |  SELECT o_custkey,
        |    ym - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ym)
        |      AS island
        |  FROM cm),
        |st AS (SELECT o_custkey, island, COUNT(*) AS len FROM i GROUP BY 1, 2),
        |b AS (SELECT o_custkey, MAX(len) AS best_streak FROM st GROUP BY 1)
        |SELECT best_streak, COUNT(*) AS n_customers
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin),

    // C131: 1-D Wasserstein (earth mover's) distance — the INTEGRAL of
    // the CDF gap between the two linestatus quantity distributions,
    // where q_ks_test reports only its max: how much probability mass
    // must move, and how far. On the domain-bounded grid the discrete
    // W1 = Σ_x |F1(x) − F2(x)|·Δx is exact floor-ppm end to end: one
    // map-combined grid pass, cumulatives through ShardedWindow,
    // pairwise Δx to the next grid value via lead() on the ≤50-row
    // grid. Output in ppm·quantity units.
    "q_wasserstein" -> QueryDef.sql(
      (s, dir) => {
        val rows = Tables.lineitem(s, dir)
          .select(col("l_linestatus").as("st"),
            expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"))
        // checkpoint: the nested sharded scans + the totals agg would
        // otherwise re-run the full-data groupBy ~5x (36.6 -> 9 s at
        // sf100)
        val grid = rows.groupBy("qty").agg(
          sum(when(col("st") === "F", 1L).otherwise(0L)).as("cnt_f"),
          sum(when(col("st") === "O", 1L).otherwise(0L)).as("cnt_o"))
          .localCheckpoint()
        val cum = ShardedWindow.runningSum(
          ShardedWindow.runningSum(grid, Seq.empty, expr("qty div 10"),
            Seq(col("qty")), col("cnt_f"), "cum_f"),
          Seq.empty, expr("qty div 10"), Seq(col("qty")), col("cnt_o"), "cum_o")
        val tot = grid.agg(sum("cnt_f").as("n_f"), sum("cnt_o").as("n_o"))
        val wGrid = Window.orderBy("qty")
        cum.crossJoin(broadcast(tot))
          .withColumn("dx",
            coalesce(lead("qty", 1).over(wGrid) - col("qty"), lit(0L)))
          .withColumn("gap_ppm",
            abs(expr("cum_f * 1000000 div n_f") -
              expr("cum_o * 1000000 div n_o")))
          .agg(max("n_f").as("n_f"), max("n_o").as("n_o"),
            sum(col("gap_ppm") * col("dx")).as("w1_ppm"),
            max("gap_ppm").as("ks_ppm"))
      },
      """WITH rows_ AS (
        |  SELECT l_linestatus AS st, CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty
        |  FROM lineitem),
        |grid AS (
        |  SELECT qty,
        |    CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
        |    CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o
        |  FROM rows_ GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt_f) AS BIGINT) AS n_f,
        |               CAST(SUM(cnt_o) AS BIGINT) AS n_o FROM grid),
        |c AS (
        |  SELECT qty,
        |    CAST(SUM(cnt_f) OVER (ORDER BY qty) AS BIGINT) AS cum_f,
        |    CAST(SUM(cnt_o) OVER (ORDER BY qty) AS BIGINT) AS cum_o,
        |    COALESCE(LEAD(qty, 1) OVER (ORDER BY qty) - qty, 0) AS dx
        |  FROM grid),
        |g AS (
        |  SELECT dx,
        |    ABS(cum_f * 1000000 // n_f - cum_o * 1000000 // n_o) AS gap_ppm
        |  FROM c, tot)
        |SELECT (SELECT n_f FROM tot) AS n_f, (SELECT n_o FROM tot) AS n_o,
        |  CAST(SUM(gap_ppm * dx) AS BIGINT) AS w1_ppm,
        |  CAST(MAX(gap_ppm) AS BIGINT) AS ks_ppm
        |FROM g""".stripMargin),

    // C132: two-proportion z-test — does the "large order line" rate
    // (quantity > 25) differ between the F and O populations: the
    // binary-outcome companion to q_welch_ttest. ONE map-combined
    // conditional-count pass; pooled-variance z as the fixed-shape
    // double finish over five exact integers.
    "q_prop_ztest" -> QueryDef.sql(
      (s, dir) => {
        val y = Tables.lineitem(s, dir)
          .select(col("l_linestatus").as("st"),
            (expr("CAST(ROUND(l_quantity, 0) AS BIGINT)") > 25).as("big"))
        y.agg(
            sum(when(col("st") === "F", 1L).otherwise(0L)).as("n1"),
            sum(when(col("st") === "O", 1L).otherwise(0L)).as("n2"),
            sum(when(col("st") === "F" && col("big"), 1L).otherwise(0L))
              .as("x1"),
            sum(when(col("st") === "O" && col("big"), 1L).otherwise(0L))
              .as("x2"))
          .withColumn("p1", col("x1").cast("double") / col("n1").cast("double"))
          .withColumn("p2", col("x2").cast("double") / col("n2").cast("double"))
          .withColumn("pp",
            (col("x1") + col("x2")).cast("double") /
              (col("n1") + col("n2")).cast("double"))
          .select(col("n1"), col("n2"), col("x1"), col("x2"),
            col("p1"), col("p2"),
            ((col("p1") - col("p2")) /
              sqrt(col("pp") * (lit(1.0) - col("pp")) *
                (lit(1.0) / col("n1").cast("double")
                  + lit(1.0) / col("n2").cast("double")))).as("z"))
      },
      """WITH y AS (
        |  SELECT l_linestatus AS st,
        |    CAST(ROUND(l_quantity, 0) AS BIGINT) > 25 AS big
        |  FROM lineitem),
        |agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN st = 'F' AND big THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x1,
        |    CAST(SUM(CASE WHEN st = 'O' AND big THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x2
        |  FROM y),
        |m AS (
        |  SELECT n1, n2, x1, x2,
        |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
        |    CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS pp
        |  FROM agg)
        |SELECT n1, n2, x1, x2, p1, p2,
        |  (p1 - p2) / sqrt(pp * (1.0 - pp)
        |    * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS z
        |FROM m""".stripMargin),

    // C136: EXACT rolling 30-day distinct customers — distinct-over-
    // sliding-window, the aggregation windows can't express (distinct
    // doesn't decompose over frames). SWEEP-LINE form: a customer is
    // active on d iff d lands in [day, day+29] of some order day, so
    // each customer's order days collapse into coverage INTERVALS
    // (consecutive days ≤29 apart merge — one lag + island pass over
    // millions of small per-customer partitions), each interval emits
    // ±1 boundary deltas, and a prefix sum over the ≤#days change
    // points recovers every day's exact count (runs between change
    // points expand through one bounded Generate). Shuffle volume is
    // O(distinct (customer, day)) — the naive 30× fan-out + corpus-
    // wide COUNT DISTINCT measured 10.2 s at sf1; this shape replaces
    // it with interval algebra on tiny relations.
    "q_rolling_distinct" -> QueryDef.sql(
      (s, dir) => {
        val du = Tables.orders(s, dir)
          .select(col("o_custkey"),
            datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
              .cast("long").as("day"))
          .distinct()
        val mx = du.agg(max("day").as("mxd"))
        val w = Window.partitionBy("o_custkey").orderBy("day")
        val iv = du
          .withColumn("prev", lag("day", 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("day") - col("prev") > 29, 1L)
              .otherwise(0L))
          .withColumn("island", sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("o_custkey", "island")
          .agg(min("day").as("s"), (max("day") + 29).as("e"))
        val deltas = iv.select(col("s").as("d"), lit(1L).as("delta"))
          .unionAll(iv.select((col("e") + 1).as("d"), lit(-1L).as("delta")))
          .groupBy("d").agg(sum("delta").as("delta"))
        val wd = Window.orderBy("d") // change points only: a bounded grid
        deltas
          .withColumn("active", sum("delta").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_d",
            lead("d", 1).over(Window.orderBy("d")))
          .crossJoin(broadcast(mx))
          // boundary deltas past mxd must not expand (sequence() would
          // run DESCENDING from d > mxd and re-emit tail days)
          .filter(col("active") > 0 && col("d") <= col("mxd"))
          .withColumn("day", explode(sequence(col("d"),
            least(coalesce(col("next_d") - 1, col("mxd")), col("mxd")))))
          .select(col("day"), col("active").as("active_customers"))
          .orderBy("day")
      },
      """WITH du AS (
        |  SELECT DISTINCT o_custkey,
        |    date_diff('day', DATE '1992-01-01', o_orderdate) AS day
        |  FROM orders),
        |mx AS (SELECT MAX(day) AS mxd FROM du),
        |f AS (
        |  SELECT o_custkey, day + t.i AS d
        |  FROM du CROSS JOIN (SELECT unnest(range(0, 30)) AS i) t)
        |SELECT d AS day, COUNT(DISTINCT o_custkey) AS active_customers
        |FROM f, mx WHERE d <= mxd GROUP BY 1 ORDER BY 1""".stripMargin),

    // C137: column profiling — the data-quality report every pipeline
    // runs before trusting a new table: nulls, distincts, min/max and
    // the modal value per column. One value-grouped pass per profiled
    // column (exact; a production profiler would sketch all columns in
    // a single pass — the per-column groupBy here is the exact
    // reference); the modal value is the (count, value) struct max,
    // which both engines express deterministically (max count, then
    // max value). Numeric columns profile as digit strings so the
    // report schema is uniform.
    "q_data_profile" -> QueryDef.sql(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_returnflag").as("returnflag"),
          col("l_linestatus").as("linestatus"),
          expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").cast("string")
            .as("quantity"),
          col("l_suppkey").cast("string").as("suppkey"))
        val profiles = Seq("returnflag", "linestatus", "quantity", "suppkey")
          .map { c =>
            li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
              .agg(
                count(when(col("v").isNotNull, 1)).as("n_distinct"),
                coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
                  .as("n_nulls"),
                min("v").as("min_val"), max("v").as("max_val"),
                max(struct(col("cnt"), col("v"))).as("top"))
              .select(lit(c).as("column_name"), col("n_distinct"),
                col("n_nulls"), col("min_val"), col("max_val"),
                col("top").getField("v").as("top_value"),
                col("top").getField("cnt").as("top_count"))
          }
        profiles.reduce(_ unionAll _).orderBy("column_name")
      },
      {
        def block(c: String) =
          s"""g_$c AS (SELECT $c AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
             |p_$c AS (
             |  SELECT '$c' AS column_name,
             |    CAST(COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
             |      AS n_distinct,
             |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt END), 0)
             |      AS BIGINT) AS n_nulls,
             |    MIN(v) AS min_val, MAX(v) AS max_val,
             |    (SELECT MAX(v) FROM g_$c
             |     WHERE cnt = (SELECT MAX(cnt) FROM g_$c)) AS top_value,
             |    (SELECT CAST(MAX(cnt) AS BIGINT) FROM g_$c) AS top_count
             |  FROM g_$c)""".stripMargin
        val cols = Seq("returnflag", "linestatus", "quantity", "suppkey")
        s"""WITH li AS (
           |  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           |    CAST(CAST(ROUND(l_quantity, 0) AS BIGINT) AS VARCHAR)
           |      AS quantity,
           |    CAST(l_suppkey AS VARCHAR) AS suppkey
           |  FROM lineitem),
           |${cols.map(block).mkString(",\n")}
           |${cols.map(c => s"SELECT * FROM p_$c").mkString("\nUNION ALL\n")}
           |ORDER BY column_name""".stripMargin
      }),

    // C138: referential-integrity audit — orphan-row counts for every
    // foreign-key relationship (the DQ gate a warehouse load runs):
    // one left join + conditional count per relationship, dimension
    // keys distinct'd first. The synthetic tables are clean, so the
    // audit proves zeros — the machinery is what ships.
    "q_integrity_audit" -> QueryDef.sql(
      (s, dir) => {
        def check(name: String, fact: DataFrame, dim: DataFrame): DataFrame =
          fact.join(dim.distinct(), fact.col("k") === dim.col("rk"), "left")
            .agg(count(lit(1)).as("n_rows"),
              sum(when(col("rk").isNull, 1L).otherwise(0L)).as("n_orphans"))
            .select(lit(name).as("relationship"), col("n_rows"),
              col("n_orphans"),
              expr("n_orphans * 1000000 div n_rows").as("orphan_ppm"))
        val checks = Seq(
          check("lineitem_orders",
            Tables.lineitem(s, dir).select(col("l_orderkey").as("k")),
            Tables.orders(s, dir).select(col("o_orderkey").as("rk"))),
          check("lineitem_part",
            Tables.lineitem(s, dir).select(col("l_partkey").as("k")),
            Tables.part(s, dir).select(col("p_partkey").as("rk"))),
          check("orders_customer",
            Tables.orders(s, dir).select(col("o_custkey").as("k")),
            Tables.customer(s, dir).select(col("c_custkey").as("rk"))),
          check("supplier_nation",
            Tables.supplier(s, dir).select(col("s_nationkey").as("k")),
            Tables.nation(s, dir).select(col("n_nationkey").as("rk"))))
        checks.reduce(_ unionAll _).orderBy("relationship")
      },
      {
        def block(name: String, fk: String, ft: String, pk: String, dt: String) =
          s"""SELECT '$name' AS relationship,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN d.rk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_orphans,
             |  CAST(SUM(CASE WHEN d.rk IS NULL THEN 1 ELSE 0 END) * 1000000
             |    // COUNT(*) AS BIGINT) AS orphan_ppm
             |FROM (SELECT $fk AS k FROM $ft) f
             |LEFT JOIN (SELECT DISTINCT $pk AS rk FROM $dt) d ON f.k = d.rk"""
            .stripMargin
        Seq(
          block("lineitem_orders", "l_orderkey", "lineitem", "o_orderkey", "orders"),
          block("lineitem_part", "l_partkey", "lineitem", "p_partkey", "part"),
          block("orders_customer", "o_custkey", "orders", "c_custkey", "customer"),
          block("supplier_nation", "s_nationkey", "supplier", "n_nationkey", "nation"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
      }),

    // C140: k-anonymity audit — before customer attributes feed a
    // training corpus, how re-identifiable are they? Equivalence
    // classes over the quasi-identifier tuple (nation, market segment,
    // $1k balance band), then for each k threshold the classes and
    // records at risk (class size < k). One map-combined class-size
    // pass; the 4 thresholds fan out over the tiny class relation.
    // The privacy companion to text_redact_pii.
    "q_kanonymity" -> QueryDef.sql(
      (s, dir) => {
        val classes = Tables.customer(s, dir)
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(ROUND(c_acctbal, 0) AS BIGINT) div 1000").as("bal_band"))
          .agg(count(lit(1)).as("sz"))
        classes
          .withColumn("k", explode(array(lit(2L), lit(5L), lit(10L), lit(20L))))
          .groupBy("k")
          .agg(count(lit(1)).as("n_classes"),
            sum(when(col("sz") < col("k"), 1L).otherwise(0L))
              .as("classes_at_risk"),
            sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
              .as("records_at_risk"),
            expr("sum(CASE WHEN sz < k THEN sz ELSE 0 END) * 1000000" +
              " div sum(sz)").as("risk_ppm"))
          .orderBy("k")
      },
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(ROUND(c_acctbal, 0) AS BIGINT) // 1000 AS bal_band,
        |    COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2, 3),
        |f AS (SELECT k, sz FROM classes
        |      CROSS JOIN (SELECT unnest([2, 5, 10, 20]) AS k) t)
        |SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_at_risk,
        |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS records_at_risk,
        |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) * 1000000
        |    // SUM(sz) AS BIGINT) AS risk_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin),

    // C142: decision-stump split finder — the inner loop of tree
    // learning: for every candidate threshold t on quantity, the
    // Gini impurity of the (x ≤ t) split predicting returnflag='R',
    // entirely on the domain-bounded grid: per-value class counts in
    // one map-combined pass, prefix sums through ShardedWindow, and
    // the impurity as exact floor-ppm (squared class counts in
    // DECIMAL(38,0) over nL²/nR²). Emits the full split profile
    // ordered by threshold — the argmin is the reader's one-liner,
    // and the whole curve is what a tree library actually consumes.
    "q_gini_split" -> QueryDef.sql(
      (s, dir) => {
        val rows = Tables.lineitem(s, dir)
          .select(expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").as("qty"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("pos"))
        // checkpoint: nested sharded scans re-ran the 600M-row grid
        // aggregation ~5x without it (99.6 s at sf100; the per-read
        // ROUND+CASE projection is what made each re-run expensive)
        val grid = rows.groupBy("qty").agg(
          count(lit(1)).as("cnt"), sum("pos").as("p"))
          .localCheckpoint()
        val cum = ShardedWindow.runningSum(
          ShardedWindow.runningSum(grid, Seq.empty, expr("qty div 10"),
            Seq(col("qty")), col("cnt"), "cum_n"),
          Seq.empty, expr("qty div 10"), Seq(col("qty")), col("p"), "cum_p")
        val tot = grid.agg(sum("cnt").as("n"), sum("p").as("pt"))
        def giniPpm(pos: String, n: String): String =
          s"1000000 - (CAST($pos AS DECIMAL(38,0)) * $pos" +
            s" + CAST($n - $pos AS DECIMAL(38,0)) * ($n - $pos)) * 1000000" +
            s" div (CAST($n AS DECIMAL(38,0)) * $n)"
        cum.crossJoin(broadcast(tot))
          .withColumn("n_l", col("cum_n"))
          .withColumn("p_l", col("cum_p"))
          .withColumn("n_r", col("n") - col("cum_n"))
          .withColumn("p_r", col("pt") - col("cum_p"))
          .filter(col("n_l") > 0 && col("n_r") > 0)
          .withColumn("gini_l", expr(giniPpm("p_l", "n_l")))
          .withColumn("gini_r", expr(giniPpm("p_r", "n_r")))
          .withColumn("gini_parent", expr(giniPpm("pt", "n")))
          .select(col("qty").as("threshold"),
            col("n_l"), col("n_r"),
            expr("(n_l * gini_l + n_r * gini_r) div n").as("split_gini_ppm"),
            col("gini_parent").as("parent_gini_ppm"))
          .withColumn("gain_ppm",
            col("parent_gini_ppm") - col("split_gini_ppm"))
          .orderBy("threshold")
      },
      """WITH rows_ AS (
        |  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        |  FROM lineitem),
        |grid AS (
        |  SELECT qty, COUNT(*) AS cnt, CAST(SUM(pos) AS BIGINT) AS p
        |  FROM rows_ GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |               CAST(SUM(p) AS BIGINT) AS pt FROM grid),
        |c AS (
        |  SELECT qty,
        |    CAST(SUM(cnt) OVER (ORDER BY qty) AS BIGINT) AS n_l,
        |    CAST(SUM(p) OVER (ORDER BY qty) AS BIGINT) AS p_l
        |  FROM grid),
        |sp AS (
        |  SELECT qty AS threshold, n_l, p_l, n - n_l AS n_r, pt - p_l AS p_r,
        |         n, pt
        |  FROM c, tot WHERE n_l > 0 AND n - n_l > 0),
        |g AS (
        |  SELECT threshold, n_l, n_r, n,
        |    1000000 - (CAST(p_l AS HUGEINT) * p_l
        |      + CAST(n_l - p_l AS HUGEINT) * (n_l - p_l)) * 1000000
        |      // (CAST(n_l AS HUGEINT) * n_l) AS gini_l,
        |    1000000 - (CAST(p_r AS HUGEINT) * p_r
        |      + CAST(n_r - p_r AS HUGEINT) * (n_r - p_r)) * 1000000
        |      // (CAST(n_r AS HUGEINT) * n_r) AS gini_r,
        |    1000000 - (CAST(pt AS HUGEINT) * pt
        |      + CAST(n - pt AS HUGEINT) * (n - pt)) * 1000000
        |      // (CAST(n AS HUGEINT) * n) AS gini_parent
        |  FROM sp)
        |SELECT threshold, n_l, n_r,
        |  CAST((n_l * gini_l + n_r * gini_r) // n AS BIGINT)
        |    AS split_gini_ppm,
        |  CAST(gini_parent AS BIGINT) AS parent_gini_ppm,
        |  CAST(gini_parent - (n_l * gini_l + n_r * gini_r) // n AS BIGINT)
        |    AS gain_ppm
        |FROM g ORDER BY threshold""".stripMargin),

    // C145: two-way variance decomposition — how much of price
    // variance is the return flag, how much the line status, and how
    // much their INTERACTION (the unbalanced Type-I split): SSA =
    // Σs_i²/n_i − s²/n, SSB on the other margin, SSW = Σy² −
    // Σs_ij²/n_ij, SSAB the remainder. ONE conditional-sum pass pivots
    // the 3×2 cells into a single row (the q_anova discipline), so
    // every Σs²/n is a FIXED-SHAPE double expression — no
    // order-dependent double summation; empty cells (TPC-H pairs A/R
    // only with F) contribute literal 0 terms.
    "q_two_way_anova" -> QueryDef.sql(
      (s, dir) => {
        val dec38 = (c: Column) => c.cast(DecimalType(38, 0))
        val zero = lit(0).cast(DecimalType(38, 0))
        val y = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("fa"),
            col("l_linestatus").as("fb"),
            expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
              .as("cents"))
        val cellKeys = Seq("A" -> "F", "A" -> "O", "N" -> "F",
          "N" -> "O", "R" -> "F", "R" -> "O")
        def cellCond(a: String, b: String): Column =
          col("fa") === a && col("fb") === b
        val aggs =
          cellKeys.flatMap { case (a, b) =>
            Seq(
              sum(when(cellCond(a, b), 1L).otherwise(0L)).as(s"n_$a$b"),
              sum(when(cellCond(a, b), dec38(col("cents"))).otherwise(zero))
                .as(s"s_$a$b"))
          } ++ Seq(
            count(lit(1)).as("n"),
            sum(dec38(col("cents"))).as("s"),
            sum(dec38(col("cents")) * col("cents")).as("ss"))
        val one = y.agg(aggs.head, aggs.tail: _*)
        // s²/n as a double, 0 for an empty group — identical shape in SQL
        def t(sCol: String, nCol: String): String =
          s"CASE WHEN $nCol = 0 THEN 0.0 ELSE " +
            s"CAST($sCol * $sCol AS DOUBLE) / CAST($nCol AS DOUBLE) END"
        def margin(pairs: Seq[(String, String)]): (String, String) = (
          pairs.map { case (n, _) => n }.mkString("(", " + ", ")"),
          pairs.map { case (_, s0) => s0 }.mkString("(", " + ", ")"))
        val (aF, aO, nF, nO, rF, rO) = ("AF", "AO", "NF", "NO", "RF", "RO")
        val tA = Seq("A", "N", "R").map { f =>
          val (nm, sm) = margin(Seq(s"n_${f}F" -> s"s_${f}F",
            s"n_${f}O" -> s"s_${f}O"))
          t(sm, nm)
        }.mkString("(", " + ", ")")
        val tB = Seq("F", "O").map { st =>
          val (nm, sm) = margin(Seq(s"n_A$st" -> s"s_A$st",
            s"n_N$st" -> s"s_N$st", s"n_R$st" -> s"s_R$st"))
          t(sm, nm)
        }.mkString("(", " + ", ")")
        val tC = Seq(aF, aO, nF, nO, rF, rO)
          .map(c => t(s"s_$c", s"n_$c")).mkString("(", " + ", ")")
        val tG = t("s", "n")
        one
          .withColumn("ssa", expr(s"$tA - $tG"))
          .withColumn("ssb", expr(s"$tB - $tG"))
          .withColumn("ssab", expr(s"$tC - $tA - $tB + $tG"))
          .withColumn("ssw", expr(s"CAST(ss AS DOUBLE) - $tC"))
          .select(col("n"), col("ssa"), col("ssb"), col("ssab"), col("ssw"),
            (col("ssab") /
              (col("ssa") + col("ssb") + col("ssab") + col("ssw")))
              .as("interaction_share"))
      },
      {
        def cond(a: String, b: String, v: String) =
          s"CASE WHEN fa = '$a' AND fb = '$b' THEN $v ELSE 0 END"
        val cells = Seq("A" -> "F", "A" -> "O", "N" -> "F", "N" -> "O",
          "R" -> "F", "R" -> "O")
        val aggs = cells.map { case (a, b) =>
          s"""    CAST(SUM(${cond(a, b, "1")}) AS BIGINT) AS n_$a$b,
             |    SUM(${cond(a, b, "CAST(cents AS HUGEINT)")}) AS s_$a$b"""
            .stripMargin
        }.mkString(",\n")
        def t(sCol: String, nCol: String): String =
          s"CASE WHEN $nCol = 0 THEN 0.0 ELSE " +
            s"CAST($sCol * $sCol AS DOUBLE) / CAST($nCol AS DOUBLE) END"
        val tA = Seq("A", "N", "R").map { f =>
          t(s"(s_${f}F + s_${f}O)", s"(n_${f}F + n_${f}O)")
        }.mkString("(", " + ", ")")
        val tB = Seq("F", "O").map { st =>
          t(s"(s_A$st + s_N$st + s_R$st)", s"(n_A$st + n_N$st + n_R$st)")
        }.mkString("(", " + ", ")")
        val tC = cells.map { case (a, b) => t(s"s_$a$b", s"n_$a$b") }
          .mkString("(", " + ", ")")
        val tG = t("s", "n")
        s"""WITH y AS (
           |  SELECT l_returnflag AS fa, l_linestatus AS fb,
           |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
           |  FROM lineitem),
           |agg AS (
           |  SELECT
           |$aggs,
           |    COUNT(*) AS n,
           |    SUM(CAST(cents AS HUGEINT)) AS s,
           |    SUM(CAST(cents AS HUGEINT) * cents) AS ss
           |  FROM y),
           |d AS (
           |  SELECT n,
           |    $tA - $tG AS ssa,
           |    $tB - $tG AS ssb,
           |    $tC - $tA - $tB + $tG AS ssab,
           |    CAST(ss AS DOUBLE) - $tC AS ssw
           |  FROM agg)
           |SELECT n, ssa, ssb, ssab, ssw,
           |  ssab / (ssa + ssb + ssab + ssw) AS interaction_share
           |FROM d""".stripMargin
      })
  )

  /** floor(1e6*log10(1+1/d)) for d=1..9, as shared literals (never a
    * runtime log10 — engines could round differently). Lazy because
    * `defs` above initializes first in object init order. */
  private lazy val benfordCase: String =
    """CAST(CASE digit
      | WHEN '1' THEN 301029 WHEN '2' THEN 176091 WHEN '3' THEN 124938
      | WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66946
      | WHEN '7' THEN 57991 WHEN '8' THEN 51152 ELSE 45757 END AS BIGINT)"""
      .stripMargin.replace("\n", "")
}
