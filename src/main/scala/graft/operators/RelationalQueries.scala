package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational query contract q01–q18 (SURVEY.md §2-B).
  *
  * Each query has a Spark builder and a DuckDB oracle (ANSI SQL over the
  * same parquet) with IDENTICAL output column names, types, and total row
  * order. Conventions for oracle stability:
  *   - every float aggregate is `round(x, n)` on both sides;
  *   - every ORDER BY ends in a unique key (total order);
  *   - Spark int-typed derivations (datediff, row_number, length) are cast
  *     to long to match DuckDB's BIGINT;
  *   - timestamps are emitted as `yyyy-MM-dd` strings.
  *
  * Scale notes are inline: the declarative formulation leaves join
  * selection to Catalyst+AQE; explicit `broadcast()` hints mark the
  * dimension sides that stay small at any SF (region/nation/part/probe).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // q01: scan + filter + project. Filter and 3-column projection reach
    // the parquet scan (PushedFilters / ReadSchema).
    "q01_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // q02: TPC-H Q1 shape — partial aggregation map-side, 2-key groupBy.
    "q02_pricing_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // q03: equi-join; customer is the small side → broadcast.
    "q03_join_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"))
        .orderBy("c_mktsegment")),

    // q04: star join lineitem⋈orders⋈customer⋈nation⋈region. orders is
    // the big dim (shuffle join under AQE); the rest broadcast.
    "q04_star_join" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("r_name")),

    // q05: explicit broadcast of the part dimension.
    "q05_broadcast_join" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(round(avg("l_extendedprice"), 2).as("avg_price"))
        .orderBy("p_brand")),

    // q06: left join + null-preserving count (customers with zero orders).
    "q06_left_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy(desc("order_cnt"), col("c_custkey"))
        .limit(20)),

    // q07: left-semi / left-anti existence joins.
    "q07_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("grp"), col("cnt"))
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")).select(lit("without_orders").as("grp"), col("cnt"))
      withO.union(without).orderBy("grp")
    }),

    // q08: theta (non-equi) self-join — adjacent sizes within a type
    // family. The equi part (type head) keys the shuffle; the +1 size
    // predicate stays a join residual, so this is NOT a cartesian product.
    "q08_theta_join" -> ((s, d) => {
      val p = Tables.part(s, d)
      val a = p.select(
        element_at(split(col("p_type"), " "), 1).as("a_head"), col("p_size").as("a_size"))
      val b = p.select(
        element_at(split(col("p_type"), " "), 1).as("b_head"), col("p_size").as("b_size"))
      a.join(b, col("a_head") === col("b_head") && col("b_size") === col("a_size") + 1)
        .agg(count(lit(1)).as("pair_cnt"))
    }),

    // q09: exact distinct count (shuffle on o_custkey).
    "q09_count_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("distinct_custs"))),

    // q09b: HLL sketch variant — constant-memory at 100 TB where exact
    // distinct shuffles the full key set. No SQL oracle (approx): the
    // driver records a rows-only check; ApproxDistinctSpec asserts the
    // estimate's tolerance against exact q09.
    "q09b_approx_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))),

    // q10: rollup with subtotal rows surfaced via coalesce (no real nulls
    // in the grouping columns, so the sentinel is unambiguous).
    "q10_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("total"), col("cnt"))
        .orderBy("status", "priority")),

    // q11: top-3 per group via ranking window (the scalable top-k-per-key
    // pattern: no global sort, one shuffle on the partition key).
    "q11_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"))
        .orderBy("o_custkey", "rn")
    }),

    // q12: running total + lag over a frame spec.
    "q12_window_running" -> ((s, d) => {
      val ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          round(sum("o_totalprice").over(run), 2).as("running_total"),
          round(lag("o_totalprice", 1).over(ord), 2).as("prev_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // q13: global top-k → TakeOrderedAndProject (no full sort at scale).
    "q13_topk" -> ((s, d) =>
      Tables.lineitem(s, d)
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .limit(10)),

    // q14: set operations (distinct semantics on both engines).
    "q14_set_ops" -> ((s, d) => {
      val ok = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val ck = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val u = ok.union(ck).distinct().agg(count(lit(1)).as("cnt"))
        .select(lit("union").as("op"), col("cnt"))
      val i = ok.intersect(ck).agg(count(lit(1)).as("cnt"))
        .select(lit("intersect").as("op"), col("cnt"))
      val e = ck.except(ok).agg(count(lit(1)).as("cnt"))
        .select(lit("except").as("op"), col("cnt"))
      u.union(i).union(e).orderBy("op")
    }),

    // q15: string function battery.
    "q15_string_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          element_at(split(col("p_type"), " "), 1).as("type_head"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_name")).as("name_lower"),
          substring(col("p_name"), 1, 10).as("name_sub"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
        .limit(50)),

    // q16: date functions — month bucket + day offset from first shipment.
    "q16_date_funcs" -> ((s, d) => {
      val months = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("order_cnt"))
      val anchor = Tables.lineitem(s, d)
        .agg(min(to_date(col("l_shipdate"))).as("anchor"))
      months.crossJoin(broadcast(anchor))
        .select(
          date_format(col("mon"), "yyyy-MM-dd").as("month_start"),
          col("order_cnt"),
          datediff(to_date(col("mon")), col("anchor")).cast("long").as("days_since_first_ship"))
        .orderBy("month_start")
    }),

    // q17: math/round battery per brand.
    "q17_math_agg" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          round(avg("p_retailprice"), 2).as("avg_price"),
          round(min("p_retailprice"), 2).as("min_price"),
          round(max("p_retailprice"), 2).as("max_price"),
          round(sum(log(col("p_retailprice"))), 4).as("sum_log_price"))
        .orderBy("p_brand")),

    // q18: JSON extraction from the events props column.
    "q18_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(round(avg("k"), 2).as("avg_k"), count(col("k")).as("k_cnt"))
        .orderBy("event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),2) AS avg_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS order_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_broadcast_join" ->
      """SELECT p_brand, round(avg(l_extendedprice),2) AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q06_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY order_cnt DESC, c_custkey LIMIT 20""".stripMargin,
    "q07_semi_anti" ->
      """SELECT 'with_orders' AS grp, count(*) AS cnt FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'without_orders' AS grp, count(*) AS cnt FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY grp""".stripMargin,
    "q08_theta_join" ->
      """SELECT count(*) AS pair_cnt
        |FROM part a JOIN part b
        | ON split_part(a.p_type,' ',1) = split_part(b.p_type,' ',1)
        | AND b.p_size = a.p_size + 1""".stripMargin,
    "q09_count_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS distinct_custs FROM orders",
    "q10_rollup" ->
      """SELECT coalesce(o_orderstatus,'(all)') AS status,
        |  coalesce(o_orderpriority,'(all)') AS priority,
        |  round(sum(o_totalprice),2) AS total, count(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q11_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, total FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS total,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q12_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total,
        |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),2) AS prev_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q13_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q14_set_ops" ->
      """SELECT 'union' AS op, count(*) AS cnt FROM
        | (SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt FROM
        | (SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS cnt FROM
        | (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY op""".stripMargin,
    "q15_string_funcs" ->
      """SELECT p_partkey, split_part(p_type,' ',1) AS type_head,
        |  upper(p_name) AS name_upper, lower(p_name) AS name_lower,
        |  substr(p_name,1,10) AS name_sub, length(p_name) AS name_len
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "q16_date_funcs" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  count(*) AS order_cnt,
        |  datediff('day', (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
        |           CAST(date_trunc('month', o_orderdate) AS DATE)) AS days_since_first_ship
        |FROM orders GROUP BY date_trunc('month', o_orderdate)
        |ORDER BY month_start""".stripMargin,
    "q17_math_agg" ->
      """SELECT p_brand, round(avg(p_retailprice),2) AS avg_price,
        |  round(min(p_retailprice),2) AS min_price,
        |  round(max(p_retailprice),2) AS max_price,
        |  round(sum(ln(p_retailprice)),4) AS sum_log_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q18_json" ->
      """SELECT event_type,
        |  round(avg(TRY_CAST(json_extract_string(props,'$.k') AS INTEGER)),2) AS avg_k,
        |  count(TRY_CAST(json_extract_string(props,'$.k') AS INTEGER)) AS k_cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
