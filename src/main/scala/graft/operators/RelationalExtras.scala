package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.sources.Tables

/** Round-2 relational surface fill-ins (VERDICT r1 "what's missing"
  * items 6-10): cube + grouping sets, right/full outer joins,
  * intersectAll/exceptAll, from_json + map functions, extended date
  * functions, a typed Aggregator, and the previously-untouched supplier
  * dimension. Same conventions as RelationalQueries.
  */
object RelationalExtras {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // q28: full cube over status x priority (q10 covers rollup).
    "q28_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("total"), col("cnt"))
        .orderBy("status", "priority")),

    // q29: explicit GROUPING SETS — two disjoint marginal aggregations
    // in one shuffle (the Spark 4 Dataset API form).
    "q29_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("total"), col("cnt"))
        .orderBy("status", "priority")),

    // q30: outer-join audit — full outer presence classes plus the
    // row-cardinality of a right outer join, as one UNION result.
    "q30_outer_joins" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
      val full = c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      val classes = full.select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("op"))
        .groupBy("op").agg(count(lit(1)).as("cnt"))
      val rightRows = o.join(c, col("c_custkey") === col("o_custkey"), "right_outer")
        .agg(count(lit(1)).as("cnt"))
        .select(lit("right_join_rows").as("op"), col("cnt"))
      classes.unionByName(rightRows).orderBy("op")
    }),

    // q31: multiset set-ops — intersectAll / exceptAll preserve
    // duplicate counts (q14 covers the distinct variants).
    "q31_setops_all" -> ((s, d) => {
      val ok = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val ck = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val i = ok.intersectAll(ck).agg(count(lit(1)).as("cnt"))
        .select(lit("intersect_all").as("op"), col("cnt"))
      val e = ok.exceptAll(ck).agg(count(lit(1)).as("cnt"))
        .select(lit("except_all").as("op"), col("cnt"))
      i.unionByName(e).orderBy("op")
    }),

    // q32: from_json into a typed MAP column + map functions
    // (map_keys / map_values / element_at / map_contains_key).
    "q32_json_map" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).as("m"))
        .select(col("event_type"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          element_at(col("m"), "k").as("k_val"),
          map_contains_key(col("m"), "k").as("has_k"))
        .groupBy("event_type")
        .agg(
          sum("n_keys").as("total_keys"),
          round(avg("k_val"), 2).as("avg_k"),
          count(when(col("has_k"), 1)).as("with_k"))
        .orderBy("event_type")),

    // q33: extended date battery — add_months (end-of-month clamped),
    // last_day, quarter, whole-month months_between.
    "q33_date_extras" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          year(col("o_orderdate")).cast("long").as("yr"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          months_between(date_trunc("month", col("o_orderdate")),
            to_timestamp(lit("1995-01-01"))).cast("long").as("months_since"))
        .groupBy("yr", "qtr")
        .agg(count(lit(1)).as("cnt"), min("plus3m").as("min_plus3m"),
          max("eom").as("max_eom"), max("months_since").as("max_months_since"))
        .orderBy("yr", "qtr")),

    // q34: typed Aggregator as a real UDAF — price-weighted average
    // discount per return flag (partial+final aggregation, map-side
    // combine; never a collect-and-fold).
    "q34_typed_agg" -> ((s, d) => {
      val wavg = udaf(Aggregators.WeightedAvg)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_discount"), col("l_extendedprice")), 6).as("wavg_discount"))
        .orderBy("l_returnflag")
    }),

    // q35: the supplier dimension (previously untouched) through the
    // standard dim-join shape.
    "q35_supplier_agg" -> ((s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"), round(sum("s_acctbal"), 2).as("total_bal"))
        .orderBy("r_name"))
  )

  val oracles: Map[String, String] = Map(
    "q28_cube" ->
      """SELECT coalesce(o_orderstatus,'(all)') AS status,
        |  coalesce(o_orderpriority,'(all)') AS priority,
        |  round(sum(o_totalprice),2) AS total, count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q29_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'(all)') AS status,
        |  coalesce(o_orderpriority,'(all)') AS priority,
        |  round(sum(o_totalprice),2) AS total, count(*) AS cnt
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
    "q30_outer_joins" ->
      """WITH full_oj AS (
        |  SELECT c_custkey, o_custkey
        |  FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey),
        |classes AS (
        |  SELECT CASE
        |      WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
        |      WHEN c_custkey IS NOT NULL THEN 'customer_only'
        |      ELSE 'order_only' END AS op, count(*) AS cnt
        |  FROM full_oj GROUP BY 1)
        |SELECT op, cnt FROM classes
        |UNION ALL
        |SELECT 'right_join_rows' AS op, count(*) AS cnt
        |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
        |ORDER BY op""".stripMargin,
    "q31_setops_all" ->
      """SELECT 'except_all' AS op, count(*) AS cnt FROM
        |  (SELECT o_custkey AS k FROM orders EXCEPT ALL SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS cnt FROM
        |  (SELECT o_custkey AS k FROM orders INTERSECT ALL SELECT c_custkey FROM customer)
        |ORDER BY op""".stripMargin,
    "q32_json_map" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |    TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |  FROM events)
        |SELECT event_type, sum(n_keys) AS total_keys,
        |  round(avg(k_val), 2) AS avg_k,
        |  count(CASE WHEN k_val IS NOT NULL THEN 1 END) AS with_k
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q33_date_extras" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  count(*) AS cnt,
        |  min(strftime(o_orderdate + INTERVAL '3 months', '%Y-%m-%d')) AS min_plus3m,
        |  max(strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')) AS max_eom,
        |  max(datediff('month', DATE '1995-01-01',
        |      CAST(date_trunc('month', o_orderdate) AS DATE))) AS max_months_since
        |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin,
    "q34_typed_agg" ->
      """SELECT l_returnflag,
        |  round(sum(l_discount * l_extendedprice) / sum(l_extendedprice), 6)
        |    AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_supplier_agg" ->
      """SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal),2) AS total_bal
        |FROM supplier
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
