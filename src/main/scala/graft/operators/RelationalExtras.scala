package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.sources.Tables

/** Round-2 relational surface beyond q01–q18: cube + grouping sets
  * (q28/q29), outer joins (q30), multiset set-ops (q31), JSON maps
  * (q32), extended dates (q33), typed Aggregator (q34), supplier dim
  * (q35), banded pure range join (q36), window extras (q37), pivot
  * (q38), percentiles (q39), SQL subqueries (q40), array HOFs (q41),
  * SQL-registered vector functions live in VectorQueries (q42), column
  * profiling (q43), unpivot (q44), blocked edit distance (q45),
  * statistical aggregates (q46), Bloom-accelerated semi join (q47),
  * ANSI-safe dirty casts (q48), and calendar gap-filling (q49). Same
  * conventions as RelationalQueries.
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
    // (map_keys / try_element_at). Parse as
    // map<string,STRING> and try_cast per extracted key: a single dirty
    // value then degrades only that key, never the whole map — with
    // map<string,int> Spark nulls the ENTIRE map on one bad value while
    // JSON oracles (json_keys + TRY_CAST '$.k') degrade per key.
    "q32_json_map" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")).as("m"))
        .select(col("event_type"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          try_element_at(col("m"), lit("k")).try_cast("int").as("k_val"))
        .groupBy("event_type")
        .agg(
          sum("n_keys").as("total_keys"),
          round(avg("k_val"), 2).as("avg_k"),
          count(when(col("k_val").isNotNull, 1)).as("with_k"))
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
        .orderBy("r_name")),

    // q36: PURE time-range join (no equi key) via interval banding —
    // one side explodes into its hour bucket ±1, the other keys its
    // bucket, the equi-join on bucket bounds the pair space, a residual
    // |dt| predicate verifies. Exact (a pair within 1h always shares
    // one banded bucket) and the standard scale shape for interval
    // joins — never a cartesian BNLJ.
    "q36_banded_range_join" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(unix_micros(col("ts")).as("e_us"))
        .withColumn("bkt", explode(array(
          floor(col("e_us") / hourUs) - 1,
          floor(col("e_us") / hourUs),
          floor(col("e_us") / hourUs) + 1)))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("p_us"))
        .withColumn("bkt", floor(col("p_us") / hourUs))
      err.join(pur, "bkt")
        .filter(abs(col("e_us") - col("p_us")) <= hourUs)
        .select(date_format(timestamp_micros(col("e_us")), "yyyy-MM-dd").as("day"))
        .groupBy("day").agg(count(lit(1)).as("pair_cnt"))
        .orderBy("day")
    }),

    // q37: analytic-window battery — ntile / percent_rank / cume_dist
    // over a unique ordering, reduced per quartile.
    "q37_window_extras" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .groupBy("o_orderstatus", "quartile")
        .agg(count(lit(1)).as("cnt"),
          round(max("pr"), 6).as("max_pr"),
          round(max("cd"), 6).as("max_cd"))
        .orderBy("o_orderstatus", "quartile")
    }),

    // q38: pivot — status columns from rows (conditional-aggregation
    // equivalent on the oracle side).
    "q38_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("o_orderpriority")),

    // q40: the SQL front door — correlated EXISTS + scalar subquery
    // through spark.sql over registered views (everything else in the
    // contract uses the DataFrame API; this proves the parser/analyzer
    // path end-to-end with Catalyst's subquery decorrelation).
    "q40_sql_subqueries" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c.c_mktsegment,
               count(*) AS big_spenders,
               round(avg(c.c_acctbal), 2) AS avg_bal
        FROM customer_v c
        WHERE EXISTS (
            SELECT 1 FROM orders_v o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders_v))
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment""")
    }),

    // q125: RECURSIVE CTE (Spark 4's WITH RECURSIVE, executed as
    // Catalyst's union-loop): every order climbs the radix-10 ancestor
    // chain of its key in pure arithmetic — bounded at ~log10(maxkey)
    // iterations, each a narrow projection of the frontier, no join in
    // the step — then one aggregation groups the forest by root. The
    // hierarchical-rollup shape (org charts, BOM explosions, thread
    // trees) that previously required driver-side iteration; at 100 TB
    // the frontier shrinks every level and nothing re-scans the base
    // table.
    "q125_recursive_cte" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_rec")
      s.sql("""
        WITH RECURSIVE climb(orderkey, cents, cur, depth) AS (
          SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT),
                 o_orderkey, 0 FROM orders_rec
          UNION ALL
          SELECT orderkey, cents, CAST(floor(cur / 10.0) AS BIGINT),
                 depth + 1
          FROM climb WHERE cur >= 10)
        SELECT cur AS root, count(*) AS n_orders, max(depth) AS max_depth,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM climb WHERE cur < 10
        GROUP BY cur ORDER BY root""")
    }),

    // q126: LATERAL correlated top-N — the per-row subquery join
    // (CROSS JOIN LATERAL with correlated ORDER BY/LIMIT) Catalyst
    // decorrelates into a ranked join, so "top 3 orders per customer"
    // is written exactly as thought. Scale note: decorrelation turns
    // this into the same shuffle the q11-style window form costs —
    // LATERAL is surface, not a different engine path, which is why
    // it's safe at 100 TB.
    "q126_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql("""
        SELECT c.c_custkey, l.o_orderkey, l.cents
        FROM customer_lat c, LATERAL (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders_lat o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) l
        WHERE c.c_custkey < 100
        ORDER BY c.c_custkey, cents DESC, o_orderkey""")
    }),

    // q48: dirty-data ingestion under ANSI SQL (Spark 4 default):
    // try_cast turns malformed numerics into nulls instead of failing
    // the job — the robustness contract every 100 TB text-format
    // boundary needs. Dirt is injected deterministically (every 7th
    // value gets a trailing letter).
    "q48_dirty_cast" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_brand"),
          when(col("p_partkey") % 7 === 0,
            concat(col("p_retailprice").cast("string"), lit("x")))
            .otherwise(col("p_retailprice").cast("string")).as("price_text"))
        .select(col("p_brand"), expr("try_cast(price_text AS double)").as("price"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("rows"),
          count(col("price")).as("parsed"),
          round(sum("price"), 2).as("total"))
        .orderBy("p_brand")),

    // q49: calendar gap-filling — generate the full month spine with
    // sequence+explode and left-join the fact side, so empty periods
    // surface as zero rows (the time-series completeness pattern).
    "q49_date_spine" -> ((s, d) => {
      val bounds = Tables.orders(s, d)
        .agg(date_trunc("month", min("o_orderdate")).as("lo"),
          date_trunc("month", max("o_orderdate")).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("month"))
      val monthly = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("cnt"))
      spine.join(monthly, Seq("month"), "left")
        .select(date_format(col("month"), "yyyy-MM").as("month"),
          coalesce(col("cnt"), lit(0L)).as("orders"))
        .orderBy("month")
    }),

    // q47: Bloom-sketch-accelerated semi join — the runtime-filter
    // pattern constructed explicitly: build a Bloom filter over the
    // SELECTIVE dim keys (scalar subquery → broadcast constant),
    // pre-filter the fact side BEFORE any shuffle (false negatives
    // impossible, so nothing is lost), then an exact semi join removes
    // the false positives. At 100 TB the pre-filter drops most fact
    // rows at the scan. bloom_filter_agg/might_contain are Spark's own
    // runtime-filter expressions, surfaced via GraftExtensions.
    "q47_bloom_semi_join" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_bf")
      Tables.orders(s, d).createOrReplaceTempView("orders_bf")
      s.sql("""
        WITH rich AS (SELECT c_custkey FROM customer_bf WHERE c_acctbal > 9000),
        prefiltered AS (
          SELECT o.* FROM orders_bf o
          WHERE might_contain(
            (SELECT bloom_filter_agg(xxhash64(c_custkey), 100000L, 4194304L)
             FROM rich),
            xxhash64(o.o_custkey))),
        exact AS (
          SELECT p.* FROM prefiltered p
          LEFT SEMI JOIN rich r ON p.o_custkey = r.c_custkey)
        SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        FROM exact GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // q46: statistical aggregates — correlation / covariance / variance
    // (population variants, whose definitions match across engines).
    "q46_stats_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_cov"),
          round(var_pop(col("l_discount")), 8).as("disc_var"))
        .orderBy("l_returnflag")),

    // q44: unpivot/melt — wide metric columns to long (key, metric,
    // value) rows via the Dataset API, reduced per metric.
    "q44_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(
          ids = Array(col("p_partkey")),
          values = Array(col("size"), col("retailprice")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .groupBy("metric")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"),
          round(avg("value"), 4).as("mean"))
        .orderBy("metric")),

    // q45: edit-distance fuzzy matching — part-name pairs within
    // levenshtein distance D inside a (brand, size) block, summarized
    // per brand. LOSSLESS LENGTH BANDING: every edit operation changes
    // string length by at most 1, so lev(a,b) <= D implies
    // |len(a)-len(b)| <= D. Side a keys its exact length; side b
    // explodes to the D+1+D lengths it could pair with; the band column
    // joins as an EQUI key (visible in the plan as part of the shuffle
    // key), so the pair space is block x length-band instead of block² —
    // and no pair passing the lev <= D filter can be lost. A pair joins
    // on at most one band value (a emits exactly one), so no dedup is
    // needed. The 3-arg levenshtein bounds the DP at D (returns -1 when
    // the distance exceeds it), making the residual verify O(D·n) per
    // pair instead of O(n²).
    "q45_edit_distance" -> ((s, d) => {
      val D = 2
      val p = Tables.part(s, d).select(col("p_brand"), col("p_size"),
        col("p_partkey"), col("p_name"))
      val a = p.select(col("p_brand"), col("p_size"),
        col("p_partkey").as("ka"), col("p_name").as("na"),
        length(col("p_name")).as("band"))
      val b = p.select(col("p_brand"), col("p_size"),
          col("p_partkey").as("kb"), col("p_name").as("nb"))
        .withColumn("band",
          explode(sequence(length(col("nb")) - lit(D), length(col("nb")) + lit(D))))
      a.join(b, Seq("p_brand", "p_size", "band"))
        .filter(col("ka") < col("kb"))
        .select(col("p_brand"),
          levenshtein(col("na"), col("nb"), D).as("lev"))
        .filter(col("lev") >= 0)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("pair_cnt"),
          min("lev").cast("long").as("min_lev"),
          round(avg("lev"), 2).as("avg_lev"))
        .orderBy("p_brand")
    }),

    // q43: column profiling — the describe/summary capability as an
    // oracle-checked query: per-column null counts, distincts, range
    // and moments in ONE aggregation pass over the table.
    "q43_profile" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("rows"),
        count(col("l_orderkey")).as("ok_nonnull"),
        countDistinct(col("l_partkey")).as("pk_distinct"),
        round(min("l_quantity"), 2).as("qty_min"),
        round(max("l_quantity"), 2).as("qty_max"),
        round(avg("l_quantity"), 4).as("qty_avg"),
        round(stddev_pop(col("l_quantity")), 4).as("qty_stddev"),
        round(min("l_extendedprice"), 2).as("price_min"),
        round(max("l_extendedprice"), 2).as("price_max"))),

    // q41: higher-order array functions — filter / transform /
    // aggregate lambdas over the embedding arrays (ordered-fold
    // semantics mirror DuckDB's list_* family exactly).
    "q41_hof_battery" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + abs(x.cast("double"))), 4).as("l1_norm"),
          round(aggregate(
            transform(col("embedding"),
              x => greatest(least(x.cast("double"), lit(0.5)), lit(-0.5))),
            lit(0.0d), (acc, x) => acc + x), 4).as("clipped_sum"))
        .orderBy("vec_id")
        .limit(25)),

    // q39: exact interpolated percentiles + median per brand.
    "q39_percentiles" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          round(median(col("p_retailprice")), 4).as("med"),
          round(expr("percentile(p_retailprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(p_retailprice, 0.75)"), 4).as("p75"))
        .orderBy("p_brand"))
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
    // DuckDB sum(BIGINT) widens to HUGEINT (int128); pandas/arrow
    // canonicalize HUGEINT as float64, so a value-equal result can still
    // hash-mismatch against Spark's int64 column. CAST back to BIGINT.
    "q32_json_map" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |    TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |  FROM events)
        |SELECT event_type, CAST(sum(n_keys) AS BIGINT) AS total_keys,
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
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q36_banded_range_join" ->
      """SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
        |  count(*) AS pair_cnt
        |FROM (SELECT ts, epoch_us(ts) AS e_us FROM events WHERE event_type = 'error') e
        |JOIN (SELECT epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase') p
        |  ON abs(e.e_us - p.p_us) <= 3600000000
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q37_window_extras" ->
      """WITH w AS (
        |  SELECT o_orderstatus,
        |    ntile(4) OVER win AS quartile,
        |    percent_rank() OVER win AS pr,
        |    cume_dist() OVER win AS cd
        |  FROM orders
        |  WINDOW win AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey))
        |SELECT o_orderstatus, CAST(quartile AS BIGINT) AS quartile,
        |  count(*) AS cnt, round(max(pr), 6) AS max_pr, round(max(cd), 6) AS max_cd
        |FROM w GROUP BY 1, 2 ORDER BY o_orderstatus, quartile""".stripMargin,
    "q38_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q40_sql_subqueries" ->
      """SELECT c.c_mktsegment, count(*) AS big_spenders,
        |  round(avg(c.c_acctbal), 2) AS avg_bal
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders))
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q125_recursive_cte" ->
      """WITH RECURSIVE climb(orderkey, cents, cur, depth) AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |         o_orderkey, 0 FROM orders
        |  UNION ALL
        |  SELECT orderkey, cents, CAST(floor(cur / 10.0) AS BIGINT),
        |         depth + 1
        |  FROM climb WHERE cur >= 10)
        |SELECT cur AS root, count(*) AS n_orders, max(depth) AS max_depth,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM climb WHERE cur < 10
        |GROUP BY cur ORDER BY root""".stripMargin,
    "q126_lateral_topk" ->
      """SELECT c.c_custkey, l.o_orderkey, l.cents
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) l
        |WHERE c.c_custkey < 100
        |ORDER BY c.c_custkey, cents DESC, o_orderkey""".stripMargin,
    "q48_dirty_cast" ->
      """WITH dirty AS (
        |  SELECT p_brand,
        |    CASE WHEN p_partkey % 7 = 0
        |      THEN p_retailprice::VARCHAR || 'x'
        |      ELSE p_retailprice::VARCHAR END AS price_text
        |  FROM part)
        |SELECT p_brand, count(*) AS rows,
        |  count(TRY_CAST(price_text AS DOUBLE)) AS parsed,
        |  round(sum(TRY_CAST(price_text AS DOUBLE)), 2) AS total
        |FROM dirty GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q49_date_spine" ->
      """WITH bounds AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |         date_trunc('month', max(o_orderdate)) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM bounds),
        |monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month, count(*) AS cnt
        |  FROM orders GROUP BY 1)
        |SELECT strftime(s.month, '%Y-%m') AS month,
        |  coalesce(m.cnt, 0) AS orders
        |FROM spine s LEFT JOIN monthly m ON s.month = m.month
        |ORDER BY month""".stripMargin,
    "q47_bloom_semi_join" ->
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q46_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_cov,
        |  round(var_pop(l_discount), 8) AS disc_var
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q44_unpivot" ->
      """WITH long_form AS (
        |  SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice FROM part)
        |SELECT metric, count(*) AS cnt, round(sum(value), 2) AS total,
        |  round(avg(value), 4) AS mean
        |FROM long_form GROUP BY metric ORDER BY metric""".stripMargin,
    "q45_edit_distance" ->
      """SELECT a.p_brand, count(*) AS pair_cnt,
        |  CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_lev,
        |  round(avg(levenshtein(a.p_name, b.p_name)), 2) AS avg_lev
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        | AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |GROUP BY a.p_brand ORDER BY a.p_brand""".stripMargin,
    "q43_profile" ->
      """SELECT count(*) AS rows, count(l_orderkey) AS ok_nonnull,
        |  count(DISTINCT l_partkey) AS pk_distinct,
        |  round(min(l_quantity), 2) AS qty_min,
        |  round(max(l_quantity), 2) AS qty_max,
        |  round(avg(l_quantity), 4) AS qty_avg,
        |  round(stddev_pop(l_quantity), 4) AS qty_stddev,
        |  round(min(l_extendedprice), 2) AS price_min,
        |  round(max(l_extendedprice), 2) AS price_max
        |FROM lineitem""".stripMargin,
    "q41_hof_battery" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(list_sum(list_transform(embedding, x -> abs(x::DOUBLE))), 4) AS l1_norm,
        |  round(list_sum(list_transform(embedding,
        |    x -> greatest(least(x::DOUBLE, 0.5), -0.5))), 4) AS clipped_sum
        |FROM embeddings ORDER BY vec_id LIMIT 25""".stripMargin,
    "q39_percentiles" ->
      """SELECT p_brand,
        |  round(quantile_cont(p_retailprice, 0.5), 4) AS med,
        |  round(quantile_cont(p_retailprice, 0.25), 4) AS p25,
        |  round(quantile_cont(p_retailprice, 0.75), 4) AS p75
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
