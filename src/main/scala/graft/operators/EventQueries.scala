package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream queries in batch form: sessionization (q24), tumbling
  * windows (q25), as-of join (q26), range join (q27). The streaming
  * formulations of the same semantics live in [[graft.streaming.Events]]
  * and are validated against these batch plans (the standard
  * batch-equivalence oracle, SURVEY.md §5.2).
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 30 minutes in microseconds — the session gap. */
  private val SessionGapUs = 1800L * 1000000L

  val queries: Map[String, Q] = Map(
    // q24: gap-based sessionization via lag + conditional sum. One
    // shuffle on user_id; the window sort is in-partition. Boundary
    // note: q24 treats a gap of EXACTLY 30 min as the same session
    // (strict >); Spark's session_window (st3) starts a new one (>=) —
    // each oracle mirrors its own operator's rule.
    "q24_sessionization" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(ord))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").as("session_cnt"))
        .orderBy(desc("session_cnt"), col("user_id"))
        .limit(20)
    }),

    // q25: tumbling 1-hour window aggregation (batch form of the
    // streaming tumbling window; window() is the same expression
    // Structured Streaming uses).
    "q25_tumbling_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    // q26: as-of join — for each purchase, the user's latest view at or
    // before it. Union + ordered-window composite (see AsOfJoin): one
    // shuffle of |purchases|+|views|, no range explosion.
    "q26_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
      // right side unique per (key, time): keep max event_id on ties
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .agg(max("event_id").as("v_event_id"))
      AsOfJoin(purchases, views,
          col("user_id"), col("v_user"), col("p_ts"), col("v_ts"))
        .select(col("p_event_id"), col("user_id"),
          unix_micros(col("p_ts")).as("p_us"),
          col("v_event_id"),
          unix_micros(col("v_ts")).as("v_us"))
        .orderBy("p_event_id")
    }),

    // q27: range join — (error, purchase) pairs of the same user within
    // one day. The equi key bounds the pair space (no cartesian); a pure
    // time-range join at scale adds day-bucket banding on top.
    "q27_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("e_us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
      err.join(pur, col("user_id") === col("p_user") &&
          abs(col("e_us") - col("p_us")) <= 86400000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("pair_cnt"))
        .orderBy(desc("pair_cnt"), col("user_id"))
        .limit(20)
    }),

    // q60: max-concurrency sweep — each event becomes an interval
    // [ts, ts + value minutes]; the classic +1/−1 endpoint sweep with a
    // running sum gives the peak number of simultaneously-open
    // intervals per event type (concurrent-sessions gauge). One shuffle
    // keyed by event_type; endpoints sort in-partition. Ties order
    // (t, delta DESC, event_id): a start at the same instant as an end
    // counts as overlapping (inclusive bounds), spelled out so both
    // engines agree. floor() before the long cast — Spark's double→long
    // cast truncates while DuckDB's rounds.
    "q60_max_concurrency" -> ((s, d) => {
      val iv = Tables.events(s, d).select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t0"),
        (unix_micros(col("ts")) +
          floor(col("value") * 60).cast("long") * 1000000L).as("t1"))
      val pts = iv.select(col("event_type"), col("t0").as("t"),
          lit(1).as("delta"), col("event_id"))
        .unionByName(iv.select(col("event_type"), col("t1").as("t"),
          lit(-1).as("delta"), col("event_id")))
      val w = Window.partitionBy("event_type")
        .orderBy(col("t"), desc("delta"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("conc", sum("delta").over(w))
        .groupBy("event_type")
        .agg(max("conc").cast("long").as("max_concurrent"))
        .orderBy("event_type")
    }),

    // q61: funnel analysis — ordered-sequence pattern matching
    // (MATCH_RECOGNIZE-lite): how far does each user get through
    // view → click → purchase, where each stage must follow the
    // previous stage's first completion within 24 h? Three chained
    // conditional mins, each a user-keyed aggregate over a pre-filtered
    // scan — every join and shuffle keyed by user_id, so the funnel
    // scales with user cardinality, not event volume.
    "q61_funnel" -> ((s, d) => {
      val FollowUs = 86400000000L // 24 h stage-to-stage window
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      def firstAfter(typ: String, prev: DataFrame, prevCol: String, out: String) =
        ev.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("us") > col(prevCol) && col("us") <= col(prevCol) + FollowUs)
          .groupBy("user_id").agg(min("us").as(out))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val c = firstAfter("click", v, "v_us", "c_us")
      val p = firstAfter("purchase", c.select("user_id", "c_us"), "c_us", "p_us")
      ev.select("user_id").distinct()
        .join(v.select("user_id", "v_us"), Seq("user_id"), "left")
        .join(c.select("user_id", "c_us"), Seq("user_id"), "left")
        .join(p.select("user_id", "p_us"), Seq("user_id"), "left")
        .select(when(col("p_us").isNotNull, 3L)
          .when(col("c_us").isNotNull, 2L)
          .when(col("v_us").isNotNull, 1L)
          .otherwise(0L).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    }),

    // q62: cohort retention — users grouped by the ISO week of their
    // first event; for each later week, how many are still active?
    // Two user-keyed aggregates (first-week, distinct user-weeks) and
    // one cohort-keyed rollup — the standard retention matrix, entirely
    // shuffle-keyed on user_id then (cohort, offset).
    "q62_cohort_retention" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = wk.groupBy("user_id").agg(min("wk").as("cwk"))
      wk.join(first, "user_id")
        .select(date_format(col("cwk"), "yyyy-MM-dd").as("cohort_week"),
          ((unix_micros(col("wk")) - unix_micros(col("cwk"))) / 604800000000L)
            .cast("long").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // q63: rolling 7-day active users — the sliding DISTINCT count,
    // which no window frame can express (COUNT DISTINCT isn't a window
    // function in Spark or ANSI). The scalable shape: each (day, user)
    // fact fans out map-side to the 7 anchor days it supports
    // (explode(sequence(0,6)) — ×7 row expansion, NO range join/BNLJ),
    // then one distinct + one count keyed by anchor day. Anchors are
    // semi-joined back to observed days so the series has no
    // leading/trailing ramp rows the data never saw.
    "q63_rolling_wau" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day")).distinct()
      du.withColumn("i", explode(sequence(lit(0), lit(6))))
        .select(date_add(col("day"), col("i")).as("anchor"), col("user_id"))
        .distinct()
        .join(days.withColumnRenamed("day", "anchor"), Seq("anchor"), "left_semi")
        .groupBy("anchor")
        .agg(count(lit(1)).as("wau"))
        .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"), col("wau"))
        .orderBy("day")
    }),

    // q69: time-series gap fill + linear interpolation — the resample/
    // interpolate surface (Pandas `resample().interpolate()`, Flink
    // windowed fill) as one declarative plan: a sparse hourly series per
    // event_type (user_id % 50 keeps it sparse enough to have real
    // gaps), densified against an hour spine, missing points linearly
    // interpolated between nearest observed neighbors (edges take the
    // single available neighbor). Two window passes over ONE
    // partitioning (prev/next observed value+time via IGNORE NULLS
    // last/first) — Catalyst reuses the sort+exchange, so the whole
    // fill is one shuffle after the grid join. The interpolated metric
    // is an integer COUNT, so the interpolation arithmetic is the same
    // double expression tree on both engines — bitwise identical, and
    // the e4 integer sum makes the aggregate hash-stable.
    "q69_gap_fill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .filter(col("user_id") % 50 === 0)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      val hourly = ev.groupBy("event_type", "h")
        .agg(count(lit(1)).cast("double").as("v"))
      val spine = ev.agg(min("h").as("h0"), max("h").as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
      val grid = ev.select("event_type").distinct().crossJoin(broadcast(spine))
      val w = Window.partitionBy("event_type").orderBy("h")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
      val wNext = w.rowsBetween(0, Window.unboundedFollowing)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("x", col("h").cast("long"))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("px",
          last(when(col("v").isNotNull, col("x")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nx",
          first(when(col("v").isNotNull, col("x")), ignoreNulls = true).over(wNext))
        .withColumn("filled",
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("x") - col("px")) / (col("nx") - col("px"))))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("v").isNull, 1).otherwise(0)).cast("long").as("n_filled"),
          sum(round(col("filled") * 10000, 0).cast("long")).cast("long")
            .as("v_e4_sum"))
        .orderBy("event_type")
    }),

    // q70: TIME-RANGE window frames — `RANGE BETWEEN <interval>
    // PRECEDING` keyed on event time, the window variant every other
    // frame here avoids: q12's running frames are ROWS-based, q63
    // fans out per-day because COUNT DISTINCT can't be a window. A
    // plain rolling sum/count over a trailing 1-hour frame IS
    // window-expressible and costs exactly one sort+shuffle on the
    // partition key — no self-join, no row explosion, the frame slides
    // inside each sorted partition. Ties on the same second are frame-
    // complete by RANGE semantics (all peers included), so the result
    // is order-independent and the per-type aggregate hash-stable.
    "q70_time_range_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // Micros on both sides (epoch_us convention, q24/q26/q27): a
      // seconds cast would TRUNCATE in Spark but ROUND in DuckDB on
      // sub-second parts, silently shifting frame membership.
      val e = Tables.events(s, d)
        .filter(col("user_id") % 10 === 0)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("x"),
          round(col("value") * 10000, 0).cast("long").as("v_e4"))
      val w = Window.partitionBy("event_type").orderBy("x")
        .rangeBetween(-3600000000L, 0L)
      e.withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("v_e4_1h", sum(col("v_e4")).over(w))
        .groupBy("event_type")
        .agg(max(col("n_1h")).cast("long").as("max_n_1h"),
          sum(col("n_1h")).cast("long").as("sum_n"),
          sum(col("v_e4_1h")).cast("long").as("sum_v_e4"))
        .orderBy("event_type")
    }),

    // q71: event-transition matrix — first-order Markov transition
    // counts and probabilities P(next | current) per user journey, the
    // sequence-mining staple behind funnel discovery and behavioral
    // clustering. One shuffle on user_id orders each user's stream for
    // the lead() pairing (same single-sort shape as q52); the matrix
    // itself is a tiny (types × types) aggregate. Probabilities are a
    // single integer ratio per output row — identical double division
    // in both engines, no summation-order exposure.
    "q71_transition_matrix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
      tr.groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("p_e4",
          round(col("cnt") / sum(col("cnt")).over(Window.partitionBy("from_type"))
            * 10000, 0).cast("long"))
        .orderBy("from_type", "to_type")
    }),

    // q86: OHLC bar downsampling — the time-series resample that turns
    // a raw tick/event stream into per-bucket open/high/low/close +
    // count + volume bars. open/close use min_by/max_by over a
    // struct(time, event_id) ordering key: event_id is globally unique,
    // so the key is TIE-PROOF at any scale, and min_by/max_by are
    // PARTIAL-AGGREGABLE — the whole bar computes map-side in one
    // groupBy with no window sort anywhere (the row_number formulation
    // would shuffle-and-sort every event; this shuffles only the
    // per-bar partials). Values carried as integer e4 (round at
    // ingestion, sum integers) — the established summation-order-proof
    // form. The oracle reproduces open/close with composite-ordered
    // row_number, which agrees with min_by/max_by everywhere because
    // the key is unique.
    "q86_ohlc_bars" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        col("event_type"),
        date_trunc("hour", col("ts")).as("bar"),
        unix_micros(col("ts")).as("x"),
        col("event_id"),
        round(col("value") * 10000, 0).cast("long").as("v_e4"))
      e.groupBy("event_type", "bar")
        .agg(
          min_by(col("v_e4"), struct(col("x"), col("event_id"))).as("open_e4"),
          max_by(col("v_e4"), struct(col("x"), col("event_id"))).as("close_e4"),
          max(col("v_e4")).as("high_e4"),
          min(col("v_e4")).as("low_e4"),
          count(lit(1)).as("n_ticks"),
          sum(col("v_e4")).as("vol_e4"))
        .select(col("event_type"),
          date_format(col("bar"), "yyyy-MM-dd HH:mm:ss").as("bar_start"),
          col("open_e4"), col("high_e4"), col("low_e4"), col("close_e4"),
          col("n_ticks"), col("vol_e4"))
        .orderBy("event_type", "bar_start")
    })
  )

  val oracles: Map[String, String] = Map(
    // open/close via composite-ordered row_number — agrees with Spark's
    // min_by/max_by(struct(x, event_id)) because event_id is unique.
    "q86_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bar, epoch_us(ts) AS x,
        |    event_id, CAST(round(value * 10000, 0) AS BIGINT) AS v_e4
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bar
        |      ORDER BY x, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bar
        |      ORDER BY x DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type,
        |  strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
        |  max(CASE WHEN rn_a = 1 THEN v_e4 END) AS open_e4,
        |  max(v_e4) AS high_e4, min(v_e4) AS low_e4,
        |  max(CASE WHEN rn_d = 1 THEN v_e4 END) AS close_e4,
        |  count(*) AS n_ticks, CAST(sum(v_e4) AS BIGINT) AS vol_e4
        |FROM r GROUP BY event_type, bar
        |ORDER BY event_type, bar_start""".stripMargin,
    "q71_transition_matrix" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS cnt
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, cnt,
        |  CAST(round(cnt / (sum(cnt) OVER (PARTITION BY from_type)) * 10000, 0)
        |    AS BIGINT) AS p_e4
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q70_time_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS x,
        |    CAST(round(value * 10000, 0) AS BIGINT) AS v_e4
        |  FROM events WHERE user_id % 10 = 0),
        |w AS (
        |  SELECT event_id, event_type,
        |    count(*) OVER (PARTITION BY event_type ORDER BY x
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h,
        |    sum(v_e4) OVER (PARTITION BY event_type ORDER BY x
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS v_e4_1h
        |  FROM e)
        |SELECT event_type, CAST(max(n_1h) AS BIGINT) AS max_n_1h,
        |  CAST(sum(n_1h) AS BIGINT) AS sum_n,
        |  CAST(sum(v_e4_1h) AS BIGINT) AS sum_v_e4
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q69_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h
        |  FROM events WHERE user_id % 50 = 0),
        |hourly AS (
        |  SELECT event_type, h, CAST(count(*) AS DOUBLE) AS v
        |  FROM ev GROUP BY event_type, h),
        |spine AS (
        |  SELECT unnest(generate_series((SELECT min(h) FROM ev),
        |    (SELECT max(h) FROM ev), INTERVAL 1 HOUR)) AS h),
        |grid AS (
        |  SELECT t.event_type, s.h
        |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN spine s),
        |j AS (
        |  SELECT g.event_type, g.h, CAST(epoch(g.h) AS BIGINT) AS x, hourly.v
        |  FROM grid g LEFT JOIN hourly
        |    ON g.event_type = hourly.event_type AND g.h = hourly.h),
        |wnd AS (
        |  SELECT event_type, h, x, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM j),
        |f AS (
        |  SELECT event_type, v,
        |    CASE WHEN v IS NOT NULL THEN v
        |      WHEN pv IS NULL THEN nv
        |      WHEN nv IS NULL THEN pv
        |      ELSE pv + (nv - pv) * (x - px) / (nx - px) END AS filled
        |  FROM wnd)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(sum(CAST(round(filled * 10000, 0) AS BIGINT)) AS BIGINT) AS v_e4_sum
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q24_sessionization" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN pts IS NULL
        |    OR epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS session_cnt
        |FROM x GROUP BY user_id
        |ORDER BY session_cnt DESC, user_id LIMIT 20""".stripMargin,
    "q25_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q26_asof_join" ->
      """WITH v AS (
        |  SELECT user_id AS v_user, ts AS v_ts, max(event_id) AS v_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id AS p_event_id, user_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.p_event_id, p.user_id, epoch_us(p.p_ts) AS p_us,
        |  v.v_event_id, epoch_us(v.v_ts) AS v_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.v_user AND p.p_ts >= v.v_ts
        |ORDER BY p_event_id""".stripMargin,
    "q27_range_join" ->
      """SELECT e.user_id, count(*) AS pair_cnt
        |FROM (SELECT user_id, epoch_us(ts) AS e_us FROM events WHERE event_type = 'error') e
        |JOIN (SELECT user_id AS p_user, epoch_us(ts) AS p_us
        |      FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.p_user AND abs(e.e_us - p.p_us) <= 86400000000
        |GROUP BY e.user_id ORDER BY pair_cnt DESC, e.user_id LIMIT 20""".stripMargin,
    "q60_max_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS t0,
        |    epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000 AS t1
        |  FROM events),
        |pts AS (
        |  SELECT event_type, t0 AS t, 1 AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT event_type, t1, -1, event_id FROM iv),
        |r AS (
        |  SELECT event_type,
        |    sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta DESC, event_id ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM pts)
        |SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q61_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > v_us
        |        AND us <= v_us + 86400000000 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > c_us
        |        AND us <= c_us + 86400000000 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT CAST(CASE WHEN p_us IS NOT NULL THEN 3
        |  WHEN c_us IS NOT NULL THEN 2
        |  WHEN v_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  count(*) AS n_users
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |GROUP BY stage ORDER BY stage""".stripMargin,
    "q62_cohort_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cwk FROM wk GROUP BY user_id)
        |SELECT strftime(cwk, '%Y-%m-%d') AS cohort_week,
        |  CAST((epoch_us(wk) - epoch_us(cwk)) // 604800000000 AS BIGINT)
        |    AS week_offset,
        |  count(*) AS n_active
        |FROM wk JOIN f USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q63_rolling_wau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |fan AS (
        |  SELECT DISTINCT du.day + to_days(CAST(i AS INTEGER)) AS anchor, user_id
        |  FROM du, unnest(range(7)) AS u(i))
        |SELECT strftime(anchor, '%Y-%m-%d') AS day, count(*) AS wau
        |FROM fan
        |WHERE anchor IN (SELECT day FROM days)
        |GROUP BY anchor ORDER BY day""".stripMargin
  )
}
