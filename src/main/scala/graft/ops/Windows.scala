package graft.ops

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function inventory (SURVEY.md §2.5). REF↑ of the Power BI
  * per-zone partitioning (reference images/Powerbi.png); all window specs
  * order by a unique key (SURVEY.md §7.4 tie rule) so ranks and offsets
  * are deterministic on both engines.
  *
  * Scale note: a window partitioned by a high-cardinality key is one
  * shuffle + per-partition sort — fine at 100 TB. Never use an
  * un-partitioned window over a fact table (single-task sort); the only
  * global ordering here is final presentation ORDER BY, which the driver
  * harness needs for hashing.
  */
object Windows {

  private val windowRank = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("drk", dense_rank().over(w).cast("long"))
        .withColumn("nt", ntile(4).over(w).cast("long"))
        .orderBy($"o_orderstatus", $"rn")
    },
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |       CAST(RANK() OVER w AS BIGINT) AS rk,
      |       CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
      |       CAST(NTILE(4) OVER w AS BIGINT) AS nt
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderstatus, rn""".stripMargin)

  /** lag/lead/first/last per user, ordered by the unique event_id (raw
    * nanosecond ts is never used as an order key — SURVEY.md §7.4). */
  private val windowAnalytic = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select($"event_id", $"user_id", $"value")
        .withColumn("prev_v", lag($"value", 1).over(w))
        .withColumn("next_v", lead($"value", 1).over(w))
        .withColumn("first_v", first($"value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("last_v", last($"value").over(wFull))
        .orderBy($"event_id")
    },
    """SELECT event_id, user_id, value,
      |       LAG(value, 1) OVER w AS prev_v,
      |       LEAD(value, 1) OVER w AS next_v,
      |       FIRST_VALUE(value) OVER
      |         (PARTITION BY user_id ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
      |       LAST_VALUE(value) OVER
      |         (PARTITION BY user_id ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY event_id""".stripMargin)

  /** Frame specs: 7-row moving average + running total (§2.5). */
  private val windowFrame = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"event_id")
      Tables.events(s, dir)
        .select($"event_id", $"event_type", $"value")
        .withColumn("mov7",
          round(avg($"value").over(w.rowsBetween(-6, 0)), 4))
        .withColumn("rsum",
          round(sum($"value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .orderBy($"event_id")
    },
    """SELECT event_id, event_type, value,
      |       ROUND(AVG(value) OVER
      |         (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov7,
      |       ROUND(SUM(value) OVER
      |         (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS rsum
      |FROM events ORDER BY event_id""".stripMargin)

  /** Top-3 per group via rank-filter — the scalable per-group top-k (no
    * global sort; each partition sorts locally after one shuffle). */
  private val topkPerGroup = QueryDef(
    (s, dir) => {
      import s.implicits._
      // rank<=k over a 6-value group key looks like a serial sort trap,
      // but Spark 4's rank-limit pushdown inserts a PARTIAL
      // WindowGroupLimit below the exchange: each input partition keeps
      // only its local top-3 per group before shuffling (~18 rows per
      // partition), so the 6-partition final sort sees hundreds of rows,
      // not the fact table. The fan-out spread is what makes the partial
      // stage parallel — measured faster than an explicit salted
      // two-phase rewrite, which just adds a full extra shuffle.
      val w = Window.partitionBy($"l_returnflag", $"l_linestatus")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      Tables.spread(Tables.lineitem(s, dir), "l_orderkey")
        .select($"l_returnflag", $"l_linestatus", $"l_orderkey",
          $"l_linenumber".cast("long").as("l_linenumber"), $"l_extendedprice")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .orderBy($"l_returnflag", $"l_linestatus", $"rn")
    },
    """SELECT * FROM (
      |  SELECT l_returnflag, l_linestatus, l_orderkey,
      |         CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice,
      |         CAST(ROW_NUMBER() OVER
      |           (PARTITION BY l_returnflag, l_linestatus
      |            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_returnflag, l_linestatus, rn""".stripMargin)

  /** Ordered funnel per user: first click → first view AFTER that click
    * → first purchase AFTER that view (event_id order = event order).
    * The staged-conversion analytic every event pipeline needs; each
    * stage is one keyed aggregation + broadcast-size join back, so the
    * fact table streams through narrow conditional aggregates — no
    * window buffering, no per-user sort at 100 TB. */
  private val funnel = QueryDef(
    (s, dir) => {
      import s.implicits._
      // ONE keyed aggregation: gather each user's (event_id, type) pairs
      // sorted by id, then the three stage markers are pure array
      // arithmetic over that list — vs the naive 4-aggregation +
      // 4-join plan (5 shuffles of the fact table's keys). Per-user
      // event lists are bounded (funnel state is per-entity, not
      // per-corpus), so the collect_list buffer is small at any scale.
      val ev = Tables.spread(Tables.events(s, dir), "event_id")
        .select($"user_id", $"event_id", $"event_type")
      def firstAfter(evs: Column, tpe: String, after: Column): Column =
        array_min(transform(
          filter(evs, e => e("event_type") === tpe && e("event_id") > after),
          e => e("event_id")))
      // collect_list skips nulls, so non-funnel event types contribute
      // nothing to the buffer while their users still group (funnel rows
      // with stages_reached = 0); min-based stage math needs no sort
      ev.groupBy($"user_id")
        .agg(collect_list(when(
          $"event_type".isin("click", "view", "purchase"),
          struct($"event_id", $"event_type"))).as("evs"))
        .withColumn("c_id", firstAfter($"evs", "click", lit(Long.MinValue)))
        .withColumn("v_id", firstAfter($"evs", "view", $"c_id"))
        .withColumn("p_id", firstAfter($"evs", "purchase", $"v_id"))
        .select($"user_id", $"c_id", $"v_id", $"p_id",
          ($"c_id".isNotNull.cast("int") + $"v_id".isNotNull.cast("int") +
            $"p_id".isNotNull.cast("int")).cast("long").as("stages_reached"))
        .orderBy($"user_id")
    },
    """WITH ev AS (SELECT user_id, event_id, event_type FROM events),
      |c AS (SELECT user_id, MIN(event_id) AS c_id FROM ev
      |      WHERE event_type = 'click' GROUP BY user_id),
      |v AS (SELECT ev.user_id, MIN(event_id) AS v_id FROM ev JOIN c USING (user_id)
      |      WHERE event_type = 'view' AND event_id > c_id GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(event_id) AS p_id FROM ev JOIN v USING (user_id)
      |      WHERE event_type = 'purchase' AND event_id > v_id GROUP BY ev.user_id)
      |SELECT u.user_id, c.c_id, v.v_id, p.p_id,
      |       CAST((c.c_id IS NOT NULL)::INT + (v.v_id IS NOT NULL)::INT +
      |            (p.p_id IS NOT NULL)::INT AS BIGINT) AS stages_reached
      |FROM (SELECT DISTINCT user_id FROM ev) u
      |LEFT JOIN c USING (user_id) LEFT JOIN v USING (user_id)
      |LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin)

  /** Distribution window functions: percent_rank / cume_dist /
    * nth_value (§2.5 ranking family completion). The window orders by a
    * unique key so the rank ratios are exact integer divisions — both
    * engines produce the identical double. nth_value gets an explicit
    * running ROWS frame on both sides (frame defaults are the classic
    * cross-engine trap). */
  private val windowDist = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("nth2", nth_value($"o_totalprice", 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy($"o_orderstatus", $"o_orderkey")
    },
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |       PERCENT_RANK() OVER w AS pr,
      |       CUME_DIST() OVER w AS cd,
      |       NTH_VALUE(o_totalprice, 2) OVER
      |         (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth2
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin)

  /** SCD2 interval CONSTRUCTION from a change stream — the builder for
    * the dimension q_scd_join consumes: collapse consecutive
    * same-attribute events per user (lag ≠ current), then derive
    * [valid_from, valid_to) from lead() over the surviving changes;
    * open interval = current version. Timestamps emit as epoch seconds
    * (SURVEY.md §7.4 ns rule); ordering keys are unique (ts, event_id).
    * Scale: both windows partition by the high-cardinality user_id —
    * one shuffle, per-partition sorts. */
  private val scdBuild = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .withColumn("valid_from", $"ts".cast("long"))
        .withColumn("valid_to", lead($"valid_from", 1).over(w))
        .select($"user_id", $"event_id", $"event_type",
          $"valid_from", $"valid_to",
          $"valid_to".isNull.cast("long").as("is_current"))
        .orderBy($"user_id", $"valid_from", $"event_id")
    },
    """WITH ch AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |flt AS (
      |  SELECT user_id, event_type, ts, event_id FROM ch
      |  WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from,
      |         LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM flt)
      |SELECT user_id, event_id, event_type, valid_from, valid_to,
      |       CAST(valid_to IS NULL AS BIGINT) AS is_current
      |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin)

  /** Cohort retention matrix — the classic product-analytics reduction:
    * cohort = a user's first active date, cell (cohort, day_offset) =
    * distinct users of that cohort active offset days later. Scale:
    * activity de-dups to (user, day) first (the big shuffle, keyed by
    * high-cardinality user_id); the cohort join reuses that
    * partitioning; the final matrix is |cohorts × offsets| rows. */
  private val retention = QueryDef(
    (s, dir) => {
      import s.implicits._
      val act = Tables.events(s, dir)
        .select($"user_id", to_date($"ts").as("d")).distinct()
      val cohort = act.groupBy($"user_id").agg(min($"d").as("cohort"))
      act.join(cohort, "user_id")
        .groupBy($"cohort",
          datediff($"d", $"cohort").cast("long").as("day_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"day_offset")
    },
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |coh AS (SELECT user_id, MIN(d) AS cohort FROM act GROUP BY user_id)
      |SELECT cohort, CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
      |       COUNT(DISTINCT a.user_id) AS n_users
      |FROM act a JOIN coh c ON a.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** Value-RANGE frame (§2.5 frame-spec row, the variant q_window_frame's
    * ROWS frames can't express): per event, the count and value-sum of
    * the SAME USER's events in the trailing hour, keyed by epoch second.
    * ROWS frames count physical rows; RANGE frames bound by the ORDER
    * key's VALUE, so gaps and same-second peers are handled by the data,
    * not row positions — the correct shape for "activity in the last
    * hour" features. Ties (same user, same second) are frame PEERS on
    * both engines, so the frame set is deterministic without a unique
    * tiebreak key; the sum is a decimal sum (order-independent) rounded
    * in decimal before the double cast (r4s discipline).
    *
    * Scale: one shuffle on user_id (high-cardinality), per-partition
    * sort by epoch second — the standard windowed-feature plan. */
  private val windowRange = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"es")
        .rangeBetween(-3600L, 0L)
      Tables.events(s, dir)
        .select($"event_id", $"user_id", $"value",
          $"ts".cast("long").as("es"))
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          round(sum($"value".cast("decimal(28,10)")).over(w), 4)
            .cast("double"))
        .select($"event_id", $"user_id", $"es", $"cnt_1h", $"sum_1h")
        .orderBy($"event_id")
    },
    """WITH e AS (SELECT event_id, user_id, value,
      |                  CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) AS es
      |           FROM events)
      |SELECT event_id, user_id, es,
      |       COUNT(*) OVER w AS cnt_1h,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))) OVER w, 4)
      |            AS DOUBLE) AS sum_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY es
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin)

  /** First-order Markov transition matrix over per-user event streams:
    * count each (prev_type → next_type) adjacency in event_id order and
    * normalize per source state. The behavioral-model building block
    * (what follows a click?) and the Markov-chain analog of q_funnel.
    *
    * Ordering: event_id, the §7.4 unique-key tie rule — event times can
    * collide at µs precision across engines, ids cannot.
    *
    * Determinism: prob = cnt / total is ONE IEEE division of two exact
    * longs — bit-identical on both engines, no rounding needed.
    *
    * Scale: lag over (user_id, event_id) is one shuffle + per-user sort;
    * the (prev, next) rollup is a ≤|types|² two-phase hash agg; the
    * per-source total rides a tiny broadcastable self-aggregate, not a
    * second full-data pass. */
  private val markovTransition = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val pairs = Tables.events(s, dir)
        .select($"user_id", $"event_id", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNotNull)
        .groupBy($"prev", $"event_type".as("next"))
        .agg(count(lit(1)).as("cnt"))
      val totals = pairs.groupBy($"prev".as("p2"))
        .agg(sum($"cnt").as("total"))
      pairs.join(broadcast(totals), $"prev" === $"p2")
        .select($"prev", $"next", $"cnt", $"total",
          ($"cnt".cast("double") / $"total".cast("double")).as("prob"))
        .orderBy($"prev", $"next")
    },
    """WITH seq AS (
      |  SELECT event_type AS next,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      |  FROM events),
      |c AS (SELECT prev, next, COUNT(*) AS cnt FROM seq
      |      WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS total FROM c GROUP BY 1)
      |SELECT c.prev, c.next, c.cnt, t.total,
      |       CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS prob
      |FROM c JOIN t USING (prev)
      |ORDER BY c.prev, c.next""".stripMargin)

  /** Cumulative DISTINCT-user count per event_type by day — the window
    * operator Spark (and DuckDB) lack natively (COUNT(DISTINCT) OVER is
    * unsupported in both), implemented by the scalable first-occurrence
    * decomposition: a user contributes to the running distinct count
    * exactly once, on their first active day, so
    * `cum_distinct = running Σ of per-day first-appearance counts`.
    * Two hash aggregates ((type,user) → min day; (type,day) → counts)
    * + one tiny per-type window over ≤|days| rows — versus the naive
    * size(collect_set() OVER) which buffers every user id per row and
    * OOMs at 100 TB. Both engines replay the identical decomposition. */
  private val windowCountDistinct = QueryDef(
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_type", to_date($"ts").as("date"), $"user_id")
      val daily = ev.groupBy($"event_type", $"date")
        .agg(count(lit(1)).as("n_events"))
      val firsts = ev.groupBy($"event_type", $"user_id")
        .agg(min($"date").as("date"))
        .groupBy($"event_type", $"date")
        .agg(count(lit(1)).as("new_users"))
      daily.join(firsts, Seq("event_type", "date"), "left")
        .withColumn("new_users", coalesce($"new_users", lit(0L)))
        .withColumn("cum_distinct_users",
          sum($"new_users").over(
            Window.partitionBy($"event_type").orderBy($"date")))
        .orderBy($"event_type", $"date")
    },
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS date, user_id FROM events),
      |daily AS (
      |  SELECT event_type, date, COUNT(*) AS n_events
      |  FROM ev GROUP BY 1, 2),
      |firsts AS (
      |  SELECT event_type, date, COUNT(*) AS new_users FROM (
      |    SELECT event_type, user_id, MIN(date) AS date
      |    FROM ev GROUP BY 1, 2)
      |  GROUP BY 1, 2)
      |SELECT d.event_type, d.date, d.n_events,
      |       COALESCE(f.new_users, 0) AS new_users,
      |       CAST(SUM(COALESCE(f.new_users, 0))
      |         OVER (PARTITION BY d.event_type ORDER BY d.date)
      |         AS BIGINT) AS cum_distinct_users
      |FROM daily d LEFT JOIN firsts f
      |  ON d.event_type = f.event_type AND d.date = f.date
      |ORDER BY d.event_type, d.date""".stripMargin)

  /** Last-touch marketing attribution: each purchase credits the
    * user's most recent PRIOR non-purchase event (click/view/signup/
    * error → the "channel"); purchases with no prior touch credit
    * 'direct'. One per-user sort window with a 1-behind frame and
    * last(ignoreNulls) — the same linear no-self-join shape as the
    * as-of join; revenue rolls up in exact decimal. Window order is
    * (epoch second, event_id): sub-second ns ordering differs between
    * the engines' timestamp precisions, so the tie rule never touches
    * raw ts (SURVEY.md §7.4). */
  private val attribution = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_s", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select($"user_id", $"event_id", $"event_type", $"value",
          date_trunc("second", $"ts").cast("long").as("ts_s"))
        .withColumn("channel",
          last(when($"event_type" =!= "purchase", $"event_type"), true)
            .over(w))
        .filter($"event_type" === "purchase")
        .groupBy(coalesce($"channel", lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          Incremental.r4s(sum($"value".cast("decimal(28,10)")))
            .as("revenue"))
        .orderBy($"channel")
    },
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, value,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
      |  FROM events),
      |att AS (
      |  SELECT event_type, value,
      |         LAST_VALUE(CASE WHEN event_type <> 'purchase'
      |                    THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS channel
      |  FROM ev)
      |SELECT COALESCE(channel, 'direct') AS channel,
      |       COUNT(*) AS n_purchases,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 4) AS DOUBLE)
      |         AS revenue
      |FROM att WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** SAX discretization of the per-type daily series (Lin et al. 2003,
    * "A Symbolic Representation of Time Series") — the front door to
    * motif mining and symbolic anomaly matching: each (event_type, day)
    * mean (the exact r4a mean, q_daily_avg's discipline) is assigned a
    * quartile symbol a–d WITHIN its type via ntile(4) ordered by
    * (value, day). Empirical-quantile breakpoints rather than the
    * Gaussian table — distribution-free, and exact integer rank
    * arithmetic both engines implement identically (ANSI ntile:
    * equal buckets, remainder to the front).
    *
    * Scale: the window runs per event_type over DAYS (|days| rows per
    * partition after the daily aggregate) — aggregated frames only,
    * never raw events; the fact table contributes one two-phase
    * grouped mean. */
  private val saxSymbols = QueryDef(
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type", to_date($"ts").as("date"))
        .agg(Incremental.r4a(sum($"value".cast("decimal(28,10)")),
          count(lit(1))).as("avg_value"))
      val w = Window.partitionBy($"event_type")
        .orderBy($"avg_value", $"date")
      daily.withColumn("bin", ntile(4).over(w).cast("long"))
        .withColumn("symbol",
          element_at(lit(Array("a", "b", "c", "d")), $"bin".cast("int")))
        .select($"event_type", $"date", $"avg_value", $"bin", $"symbol")
        .orderBy($"event_type", $"date")
    },
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS date,
      |         FLOOR(CAST(CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 6) AS DECIMAL(24,6)) * 1000000 AS BIGINT) AS DOUBLE) / (COUNT(*) * 100.0) + 0.5) / 10000.0 AS avg_value
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, date, avg_value,
      |       CAST(NTILE(4) OVER (PARTITION BY event_type
      |              ORDER BY avg_value, date) AS BIGINT) AS bin,
      |       CASE NTILE(4) OVER (PARTITION BY event_type
      |              ORDER BY avg_value, date)
      |            WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c'
      |            ELSE 'd' END AS symbol
      |FROM d ORDER BY event_type, date""".stripMargin)

  /** Top entry paths — the sequence-mining census funnels don't give
    * you: each user's first three event types in event order, joined
    * '>'-delimited, counted across users, top-20 by (users desc, path).
    * The q_funnel ordering idiom (event_id, the deterministic arrival
    * key) — never raw ns timestamps.
    *
    * Scale: rn ≤ 3 over the user window is a WindowGroupLimit — the
    * per-user top-k prunes BEFORE the full sort materializes; the path
    * assembly aggregates ≤3 rows per user; the path census then
    * aggregates |users| rows; the top-20 is TakeOrderedAndProject. */
  private val eventPaths = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"event_id", $"event_type")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .groupBy($"user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct($"rn", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_users"))
        .orderBy($"n_users".desc, $"path")
        .limit(20)
    },
    """WITH r AS (SELECT user_id, event_type,
      |             ROW_NUMBER() OVER (PARTITION BY user_id
      |               ORDER BY event_id) AS rn
      |           FROM events),
      |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |      FROM r WHERE rn <= 3 GROUP BY 1)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY 1
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin)

  /** Kaplan-Meier survival table (Kaplan & Meier 1958) over
    * signup→purchase conversion with right-censoring — the
    * survival-analysis member next to q_retention (cohort grid) and
    * q_time_to_convert (point estimate): per signup user, duration =
    * whole days from first signup to first at-or-after purchase
    * (event) or to the user's last event (censored). The life table
    * emits, per exit day: conversions d_i, total exits, the at-risk
    * count n_i (everyone who survived past all earlier exit days), and
    * the running LOG-survival ln Ŝ = Σ_{j≤i} ln((n_j − d_j)/n_j).
    * Log-survival, not Ŝ itself: exp is not correctly-rounded IEEE so
    * Ŝ = e^x could flip a final digit cross-engine, while each ln term
    * is ONE IEEE op on exact-integer-derived operands cast to
    * decimal(28,10), the running sum is exact decimal, and the
    * emission rounds IN DECIMAL (the q_doc_logprob discipline). A day
    * with d_i = n_i (extinction, ln 0) yields a NULL term skipped by
    * both engines' SUM — can't arise while any censored user remains;
    * the fixture never hits it.
    *
    * Scale: two two-phase aggregates (per-user reduction keyed by
    * high-cardinality user_id, then the |days| life table); both
    * windows run over the ~|distinct durations| AGGREGATED rows only
    * (the q_sax/q_window_count_distinct pattern) — never raw events;
    * the cohort total is a 1-row broadcast. */
  private val survivalKm = QueryDef(
    (s, dir) => {
      import s.implicits._
      val perUser = Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "signup", $"ts")).as("t0"),
          min(when($"event_type" === "purchase", $"ts")).as("tp"),
          max($"ts").as("tlast"))
      val cohort = perUser
        .filter($"t0".isNotNull && $"tlast".cast("long") >= $"t0".cast("long"))
        .select(
          ($"tp".isNotNull && $"tp" >= $"t0").cast("int").as("converted"),
          expr("(CAST(CASE WHEN tp IS NOT NULL AND tp >= t0 THEN tp " +
            "ELSE tlast END AS LONG) - CAST(t0 AS LONG)) div 86400").as("dur"))
      val tot = cohort.agg(count(lit(1)).as("n_total"))
      val byDay = cohort.groupBy($"dur")
        .agg(count(lit(1)).as("n_exit"),
          sum($"converted").cast("long").as("d_i"))
        .crossJoin(broadcast(tot))
      val wPrev = Window.orderBy($"dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.orderBy($"dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDay
        .withColumn("n_risk",
          $"n_total" - coalesce(sum($"n_exit").over(wPrev), lit(0L)))
        .withColumn("lnterm",
          when($"d_i" < $"n_risk",
            log(($"n_risk" - $"d_i").cast("double") / $"n_risk".cast("double"))
              .cast("decimal(28,10)")))
        .select($"dur", $"d_i", $"n_exit", $"n_risk",
          round(sum($"lnterm").over(wRun), 4).cast("double").as("log_surv"))
        .orderBy($"dur")
    },
    """WITH per_user AS (
      |  SELECT user_id,
      |         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
      |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
      |         MAX(ts) AS tlast
      |  FROM events GROUP BY user_id),
      |cohort AS (
      |  SELECT CAST(tp IS NOT NULL AND tp >= t0 AS INT) AS converted,
      |         (CAST(FLOOR(epoch(CASE WHEN tp IS NOT NULL AND tp >= t0
      |                  THEN tp ELSE tlast END)) AS BIGINT)
      |          - CAST(FLOOR(epoch(t0)) AS BIGINT)) // 86400 AS dur
      |  FROM per_user
      |  WHERE t0 IS NOT NULL
      |    AND CAST(FLOOR(epoch(tlast)) AS BIGINT)
      |        >= CAST(FLOOR(epoch(t0)) AS BIGINT)),
      |tot AS (SELECT COUNT(*) AS n_total FROM cohort),
      |by_day AS (
      |  SELECT dur, COUNT(*) AS n_exit, CAST(SUM(converted) AS BIGINT) AS d_i
      |  FROM cohort GROUP BY dur),
      |risk AS (
      |  SELECT dur, d_i, n_exit,
      |         n_total - COALESCE(SUM(n_exit) OVER (ORDER BY dur
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS n_risk
      |  FROM by_day CROSS JOIN tot),
      |terms AS (
      |  SELECT dur, d_i, n_exit, n_risk,
      |         CASE WHEN d_i < n_risk THEN
      |           CAST(LN(CAST(n_risk - d_i AS DOUBLE)
      |                   / CAST(n_risk AS DOUBLE)) AS DECIMAL(28,10))
      |         END AS lnterm
      |  FROM risk)
      |SELECT dur, d_i, n_exit, CAST(n_risk AS BIGINT) AS n_risk,
      |       CAST(ROUND(SUM(lnterm) OVER (ORDER BY dur
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
      |         AS DOUBLE) AS log_surv
      |FROM terms ORDER BY dur""".stripMargin)

  val defs: Seq[(String, QueryDef)] = Seq(
    "q_survival_km" -> survivalKm,
    "q_sax_symbols" -> saxSymbols,
    "q_event_paths" -> eventPaths,
    "q_window_count_distinct" -> windowCountDistinct,
    "q_attribution" -> attribution,
    "q_markov_transition" -> markovTransition,
    "q_window_range" -> windowRange,
    "q_window_dist" -> windowDist,
    "q_window_rank" -> windowRank,
    "q_window_analytic" -> windowAnalytic,
    "q_window_frame" -> windowFrame,
    "q_topk_per_group" -> topkPerGroup,
    "q_funnel" -> funnel,
    "q_scd_build" -> scdBuild,
    "q_retention" -> retention)
}
