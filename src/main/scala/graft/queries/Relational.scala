package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops._

/** Relational operator queries (SURVEY.md §2.2–§2.8) over the driver's
  * TPC-H-ish fixtures, each with a DuckDB oracle.
  *
  * Float discipline for cross-engine hash parity: sums/avgs of
  * non-integral doubles are rounded (addition order differs between
  * engines); integral doubles (l_quantity) and raw column passthroughs
  * are exact and left unrounded.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Shadows functions.round for (Column, Int): every rounded double in
    * these queries must use DuckDB's double-rounding semantics for hash
    * parity — see graft.ops.Numeric.roundAway.
    */
  private def round(c: org.apache.spark.sql.Column, scale: Int) =
    Numeric.roundAway(c, scale)

  /** Exact 2-dp decimal view of a double column. Every oracle-compared
    * SUM over non-integral doubles goes through this: double addition is
    * non-associative, so Spark's partial-agg order vs DuckDB's scan
    * order can differ in the last ULP and land on opposite sides of a
    * rounding boundary. The fixture doubles are all 2-dp values, so
    * summing DECIMAL(18,2) is exact and order-independent in both
    * engines; the final cast back to double is then deterministic.
    */
  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val qs: Seq[Q] = Seq(

    // ---- A1/A2-style pricing summary: filter pushdown + hash agg ----
    Q("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double").as("sum_disc_price"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
              sum(l_quantity) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              count(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus""")),

    // ---- P6/P16-19-style filter + projection (pushed to parquet) ----
    Q("q02_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .where(col("l_shipdate").between(
            to_timestamp(lit("1996-01-01")), to_timestamp(lit("1996-12-31")))
            && col("l_discount") >= 0.05 && col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
              round(l_extendedprice * (1 - l_discount), 2) AS net_price
              FROM lineitem
              WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
                AND l_discount >= 0.05 AND l_quantity < 10""")),

    // ---- J8-style broadcast dimension join + agg ----
    Q("q03_join_agg",
      (s, dir) => {
        val c = broadcast(t(s, dir, "customer"))
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("order_year"))
          .agg(
            sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double").as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
      },
      Some("""SELECT c_mktsegment, CAST(year(o_orderdate) AS INTEGER) AS order_year,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              count(DISTINCT o_orderkey) AS n_orders
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment, CAST(year(o_orderdate) AS INTEGER)""")),

    // ---- J12 semi-join ----
    Q("q04_semi_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val big = t(s, dir, "lineitem").where(col("l_quantity") >= 45)
          .select(col("l_orderkey"))
        Joins.semiFilter(o.withColumnRenamed("o_orderkey", "l_orderkey"), big, Seq("l_orderkey"))
          .select(col("l_orderkey").as("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey AND l_quantity >= 45)""")),

    // ---- J5/J6 anti-join ----
    Q("q05_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        Joins.newKeys(c, o, "c_custkey").select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // ---- J4/D7 calendar × dimension with validity filter ----
    Q("q06_calendar_expand",
      (s, dir) => {
        val dates = TimeOps.dateGrid(s, "1995-01-01", "1995-03-31")
        val dim = t(s, dir, "region").select(
          col("r_regionkey"), col("r_name"),
          date_add(to_date(lit("1995-01-01")), col("r_regionkey") * 7).as("valid_from"),
          date_add(to_date(lit("1995-01-01")), col("r_regionkey") * 7 + 30).as("valid_to"))
        Joins.expandValidDates(dates, dim, "data_date", "valid_from", "valid_to")
      },
      Some("""SELECT d.data_date, r.* FROM
              (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                       INTERVAL 1 DAY)) AS DATE) AS data_date) d
              CROSS JOIN (SELECT r_regionkey, r_name,
                          DATE '1995-01-01' + r_regionkey * 7 AS valid_from,
                          DATE '1995-01-01' + r_regionkey * 7 + 30 AS valid_to
                          FROM region) r
              WHERE d.data_date BETWEEN r.valid_from AND r.valid_to""")),

    // ---- J10 point-in-interval join (equi key + range residual) ----
    Q("q07_interval_join",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        Joins.intervalJoin(l, o, Seq("l_orderkey"),
          point = l("l_shipdate"), lo = col("o_orderdate"),
          hi = col("o_orderdate") + expr("interval 90 days"),
          broadcastDim = false)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_in_window"), sum(col("l_quantity")).as("qty"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_in_window, sum(l_quantity) AS qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
              GROUP BY o_orderpriority""")),

    // ---- J9 lag-join: hourly per-user series joined to itself -24h ----
    Q("q08_lag_join",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour_ts"))
          .agg(sum(dec2(col("value"))).cast("double").as("v"))
        Joins.lagJoin(hourly, Seq("user_id"), "hour_ts", 86400, Seq("v"), "_prev")
          .select(col("user_id"), col("hour_ts"), col("v"), col("v_prev"))
      },
      Some("""WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS hour_ts,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                FROM events GROUP BY 1, 2)
              SELECT a.user_id, a.hour_ts, a.v, b.v AS v_prev
              FROM hourly a LEFT JOIN hourly b
                ON a.user_id = b.user_id
               AND b.hour_ts + INTERVAL 24 HOURS = a.hour_ts""")),

    // ---- W1/W2 centered rolling mean with frollapply edge-NULLs ----
    Q("q09_rolling_impute",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        Windows.centeredRollingMean(daily, Seq("user_id"), "d", "n", 2, "roll")
          .select(col("user_id"), col("d"), col("n"), round(col("roll"), 4).as("roll"))
      },
      Some("""WITH daily AS (
                SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
                FROM events GROUP BY 1, 2)
              SELECT user_id, d, n,
                round(CASE WHEN count(*) OVER w = 5 THEN avg(n) OVER w END, 4) AS roll
              FROM daily
              WINDOW w AS (PARTITION BY user_id ORDER BY d
                           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""")),

    // ---- A6/A7 QAQC: appended per-group count + exact median ----
    Q("q10_qaqc_median",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_id"), col("event_type"), col("value"))
        Aggs.withGroupCountMedian(e, Seq("event_type"), "value")
          .where(col("n") > 100 && col("med") >= 40)
          .select(col("event_id"), col("event_type"), col("value"),
            col("n"), round(col("med"), 4).as("med"))
      },
      Some("""SELECT event_id, event_type, value, n, round(med, 4) AS med FROM (
                SELECT event_id, event_type, value,
                       count(*) OVER w AS n, median(value) OVER w AS med
                FROM events
                WINDOW w AS (PARTITION BY event_type)) q
              WHERE n > 100 AND med >= 40""")),

    // ---- A8 completeness admission filter ----
    Q("q11_completeness",
      (s, dir) => {
        val e = t(s, dir, "events").withColumn("d", to_date(col("ts")))
        Aggs.completeKeys(e, Seq("user_id"), "d", lit(2.0), 0.5)
      },
      Some("""SELECT user_id FROM (
                SELECT user_id, min(n / 2.0) AS m FROM (
                  SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
                  FROM events GROUP BY 1, 2) g
                GROUP BY user_id) q
              WHERE m >= 0.5""")),

    // ---- A3/A5 two-level rollup detector→node analogue ----
    Q("q12_two_level_rollup",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("hour_ts", date_trunc("hour", col("ts")))
        Aggs.twoLevelRollup(e,
          Seq("user_id", "hour_ts"),
          Seq(sum(dec2(col("value"))).as("v"), count(lit(1)).as("n")),
          Seq("hour_ts"),
          Seq(sum(col("v")).cast("double").as("v_sum"), count(col("v")).as("v_num"),
            sum(col("n")).as("n_total"),
            round(sum(col("v")).cast("double") / count(col("v")), 4).as("v_avg")))
      },
      Some("""WITH inner_agg AS (
                SELECT user_id, date_trunc('hour', ts) AS hour_ts,
                       sum(CAST(value AS DECIMAL(18,2))) AS v, count(*) AS n
                FROM events GROUP BY 1, 2)
              SELECT hour_ts, CAST(sum(v) AS DOUBLE) AS v_sum, count(v) AS v_num,
                     CAST(sum(n) AS BIGINT) AS n_total,
                     round(CAST(sum(v) AS DOUBLE) / count(v), 4) AS v_avg
              FROM inner_agg GROUP BY hour_ts""")),

    // ---- A1/D2 15-minute bucketed agg with NA-skipping sum + pct-null ----
    Q("q13_window_15min",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("v", when(col("value") < 20, lit(null)).otherwise(col("value")))
        Aggs.timeBucketAgg(e, "ts", 900, Seq("event_type"),
          Seq(count(lit(1)).as("n"),
            coalesce(sum(dec2(col("v"))), lit(0)).cast("double").as("v_sum"),
            Aggs.pctNull(col("v")).as("pct_null")))
      },
      Some("""SELECT event_type,
                time_bucket(INTERVAL 15 MINUTES, ts) AS bucket_start,
                count(*) AS n,
                CAST(coalesce(sum(CAST(v AS DECIMAL(18,2))), 0) AS DOUBLE) AS v_sum,
                round(avg(CASE WHEN v IS NULL THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_null
              FROM (SELECT event_type, ts,
                      CASE WHEN value < 20 THEN NULL ELSE value END AS v
                    FROM events) e
              GROUP BY 1, 2""")),

    // ---- P13 scale-up imputation over synthesized gaps ----
    Q("q14_impute_scale",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .withColumn("v", when(col("l_discount") < 0.02, lit(null)).otherwise(col("l_quantity")))
        l.groupBy(col("l_orderkey"))
          .agg(Aggs.pctNull(col("v")).as("pct_null"),
            Aggs.sumNaRm(col("v")).as("v_sum"))
          .withColumn("v_impute", Tidy.scaleUpImpute(col("v_sum"), col("pct_null")))
      },
      Some("""SELECT l_orderkey,
                round(avg(CASE WHEN v IS NULL THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_null,
                coalesce(sum(v), 0) AS v_sum,
                CASE WHEN round(avg(CASE WHEN v IS NULL THEN 1.0 ELSE 0.0 END) * 100, 1) < 100
                     THEN round(coalesce(sum(v), 0) /
                          (1 - round(avg(CASE WHEN v IS NULL THEN 1.0 ELSE 0.0 END) * 100, 1) / 100))
                END AS v_impute
              FROM (SELECT l_orderkey,
                      CASE WHEN l_discount < 0.02 THEN NULL ELSE l_quantity END AS v
                    FROM lineitem) l
              GROUP BY l_orderkey""")),

    // ---- P8/P12 gated ratio derivation (speed formula shape) ----
    Q("q15_gated_ratio",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            Tidy.speed(col("l_quantity"), col("l_discount"), lit(500.0)).as("speed"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
                CASE WHEN l_quantity <> 0 AND l_discount >= 0.002
                     THEN round((l_quantity * 2.0 * 500.0) / (5280 * l_discount), 1)
                END AS speed
              FROM lineitem""")),

    // ---- rollup grouping sets (generalized engine surface) ----
    Q("q16_rollup_cube",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = broadcast(t(s, dir, "customer"))
        val n = broadcast(t(s, dir, "nation"))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("total"))
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
                     coalesce(o_orderpriority, 'ALL') AS priority,
                     count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY ROLLUP(n_name, o_orderpriority)""")),

    // ---- A9 watermark (incremental driver) ----
    Q("q17_watermark",
      (s, dir) => {
        t(s, dir, "orders")
          .agg(max(to_date(col("o_orderdate"))).as("max_date"))
          .withColumn("next_start", date_add(col("max_date"), 1))
      },
      Some("""SELECT CAST(max(o_orderdate) AS DATE) AS max_date,
                     CAST(max(o_orderdate) AS DATE) + 1 AS next_start
              FROM orders""")),

    // ---- D1/D5/D6 date-part extraction + timestamp recomposition ----
    Q("q18_date_parts",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.select(col("event_id"),
          year(col("ts")).as("y"),
          dayofyear(col("ts")).as("doy"),
          hour(col("ts")).as("h"),
          TimeOps.weekdaySunFirst(col("ts")).as("dow"),
          TimeOps.secondsOfDay(col("ts")).as("sod"),
          TimeOps.composeTimestamp(to_date(col("ts")), hour(col("ts")),
            minute(col("ts")).cast("double") +
              when(second(col("ts")) >= 30, 0.5).otherwise(0.0)).as("ts30"))
      },
      Some("""SELECT event_id,
                CAST(year(ts) AS INTEGER) AS y,
                CAST(dayofyear(ts) AS INTEGER) AS doy,
                CAST(hour(ts) AS INTEGER) AS h,
                CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
                CAST(floor(epoch(ts)) - floor(epoch(date_trunc('day', ts))) AS INTEGER) AS sod,
                CAST(ts AS DATE)::TIMESTAMP
                  + (hour(ts) * 3600 + minute(ts) * 60
                     + CASE WHEN CAST(second(ts) AS INTEGER) >= 30 THEN 30 ELSE 0 END)
                    * INTERVAL 1 SECOND AS ts30
              FROM events""")),

    // ---- P1/P2/P3 string path split / join / trim ----
    Q("q19_split_unite",
      (s, dir) => {
        val p = t(s, dir, "part")
        val split3 = Tidy.pathSplit(
          p.select(col("p_partkey"), col("p_name")), "p_name", " ",
          Seq("seg1", "seg2", "seg3"), keepSrc = false)
        Tidy.pathJoin(split3, "rejoined", "/", Seq("seg1", "seg2", "seg3"))
          .select(col("p_partkey"), col("seg1"), col("seg2"), col("seg3"), col("rejoined"))
      },
      Some("""SELECT p_partkey,
                nullif(split_part(p_name, ' ', 1), '') AS seg1,
                nullif(split_part(p_name, ' ', 2), '') AS seg2,
                nullif(split_part(p_name, ' ', 3), '') AS seg3,
                concat_ws('/', nullif(split_part(p_name, ' ', 1), ''),
                               nullif(split_part(p_name, ' ', 2), ''),
                               nullif(split_part(p_name, ' ', 3), '')) AS rejoined
              FROM part""")),

    // ---- P7 empty→NULL + P8 conditional + null-safe row mean (P14) ----
    Q("q20_null_handling",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("a", when(col("o_totalprice") < 50000, lit(null)).otherwise(col("o_totalprice")))
          .withColumn("b", when(col("o_totalprice") > 250000, lit(null)).otherwise(col("o_totalprice")))
        o.select(col("o_orderkey"), round(Tidy.rowMean2(col("a"), col("b")), 2).as("ab_mean"))
      },
      Some("""SELECT o_orderkey,
                round((coalesce(a, b) + coalesce(b, a)) / 2, 2) AS ab_mean
              FROM (SELECT o_orderkey,
                      CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS a,
                      CASE WHEN o_totalprice > 250000 THEN NULL ELSE o_totalprice END AS b
                    FROM orders) q""")),

    // ---- TPC-H Q5-shaped multiway join: local-supplier revenue.
    //      Exercises every fixture table; the two dimension chains
    //      broadcast, lineitem joins orders co-partitioned. ----
    Q("q23_multiway_join",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = broadcast(t(s, dir, "customer"))
        val su = broadcast(t(s, dir, "supplier"))
        val n = broadcast(t(s, dir, "nation"))
        val re = broadcast(t(s, dir, "region"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .join(re, n("n_regionkey") === re("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              count(*) AS n_items
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name""")),

    // ---- window ranking: top-3 line items per order by net price
    //      (generalized-engine surface; ref has no ranking, SURVEY §2.6) ----
    Q("q24_window_rank",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .withColumn("net", round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2))
        l.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("l_orderkey"))
              .orderBy(col("net").desc, col("l_linenumber"))))
          .where(col("rk") <= 3)
          .select(col("l_orderkey"), col("rk"), col("l_linenumber"), col("net"))
      },
      Some("""SELECT l_orderkey, rk, l_linenumber, net FROM (
                SELECT l_orderkey, l_linenumber,
                  round(l_extendedprice * (1 - l_discount), 2) AS net,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY round(l_extendedprice * (1 - l_discount), 2) DESC,
                             l_linenumber) AS rk
                FROM lineitem) q
              WHERE rk <= 3""")),

    // ---- set operations: union / intersect / except (A10 + §2.6) ----
    Q("q25_set_ops",
      (s, dir) => {
        val big = t(s, dir, "lineitem").where(col("l_quantity") >= 45)
          .select(col("l_orderkey"))
        val cheap = t(s, dir, "lineitem").where(col("l_discount") >= 0.09)
          .select(col("l_orderkey"))
        val u = big.union(cheap).distinct().withColumn("op", lit("union"))
        val i = big.intersect(cheap).withColumn("op", lit("intersect"))
        val e = big.except(cheap).withColumn("op", lit("except"))
        u.unionByName(i).unionByName(e)
      },
      Some("""WITH big AS (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45),
                   cheap AS (SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
              SELECT l_orderkey, 'union' AS op FROM (SELECT DISTINCT l_orderkey FROM (SELECT * FROM big UNION ALL SELECT * FROM cheap))
              UNION ALL
              SELECT l_orderkey, 'intersect' AS op FROM (SELECT DISTINCT b.l_orderkey FROM big b WHERE EXISTS (SELECT 1 FROM cheap c WHERE c.l_orderkey = b.l_orderkey))
              UNION ALL
              SELECT l_orderkey, 'except' AS op FROM (SELECT DISTINCT b.l_orderkey FROM big b WHERE NOT EXISTS (SELECT 1 FROM cheap c WHERE c.l_orderkey = b.l_orderkey))""")),

    // ---- semi-structured: JSON property extraction + typed agg
    //      (engine surface: from_json/get_json_object over a string
    //      column — the schema-on-read path) ----
    Q("q26_json_extract",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n_with_k"),
            sum(col("k")).as("k_sum"),
            min(col("k")).as("k_min"),
            max(col("k")).as("k_max"))
      },
      Some("""SELECT event_type,
                count(CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
                CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
                min(CAST(props->>'$.k' AS INTEGER)) AS k_min,
                max(CAST(props->>'$.k' AS INTEGER)) AS k_max
              FROM events GROUP BY event_type""")),

    // ---- sessionization: gaps-and-islands via lag + running sum
    //      (cumulative window class; 30-min inactivity gap) ----
    Q("q27_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val e = t(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
              .otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        e.groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("sess_start"),
            max(col("ts")).as("sess_end"))
          .withColumn("sess_seconds",
            unix_timestamp(col("sess_end")) - unix_timestamp(col("sess_start")))
      },
      Some("""WITH flagged AS (
                SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              sess AS (
                SELECT user_id, ts,
                  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
                FROM flagged)
              SELECT user_id, sess_id, count(*) AS n_events,
                min(ts) AS sess_start, max(ts) AS sess_end,
                CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS sess_seconds
              FROM sess GROUP BY user_id, sess_id""")),

    // ---- sliding-window aggregation: 30-min windows sliding by 15
    //      (each event lands in width/slide = 2 windows) ----
    Q("q28_sliding_window",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"),
            window(col("ts"), "30 minutes", "15 minutes"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("v_sum"))
          .select(col("event_type"), col("window.start").as("win_start"),
            col("n"), col("v_sum"))
      },
      Some("""WITH slid AS (
                SELECT event_type, value,
                  time_bucket(INTERVAL 15 MINUTES, ts) - k * INTERVAL 15 MINUTES AS win_start
                FROM events, (SELECT unnest([0, 1]) AS k))
              SELECT event_type, win_start, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
              FROM slid GROUP BY event_type, win_start""")),

    // ---- pivot: order-priority counts per year as columns (wide
    //      reshape; oracle via portable conditional aggregation) ----
    Q("q29_pivot",
      (s, dir) => {
        val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        t(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("order_year"))
          .pivot("o_orderpriority", priorities)
          .agg(count(lit(1)))
          .select(col("order_year") +: priorities.map(p =>
            coalesce(col(s"`$p`"), lit(0L)).as(p.toLowerCase.replaceAll("[^a-z0-9]+", "_"))): _*)
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                count(*) FILTER (o_orderpriority = '1-URGENT') AS "1_urgent",
                count(*) FILTER (o_orderpriority = '2-HIGH') AS "2_high",
                count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3_medium",
                count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4_not_specified",
                count(*) FILTER (o_orderpriority = '5-LOW') AS "5_low"
              FROM orders GROUP BY 1""")),

    // ---- cube: all grouping-set combinations with grouping ids ----
    Q("q29b_cube",
      (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                     coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ---- SQL facade: the same engine through spark.sql over temp
    //      views (TPC-H Q3 shape) — parser/analyzer/optimizer path ----
    Q("q60_sql_facade",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("v_customer")
        t(s, dir, "orders").createOrReplaceTempView("v_orders")
        t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
        s.sql("""
          SELECT l_orderkey,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                 o_orderdate, o_orderpriority
          FROM v_customer JOIN v_orders ON c_custkey = o_custkey
          JOIN v_lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1995-03-15'
            AND l_shipdate > TIMESTAMP '1995-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority""")
      },
      Some("""SELECT l_orderkey,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                o_orderdate, o_orderpriority
              FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1995-03-15'
                AND l_shipdate > TIMESTAMP '1995-03-15'
              GROUP BY l_orderkey, o_orderdate, o_orderpriority""")),

    // ---- exact interpolated percentiles (A7 generalized): both
    //      engines sort-and-interpolate, so values hash-match ----
    Q("q61_quantiles",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.25)"), 6).as("p25"),
            round(expr("percentile(value, 0.5)"), 6).as("p50"),
            round(expr("percentile(value, 0.75)"), 6).as("p75"),
            round(expr("percentile(value, 0.99)"), 6).as("p99"))
      },
      Some("""SELECT event_type,
                round(quantile_cont(value, 0.25), 6) AS p25,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.75), 6) AS p75,
                round(quantile_cont(value, 0.99), 6) AS p99
              FROM events GROUP BY event_type""")),

    // ---- q61's scale path: bounded-state quantile SKETCH. Exact
    //      percentile holds every value per group in memory; at 100 TB
    //      approx_percentile keeps a fixed-size summary per group with
    //      bounded relative error (accuracy 10000 ⇒ ~0.01%). Sketch
    //      internals are engine-specific → rows-only, with the spec
    //      pinning sketch-vs-exact agreement ----
    Q("q58_approx_quantiles",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("approx_percentile(value, 0.25, 10000)"), 6).as("p25"),
            round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
            round(expr("approx_percentile(value, 0.99, 10000)"), 6).as("p99"))
      },
      None),

    // ---- q58's CONTRACT under the driver gate (the q166 empty-audit
    //      pattern; q61 is the exact hash-green twin): the sketch's
    //      guarantee is on RANK, not value — the returned element's
    //      admissible rank interval [count(<v)+1, count(≤v)] must
    //      intersect p·n ± n/accuracy (+1 slack for the floor/ceil
    //      edge). Checked per (group, quantile) against exact counts;
    //      the oracle asserts EMPTY. The rank-count join broadcasts
    //      the per-group sketch results (groups are tiny), so the
    //      audit adds one scan, no extra full-stream shuffle ----
    Q("q191_quantile_rank_audit",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("value"))
          .where(col("value").isNotNull)
        val apx = ev.groupBy(col("event_type")).agg(
          expr("approx_percentile(value, 0.25, 10000)").as("a25"),
          expr("approx_percentile(value, 0.5, 10000)").as("a50"),
          expr("approx_percentile(value, 0.99, 10000)").as("a99"),
          count(lit(1)).as("n"))
        val ranks = ev.join(broadcast(apx), "event_type")
          .groupBy(col("event_type")).agg(
            first(col("n")).as("n"),
            first(col("a25")).as("a25"), first(col("a50")).as("a50"),
            first(col("a99")).as("a99"),
            sum(when(col("value") <= col("a25"), 1L).otherwise(0L)).as("le25"),
            sum(when(col("value") < col("a25"), 1L).otherwise(0L)).as("lt25"),
            sum(when(col("value") <= col("a50"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < col("a50"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= col("a99"), 1L).otherwise(0L)).as("le99"),
            sum(when(col("value") < col("a99"), 1L).otherwise(0L)).as("lt99"))
        def leg(p: Double, tag: String, le: String, lt: String) = ranks
          .where(col(le) < lit(p) * col("n") - col("n") / 10000.0 - 1 ||
            col(lt) + 1 > lit(p) * col("n") + col("n") / 10000.0 + 1)
          .select(col("event_type"), lit(tag).as("quantile"), col("n"),
            col(le).as("rank_le"), col(lt).as("rank_lt"))
        leg(0.25, "p25", "le25", "lt25")
          .unionByName(leg(0.5, "p50", "le50", "lt50"))
          .unionByName(leg(0.99, "p99", "le99", "lt99"))
      },
      Some("""SELECT CAST(NULL AS VARCHAR) AS event_type,
                     CAST(NULL AS VARCHAR) AS quantile,
                     CAST(NULL AS BIGINT) AS n,
                     CAST(NULL AS BIGINT) AS rank_le,
                     CAST(NULL AS BIGINT) AS rank_lt
              WHERE 1 = 0""")),

    // ---- string-function suite over part names ----
    Q("q62_string_funcs",
      (s, dir) => {
        t(s, dir, "part").select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("first5"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
          concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
          length(col("p_name")).as("len"),
          instr(col("p_name"), " ").as("first_space"))
      },
      Some("""SELECT p_partkey, upper(p_name) AS up,
                substr(p_name, 1, 5) AS first5,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
                lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
                concat_ws('|', p_brand, p_type) AS joined,
                CAST(length(p_name) AS INTEGER) AS len,
                CAST(instr(p_name, ' ') AS INTEGER) AS first_space
              FROM part""")),

    // ---- conditional aggregation: count_if / any / every ----
    Q("q63_conditional_agg",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count_if(col("l_discount") > 0.05).as("n_discounted"),
            count_if(col("l_quantity") >= 45).as("n_bulk"),
            max(col("l_tax") > 0.07).as("any_high_tax"),
            min(col("l_quantity") > 0).as("all_positive_qty"))
      },
      Some("""SELECT l_returnflag,
                count(*) FILTER (l_discount > 0.05) AS n_discounted,
                count(*) FILTER (l_quantity >= 45) AS n_bulk,
                bool_or(l_tax > 0.07) AS any_high_tax,
                bool_and(l_quantity > 0) AS all_positive_qty
              FROM lineitem GROUP BY l_returnflag""")),

    // ---- ranking-function catalogue over a deterministic ordering ----
    Q("q64_rank_suite",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .where(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            round(percent_rank().over(w), 6).as("prnk"),
            ntile(4).over(w).as("quartile"),
            round(cume_dist().over(w), 6).as("cdist"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                round(percent_rank() OVER w, 6) AS prnk,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                round(cume_dist() OVER w, 6) AS cdist,
                lead(o_orderkey, 1) OVER w AS next_key
              FROM orders WHERE o_orderkey % 100 = 0
              WINDOW w AS (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey)""")),

    // ---- generator with ordinal: positional token explode ----
    Q("q65_posexplode",
      (s, dir) => {
        t(s, dir, "part")
          .where(col("p_partkey") % 50 === 0)
          .select(col("p_partkey"),
            posexplode(split(col("p_name"), " ")))
          .withColumnRenamed("pos", "word_idx")
          .withColumnRenamed("col", "word")
      },
      Some("""WITH arrs AS (
                SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS words
                FROM part WHERE p_partkey % 50 = 0)
              SELECT p_partkey, CAST(i - 1 AS INTEGER) AS word_idx,
                     words[CAST(i AS INTEGER)] AS word
              FROM arrs, unnest(generate_series(1, len(words))) AS u(i)""")),

    // ---- RANGE window frame: 24-hour trailing sum per user (range
    //      frames vs the rows frames of q09/q27) ----
    Q("q66_range_frame",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-86400, 0)
        t(s, dir, "events")
          .where(col("user_id") % 20 === 0)
          .select(col("user_id"), col("ts"),
            sum(dec2(col("value"))).over(w).cast("double").as("trailing_24h"),
            count(lit(1)).over(w).as("n_24h"))
      },
      Some("""SELECT user_id, ts,
                CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_24h,
                count(*) OVER w AS n_24h
              FROM events WHERE user_id % 20 = 0
              WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)""")),

    // ---- first/last_value over explicit frames ----
    Q("q67_first_last",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "events")
          .where(col("user_id") % 25 === 0)
          .select(col("user_id"), col("ts"),
            first(col("event_type")).over(w).as("first_type"),
            last(col("event_type")).over(wFull).as("last_type"),
            min(col("ts")).over(wFull).as("user_start"),
            max(col("ts")).over(wFull).as("user_end"))
      },
      Some("""SELECT user_id, ts,
                first_value(event_type) OVER w AS first_type,
                last_value(event_type) OVER wf AS last_type,
                min(ts) OVER wf AS user_start,
                max(ts) OVER wf AS user_end
              FROM events WHERE user_id % 25 = 0
              WINDOW w AS (PARTITION BY user_id ORDER BY ts),
                     wf AS (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // ---- date-arithmetic suite: month math, clamping, truncation ----
    Q("q68_date_arith",
      (s, dir) => {
        t(s, dir, "orders")
          .where(col("o_orderkey") % 200 === 0)
          .select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("d"),
            add_months(to_date(col("o_orderdate")), 1).as("plus_month"),
            last_day(to_date(col("o_orderdate"))).as("month_end"),
            date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"),
            datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate"))).as("days_to_y2k"),
            dayofweek(col("o_orderdate")).as("dow"))
      },
      Some("""SELECT o_orderkey,
                CAST(o_orderdate AS DATE) AS d,
                CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
                CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
              FROM orders WHERE o_orderkey % 200 = 0""")),

    // ---- AS-OF join: each purchase matched to the user's latest view
    //      at-or-before it (Joins.asofJoin — union + keyed window, one
    //      shuffle; DuckDB's native ASOF JOIN is the oracle) ----
    Q("q57_asof_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"),
            col("event_id").as("view_id"), col("ts").as("view_ts"))
        graft.ops.Joins.asofJoin(purchases, views, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("view_id", "view_ts"))
      },
      Some("""SELECT p.event_id, p.user_id, p.ts,
                     v.event_id AS asof_view_id, v.ts AS asof_view_ts
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                              WHERE event_type = 'view') v
                ON p.user_id = v.user_id AND p.ts >= v.ts""")),

    // ---- linear gap interpolation (the remaining imputation-family
    //      member beside scale-up/rolling-mean/lag-join). NULLs seeded
    //      deterministically on both sides; interpolation is
    //      position-based so timestamp ties can't divide by zero ----
    Q("q69_interpolate",
      (s, dir) => {
        val gapped = t(s, dir, "events").select(
          col("event_id"), col("event_type"), col("ts"),
          when(col("event_id") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        graft.ops.Windows.interpolateLinear(gapped, Seq("event_type"),
          Seq("ts", "event_id"), "v", "v_interp")
          .select(col("event_id"), col("event_type"),
            round(col("v_interp"), 6).as("v_interp"))
      },
      Some("""WITH g AS (
                SELECT event_id, event_type, ts,
                       CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
                FROM events),
              r AS (
                SELECT *, row_number() OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id) AS rn
                FROM g),
              w AS (
                SELECT event_id, event_type, v, rn,
                  last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
                    OVER wb AS prn,
                  first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
                    OVER wf AS nrn,
                  last_value(v IGNORE NULLS) OVER wb AS pv,
                  first_value(v IGNORE NULLS) OVER wf AS nv
                FROM r
                WINDOW wb AS (PARTITION BY event_type ORDER BY rn
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       wf AS (PARTITION BY event_type ORDER BY rn
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              SELECT event_id, event_type,
                round(CASE WHEN v IS NOT NULL THEN v
                      ELSE pv + (nv - pv) * (CAST(rn - prn AS DOUBLE)
                                             / CAST(nrn - prn AS DOUBLE)) END,
                      6) AS v_interp
              FROM w""")),

    // ---- exact distinct cardinality (ground truth for the HLL pair) ----
    Q("q73_distinct_exact",
      (s, dir) => {
        t(s, dir, "events").groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
                     count(*) AS n_events
              FROM events GROUP BY 1""")),

    // ---- HLL approximate distinct: the bounded-memory scale path for
    // q73 (one pass, fixed sketch size per group vs a full distinct
    // shuffle; sketch internals are engine-specific → rows-only) ----
    Q("q74_approx_distinct",
      (s, dir) => {
        t(s, dir, "events").groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"),
            count(lit(1)).as("n_events"))
      },
      None),

    // ---- q74's CONTRACT under the driver gate (the q166 empty-audit
    //      pattern; q73 is the exact hash-green twin): HLL++ at rsd
    //      0.02 must land within 3σ (6%) of the exact cardinality —
    //      deterministic for a fixed corpus and hash family, so a
    //      drifting sketch implementation flips the driver gate red.
    //      One aggregate computes both sides; no second scan.
    //      Residual risk (advice r14): 3σ is a PROBABILISTIC bound —
    //      on a NEW corpus or scale, ~0.3% of groups can legitimately
    //      exceed it with a perfectly healthy sketch. On the driver's
    //      fixed fixtures the row is deterministic (it passes today at
    //      every SF); if it ever reddens after a corpus change, check
    //      q74's hash twin (q73 diff) for real drift before touching
    //      the sketch — a lone 3σ excursion with q73 unchanged is the
    //      bound, not a bug ----
    Q("q192_hll_audit",
      (s, dir) => {
        t(s, dir, "events").groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("n_exact"),
            approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
          .where(abs(col("n_approx") - col("n_exact")) >
            col("n_exact") * 0.06)
      },
      Some("""SELECT CAST(NULL AS VARCHAR) AS event_type,
                     CAST(NULL AS BIGINT) AS n_exact,
                     CAST(NULL AS BIGINT) AS n_approx
              WHERE 1 = 0""")),

    // ---- §2.8 SCD-2 merge: resulting dimension state ----
    Q("q21_scd2_dim",
      (s, dir) => Scd2Fixture.merged(s, dir).dim,
      Some(Scd2Fixture.dimOracle)),

    // ---- §2.8 SCD-2 merge: cell-level changelog ----
    Q("q22_scd2_changelog",
      (s, dir) => Scd2Fixture.merged(s, dir).changelog,
      Some(Scd2Fixture.changelogOracle)),

    // ---- band join (|a − b| ≤ eps): bucketed equi-join + exact
    //      post-filter instead of the BroadcastNestedLoopJoin the naive
    //      range predicate plans; values quantized to integer centi
    //      units so the band edges are engine-exact ----
    Q("q114_band_join",
      (s, dir) => {
        val c = Tables.load(s, dir, "events")
          .where(col("event_type") === "click" && col("user_id") % 10 === 0)
          .select(col("event_id"), floor(col("value") * 100).cast("long").as("vc"))
        val a = c.select(col("event_id").as("id_a"), col("vc").as("vc_a"))
        val b = c.select(col("event_id").as("id_b"), col("vc").as("vc_b"))
        Joins.bandJoin(a, b, "vc_a", "vc_b", eps = 1.0)
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("vc_a"), col("vc_b"))
      },
      Some("""WITH c AS (
                SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS vc
                FROM events
                WHERE event_type = 'click' AND user_id % 10 = 0)
              SELECT a.event_id AS id_a, b.event_id AS id_b,
                     a.vc AS vc_a, b.vc AS vc_b
              FROM c a JOIN c b
                ON a.event_id < b.event_id AND abs(a.vc - b.vc) <= 1""")),

    // ---- ordered funnel (view → click → purchase): per-user
    //      first-reach times gated on the prior step (strict >), exact
    //      integer-ppm conversion ratios; every shuffle keys on user ----
    Q("q115_funnel",
      (s, dir) => Funnel.funnel(Tables.load(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (
                SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' AND user_id IS NOT NULL
                  AND ts IS NOT NULL
                GROUP BY 1),
              s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t
                GROUP BY 1),
              s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t
                GROUP BY 1),
              c AS (
                SELECT 1 AS step, 'view' AS step_name,
                       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
                UNION ALL
                SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
                UNION ALL
                SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3))
              SELECT CAST(step AS INTEGER) AS step, step_name, n_users,
                     CASE WHEN first_value(n_users) OVER w = 0 THEN 0
                          ELSE n_users * 1000000
                               // first_value(n_users) OVER w END
                       AS conv_from_first_ppm,
                     CASE WHEN COALESCE(lag(n_users) OVER w, n_users) = 0 THEN 0
                          ELSE n_users * 1000000
                               // COALESCE(lag(n_users) OVER w, n_users) END
                       AS conv_from_prev_ppm
              FROM c
              WINDOW w AS (ORDER BY step
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // ---- cohort retention triangle: signup-week cohorts, retained in
    //      week k iff ANY event in that week; Monday-start date_trunc
    //      weeks + integer ppm — exact in every engine ----
    Q("q116_retention",
      (s, dir) => Funnel.retention(Tables.load(s, dir, "events"),
        "user_id", "event_type", "ts", cohortEvent = "signup"),
      Some("""WITH c AS (
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS DATE) AS cw
                FROM events
                WHERE event_type = 'signup' AND user_id IS NOT NULL
                  AND ts IS NOT NULL
                GROUP BY 1),
              a AS (
                SELECT DISTINCT e.user_id, c.cw,
                       datediff('day', c.cw,
                         CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS k
                FROM events e JOIN c USING (user_id)
                WHERE e.ts IS NOT NULL
                  AND CAST(date_trunc('week', e.ts) AS DATE) >= c.cw),
              s AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort
                    FROM c GROUP BY 1)
              SELECT a.cw AS cohort_week, CAST(a.k AS INTEGER) AS week_k,
                     CAST(count(*) AS BIGINT) AS n_active, s.n_cohort,
                     CAST(count(*) * 1000000 // s.n_cohort AS BIGINT)
                       AS retention_ppm
              FROM a JOIN s USING (cw)
              GROUP BY a.cw, a.k, s.n_cohort""")),

    // ---- dynamic winsorization (P10's data-dependent sibling): clamp
    //      value to per-type exact [p05, p95]; Spark `percentile` ≡
    //      DuckDB `quantile_cont`, so the bounds agree bit-for-bit ----
    Q("q118_winsorize",
      (s, dir) => {
        Tidy.winsorize(
            Tables.load(s, dir, "events").where(col("value").isNotNull),
            col("event_type"), col("value"), pLo = 0.05, pHi = 0.95)
          .select(col("event_id"), col("event_type"),
            round(col("value"), 6).as("value"),
            round(col("winsorized"), 6).as("winsorized"))
      },
      Some("""WITH q AS (
                SELECT event_type,
                       quantile_cont(value, 0.05) AS p05,
                       quantile_cont(value, 0.95) AS p95
                FROM events WHERE value IS NOT NULL GROUP BY 1)
              SELECT e.event_id, e.event_type,
                     round(e.value, 6) AS value,
                     round(greatest(least(e.value, q.p95), q.p05), 6)
                       AS winsorized
              FROM events e JOIN q USING (event_type)
              WHERE e.value IS NOT NULL""")),

    // ---- salted skew join under the oracle gate: the event_type key
    //      space is 5 values over 10k rows (pathological skew by
    //      construction); the salted join must be RESULT-identical to
    //      the plain join the oracle runs — replication completeness is
    //      exactly what this checks. Integer centi-values keep it exact ----
    Q("q120_salted_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("vc"))
        val dim = e.groupBy(col("event_type")).agg(max(col("vc")).as("mx"))
        Skew.saltedJoin(e, dim, Seq("event_type"), salts = 8)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("vc") === col("mx"), 1L).otherwise(0L)).as("n_at_max"))
      },
      Some("""WITH e AS (
                SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc
                FROM events WHERE value IS NOT NULL),
              dim AS (SELECT event_type, max(vc) AS mx FROM e GROUP BY 1)
              SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN e.vc = dim.mx THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_at_max
              FROM e JOIN dim USING (event_type)
              GROUP BY 1""")),

    // ---- robust anomaly days: per-type daily counts flagged when the
    //      absolute deviation from the median exceeds 3×MAD — the
    //      median/MAD pair is outlier-proof where mean/stddev is not;
    //      exact interpolated percentiles keep both engines identical ----
    Q("q122_anomaly_days",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val med = daily.groupBy(col("event_type"))
          .agg(percentile(col("cnt"), lit(0.5)).as("med"))
        val dev = daily.join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("cnt") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(percentile(col("adev"), lit(0.5)).as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("day"), col("cnt"),
            (col("adev") > col("mad") * 3.0).as("is_anomaly"))
      },
      Some("""WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
              med AS (SELECT event_type, quantile_cont(cnt, 0.5) AS med
                      FROM daily GROUP BY 1),
              dev AS (
                SELECT d.event_type, d.day, d.cnt,
                       abs(d.cnt - m.med) AS adev
                FROM daily d JOIN med m USING (event_type)),
              mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                      FROM dev GROUP BY 1)
              SELECT d.event_type, d.day, d.cnt,
                     (d.adev > mad.mad * 3.0) AS is_anomaly
              FROM dev d JOIN mad USING (event_type)""")),

    // ---- temporal split with embargo (leakage-safe time-series
    //      folds): train strictly before the cut, test strictly after
    //      cut + embargo, the embargo gap DROPPED — the forward-chaining
    //      split financial/forecasting ML requires (test rows adjacent
    //      to train leak through autocorrelation) ----
    Q("q126_temporal_split",
      (s, dir) => {
        val cut = lit("2021-07-01 00:00:00").cast("timestamp")
        val embargoEnd = lit("2021-07-08 00:00:00").cast("timestamp")
        Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .select(col("event_id"), col("ts"),
            when(col("ts") < cut, "train")
              .when(col("ts") >= embargoEnd, "test")
              .otherwise("embargo").as("split"))
      },
      Some("""SELECT event_id, ts,
                     CASE WHEN ts < TIMESTAMP '2021-07-01 00:00:00'
                            THEN 'train'
                          WHEN ts >= TIMESTAMP '2021-07-08 00:00:00'
                            THEN 'test'
                          ELSE 'embargo' END AS split
              FROM events WHERE ts IS NOT NULL""")),

    // ---- data-integrity manifest: per day, row count + an exact
    //      order-independent checksum (sum of md5-derived 32-bit words
    //      per row) — the "did the copy/export complete, bit-for-bit"
    //      manifest every multi-system pipeline publishes next to its
    //      data; portable arithmetic so ANY engine can re-derive it ----
    Q("q127_integrity_manifest",
      (s, dir) => {
        // doubles stringify differently across engines (1e-7 vs 1.0E-7)
        // — checksum over integer centi-values instead, NULL-guarded so
        // both engines hash the same bytes row for row
        val rowSig = conv(substring(md5(concat(
            col("event_id").cast("string"), lit(":"),
            coalesce(col("event_type"), lit("")), lit(":"),
            coalesce(floor(col("value") * 100).cast("long"), lit(-1L))
              .cast("string"))), 1, 8), 16, 10).cast("long")
        Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_rows"), sum(rowSig).as("checksum"))
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CAST(('0x' || substr(md5(
                            CAST(event_id AS VARCHAR) || ':'
                            || COALESCE(event_type, '') || ':'
                            || CAST(COALESCE(CAST(floor(value * 100) AS BIGINT),
                                             -1) AS VARCHAR)), 1, 8))
                          AS UBIGINT)) AS BIGINT) AS checksum
              FROM events WHERE ts IS NOT NULL
              GROUP BY 1""")),

    // ---- time-to-convert distribution: latency quantiles (seconds)
    //      for users completing view→purchase under the funnel gating;
    //      exact interpolated percentiles over integer second deltas ----
    Q("q129_time_to_convert",
      (s, dir) => Funnel.timeToConvert(Tables.load(s, dir, "events"),
        "user_id", "event_type", "ts", "view", "purchase",
        quantiles = Seq(0.25, 0.5, 0.9)),
      Some("""WITH f AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' AND user_id IS NOT NULL
                  AND ts IS NOT NULL
                GROUP BY 1),
              c AS (
                SELECT e.user_id,
                       CAST(floor(epoch(min(e.ts))) - floor(epoch(f.t0))
                         AS BIGINT) AS delta_s
                FROM events e JOIN f USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > f.t0
                GROUP BY e.user_id, f.t0),
              n AS (SELECT CAST(count(*) AS BIGINT) AS n_converters FROM c)
              SELECT 0.25 AS quantile, n.n_converters,
                     (SELECT quantile_cont(CAST(delta_s AS DOUBLE), 0.25) FROM c)
                       AS latency_seconds FROM n
              UNION ALL
              SELECT 0.5, n.n_converters,
                     (SELECT quantile_cont(CAST(delta_s AS DOUBLE), 0.5) FROM c) FROM n
              UNION ALL
              SELECT 0.9, n.n_converters,
                     (SELECT quantile_cont(CAST(delta_s AS DOUBLE), 0.9) FROM c) FROM n"""))
  )
}
