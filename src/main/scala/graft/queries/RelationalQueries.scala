package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-family parity queries over the driver testdata tables.
  *
  * Each query re-expresses one operator family from SURVEY.md §2 (IDs in the
  * query names) on the TPC-H-ish tables, with a DuckDB oracle. Determinism
  * rules shared by both sides:
  *   - double sums go through DECIMAL(18,2) (exact) then CAST AS DOUBLE;
  *   - ratios are computed with the identical expression text and rounded;
  *   - timestamps are emitted as DATE (parquet is ns; Spark truncates to µs,
  *     so the oracle truncates too before ordering);
  *   - every window/top-N has a total tie-break.
  */
object RelationalQueries {

  private def sumDec(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ---- S2/S15: filtered projected scan (predicate + projection pushdown)
    QueryDef(
      "s2_pushdown_filter",
      (s, dir) => Tables(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value") > 100)
        .select("event_id", "user_id", "value"),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase' AND value > 100""".stripMargin)),

    // ---- A1: groupBy + COUNT/SUM (TPC-H Q1 shape; funnel aggregate analog)
    QueryDef(
      "a1_groupby_agg",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec("l_quantity").as("sum_qty"),
          sumDec("l_extendedprice").as("sum_base_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  COUNT(*) AS count_order
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    // ---- A2: filtered aggregates (COUNT/SUM FILTER)
    QueryDef(
      "a2_filtered_agg",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .cast("decimal(18,2)")).cast("double").as("rev_finished")),
      Some("""SELECT o_orderpriority, COUNT(*) AS n_total,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_finished
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- A3: ratio with NULLIF guard (win-rate shape)
    QueryDef(
      "a3_ratio_nullif",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_total"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_finished"))
          .select(
            col("c_mktsegment"),
            col("n_total"),
            col("n_finished"),
            round(lit(100.0) * col("n_finished").cast("double") /
              nullif(col("n_total"), lit(0)), 2).as("finish_rate"))
      },
      Some("""SELECT c_mktsegment, n_total, n_finished,
             |  ROUND(CAST(100.0 AS DOUBLE) * CAST(n_finished AS DOUBLE)
             |        / NULLIF(n_total, 0), 2) AS finish_rate
             |FROM (
             |  SELECT c_mktsegment, COUNT(*) AS n_total,
             |    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1
             |)""".stripMargin)),

    // ---- A5: exact COUNT DISTINCT
    QueryDef(
      "a5_count_distinct",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             |  COUNT(*) AS n FROM events GROUP BY 1""".stripMargin)),

    // ---- A6: time-bucketed rollup (date_trunc month)
    QueryDef(
      "a6_time_bucket",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(
          date_trunc("month", col("ts")).cast("date").as("month"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sumDec("value").as("sum_value")),
      Some("""SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- A7: MIN/MAX freshness
    QueryDef(
      "a7_minmax_freshness",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          min(col("ts").cast("date")).as("first_day"),
          max(col("ts").cast("date")).as("last_day"),
          min("event_id").as("min_event_id"),
          max("event_id").as("max_event_id")),
      Some("""SELECT event_type, MIN(CAST(ts AS DATE)) AS first_day,
             |  MAX(CAST(ts AS DATE)) AS last_day,
             |  MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- A8: HAVING
    QueryDef(
      "a8_having",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .filter(col("n") > 10),
      Some("""SELECT user_id, COUNT(*) AS n FROM events
             |GROUP BY 1 HAVING COUNT(*) > 10""".stripMargin)),

    // ---- A9: CASE-bucketed dimension aggregate
    QueryDef(
      "a9_case_bucket",
      (s, dir) => Tables(s, dir, "orders")
        .withColumn("price_band",
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("high"))
        .groupBy("price_band")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_orderkey"),
          max("o_orderkey").as("max_orderkey")),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
             |            WHEN o_totalprice < 200000 THEN 'mid'
             |            ELSE 'high' END AS price_band,
             |  COUNT(*) AS n, MIN(o_orderkey) AS min_orderkey,
             |  MAX(o_orderkey) AS max_orderkey
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- A10: duration math aggregate (avg days order -> ship)
    QueryDef(
      "a10_duration",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date"))).as("total_days"),
            count(lit(1)).as("n"))
          .select(
            col("l_returnflag"),
            col("n"),
            round(col("total_days").cast("double") / col("n") , 4)
              .as("avg_ship_days"))
      },
      Some("""SELECT l_returnflag, n,
             |  ROUND(CAST(total_days AS DOUBLE) / n, 4) AS avg_ship_days
             |FROM (
             |  SELECT l_returnflag,
             |    CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE),
             |                       CAST(l_shipdate AS DATE))) AS BIGINT) AS total_days,
             |    COUNT(*) AS n
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY 1
             |)""".stripMargin)),

    // ---- A12: CASE-guarded nullable duration (the vw_zd_ticket_metrics
    // hours_to_resolution shape, 04_core_zendesk.sql:305-310): an entity
    // without its terminal event has NULL duration, not a bogus
    // duration-to-last-touch. Here: user's first event -> first "big
    // purchase" (the solved_at analog; most users never have one).
    QueryDef(
      "a12_guarded_duration",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("first_seen"),
          min(when(col("event_type") === "purchase" && col("value") > 180,
            col("ts"))).as("solved_ts"))
        .select(col("user_id"), col("n_events"),
          when(col("solved_ts").isNotNull,
            round((unix_timestamp(col("solved_ts")) -
              unix_timestamp(col("first_seen"))).cast("double") / 3600, 4))
            .as("hours_to_solved")),
      Some("""SELECT user_id, n_events,
             |  CASE WHEN solved_ts IS NOT NULL THEN
             |    ROUND(CAST(date_diff('second', first_seen, solved_ts)
             |          AS DOUBLE) / 3600, 4)
             |  ELSE NULL END AS hours_to_solved
             |FROM (
             |  SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_seen,
             |    MIN(CASE WHEN event_type = 'purchase' AND value > 180
             |             THEN ts END) AS solved_ts
             |  FROM events GROUP BY 1
             |)""".stripMargin)),

    // ---- J1: multi-way broadcast dim join + aggregate (funnel view shape)
    QueryDef(
      "j1_funnel_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_customers"), sumDec("c_acctbal").as("sum_acctbal"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_customers,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)),

    // ---- J3: LEFT JOIN star enrichment with null-handling
    QueryDef(
      "j3_left_enrich",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .groupBy(
            coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sumDec("o_totalprice").as("revenue"))
      },
      Some("""SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment, o_orderstatus,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1, 2""".stripMargin)),

    // ---- J4: equi-join on a computed key (fuzzy-key join shape)
    QueryDef(
      "j4_computed_key_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer").withColumn("k", col("c_custkey") % 100)
        val su = Tables(s, dir, "supplier").withColumn("k", col("s_suppkey") % 100)
        c.join(su, "k")
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct("s_suppkey").as("n_suppliers"))
      },
      Some("""SELECT c_custkey % 100 AS k, COUNT(*) AS n_pairs,
             |  COUNT(DISTINCT s_suppkey) AS n_suppliers
             |FROM customer JOIN supplier ON c_custkey % 100 = s_suppkey % 100
             |GROUP BY 1""".stripMargin)),

    // ---- J5: semi join (customers that have orders; retention shape)
    QueryDef(
      "j5_semi_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1""".stripMargin)),

    // ---- anti join (customers without orders)
    QueryDef(
      "j6_anti_join",
      (s, dir) => {
        // customers with NO urgent order — the right side is filtered
        // so the anti set is non-empty at every SF (an anti join whose
        // result is always 0 rows proves nothing)
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_inactive FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY 1""".stripMargin)),

    // ---- D1: window dedup, latest-wins (THE reference pattern, 13 call sites)
    QueryDef(
      "d1_dedup_latest",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts").cast("date").as("event_date"))
      },
      // Spark timestamps are µs (parquet ns gets truncated); truncate in the
      // oracle too so the two engines order ties identically.
      Some("""SELECT user_id, event_id, event_type, value,
             |  CAST(ts AS DATE) AS event_date
             |FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY user_id
             |    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
             |  FROM events
             |) WHERE rn = 1""".stripMargin)),

    // ---- D4: DISTINCT projection
    QueryDef(
      "d4_distinct",
      (s, dir) => graft.operators.Dedup.distinctOn(
        Tables(s, dir, "events"), Seq("user_id", "event_type")),
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    // ---- W1: ranked window beyond rn=1 (top-3 per group, total tie-break)
    QueryDef(
      "w1_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
      },
      Some("""SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal, row_number() OVER (
             |    PARTITION BY c_mktsegment
             |    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer
             |) WHERE rn <= 3""".stripMargin)),

    // ---- O3: top-N with deterministic tie-break
    QueryDef(
      "o3_topn",
      (s, dir) => Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderstatus"),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ---- U1: UNION ALL count-summary stitching
    QueryDef(
      "u1_union_counts",
      (s, dir) => {
        def cnt(n: String) = Tables(s, dir, n)
          .agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), col("n"))
        cnt("customer").unionByName(cnt("orders")).unionByName(cnt("lineitem"))
      },
      Some("""SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
             |UNION ALL SELECT 'orders', COUNT(*) FROM orders
             |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem""".stripMargin)),

    // ---- P1: JSON field projection + cast (the gold-layer SELECT shape)
    QueryDef(
      "p1_json_extract",
      (s, dir) => Tables(s, dir, "events")
        .select(
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"),
          col("value"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"), sumDec("value").as("sum_value")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- P2: COALESCE / NULLIF fallback chain
    QueryDef(
      "p2_coalesce_fallback",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy(coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_label"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
             |  COUNT(*) AS n FROM orders GROUP BY 1""".stripMargin)),

    // ---- P4/O4: first-match element of an ordered array (correlated LIMIT 1)
    QueryDef(
      "p4_first_match",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(
          struct(col("l_linenumber"), col("l_partkey"), col("l_returnflag"))))
          .as("items"))
        .select(col("l_orderkey"),
          expr("get(filter(items, x -> x.l_returnflag = 'R'), 0).l_partkey")
            .as("first_r_partkey")),
      // l_linenumber is NOT unique per order in the synthetic data, so the
      // ordering must be total: (l_linenumber, l_partkey) on both sides.
      Some("""SELECT o.l_orderkey, r.first_r_partkey
             |FROM (SELECT DISTINCT l_orderkey FROM lineitem) o
             |LEFT JOIN (
             |  SELECT l_orderkey, l_partkey AS first_r_partkey, row_number()
             |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn
             |  FROM lineitem WHERE l_returnflag = 'R'
             |) r ON o.l_orderkey = r.l_orderkey AND r.rn = 1""".stripMargin)),

    // ---- P9: concat + trim (generated full_name shape)
    QueryDef(
      "p9_concat_trim",
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_custkey"),
          trim(concat_ws(" ", col("c_name"), col("c_mktsegment"))).as("label")),
      Some("""SELECT c_custkey,
             |  TRIM(CONCAT_WS(' ', c_name, c_mktsegment)) AS label
             |FROM customer""".stripMargin)),

    // ---- K5: skip-null-key filter
    QueryDef(
      "k5_null_filter",
      (s, dir) => Tables(s, dir, "events")
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             |GROUP BY 1""".stripMargin)),

    // ---- K6: deterministic MD5 surrogate key (int(md5[:15],16) % 10^15)
    QueryDef(
      "k6_entry_key",
      // exercised through the NATIVE Md5Key15 expression so the DuckDB
      // compare also gates the custom-codegen path
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_id"),
          graft.functions.Keys.md5Key15Native(concat_ws("|",
            col("ts").cast("date").cast("string"),
            col("user_id").cast("string"),
            col("event_type"))).as("entry_key")),
      Some {
        val md5e = "md5(concat_ws('|', CAST(CAST(ts AS DATE) AS VARCHAR), " +
          "CAST(user_id AS VARCHAR), event_type))"
        s"""SELECT event_id,
           |  ${DuckSql.hexToLong(md5e, 15)} % 1000000000000000 AS entry_key
           |FROM events""".stripMargin
      }),

    // ---- E1/E5: explode (unnest) of a derived array + aggregate
    QueryDef(
      "e1_explode_tokens",
      (s, dir) => Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n")),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
             |) GROUP BY 1""".stripMargin)),

    // ---- V2: lineage-key duplicate scan (HAVING count > 1)
    QueryDef(
      "v2_dup_scan",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1),
      Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
             |FROM events GROUP BY 1, 2, 3 HAVING COUNT(*) > 1""".stripMargin)),

    // ---- V3: payload-id uniqueness delta
    QueryDef(
      "v3_uniqueness_delta",
      (s, dir) => Tables(s, dir, "events")
        .agg((count(lit(1)) - countDistinct("event_id")).as("dup_delta"),
          count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) - COUNT(DISTINCT event_id) AS dup_delta,
             |  COUNT(*) AS n FROM events""".stripMargin)),

    // ---- V5: date-sanity anomaly scan (shipped before ordered)
    QueryDef(
      "v5_date_anomaly",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .filter(col("l_shipdate") < col("o_orderdate"))
          .agg(count(lit(1)).as("n_anomalies"))
      },
      Some("""SELECT COUNT(*) AS n_anomalies
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate < o_orderdate""".stripMargin)),

    // ---- S4: deleted-record filter at ingest (drop flagged rows)
    QueryDef(
      "s4_deleted_filter",
      (s, dir) => Tables(s, dir, "events")
        .filter(!coalesce(get_json_object(col("props"), "$.deleted")
          .cast("boolean"), lit(false)))
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |WHERE NOT COALESCE(CAST(json_extract_string(props, '$.deleted')
             |  AS BOOLEAN), false)
             |GROUP BY 1""".stripMargin)),

    // ---- A4: conditional-sum pivot (status columns per group)
    QueryDef(
      "a4_pivot",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p")),
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- D2: dedup by natural key via single-pass max_by aggregate
    // (shuffle-light alternative to the D1 window for wide rows)
    QueryDef(
      "d2_dedup_maxby",
      // version key = fixed-width (epoch_us, event_id) string: totally
      // ordered, and arg_max/max_by support VARCHAR in both engines
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max_by(col("event_type"),
          concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 10, "0"))).as("latest_type"),
          max("event_id").as("max_event_id")),
      Some("""SELECT user_id,
             |  arg_max(event_type,
             |    lpad(CAST(epoch_us(date_trunc('microseconds', ts)) AS VARCHAR), 20, '0')
             |    || lpad(CAST(event_id AS VARCHAR), 10, '0')) AS latest_type,
             |  MAX(event_id) AS max_event_id
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- E6/D5: explode a derived struct array then keep-latest per key
    // (the zendesk custom-fields shape on relational data: per customer,
    // latest order per priority bucket)
    QueryDef(
      "e6_explode_keep_latest",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(sort_array(collect_list(struct(col("o_orderkey"),
            col("o_orderpriority"), col("o_orderdate")))).as("items"))
        val exploded = orders
          .select(col("o_custkey"), explode(col("items")).as("i"))
          .select(col("o_custkey"), col("i.o_orderkey").as("o_orderkey"),
            col("i.o_orderpriority").as("o_orderpriority"),
            col("i.o_orderdate").as("o_orderdate"))
        val w = Window.partitionBy("o_custkey", "o_orderpriority")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        exploded.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderpriority"),
            col("o_orderkey").as("latest_orderkey"),
            col("o_orderdate").cast("date").as("latest_orderdate"))
      },
      Some("""SELECT o_custkey, o_orderpriority,
             |  o_orderkey AS latest_orderkey,
             |  CAST(o_orderdate AS DATE) AS latest_orderdate
             |FROM (
             |  SELECT o_custkey, o_orderpriority, o_orderkey, o_orderdate,
             |    row_number() OVER (PARTITION BY o_custkey, o_orderpriority
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders
             |) WHERE rn = 1""".stripMargin)),

    // ---- O1: multi-column deterministic ORDER BY projection
    QueryDef(
      "o1_order_by",
      (s, dir) => Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("n_nationkey"))
        .orderBy(col("r_name").asc, col("n_name").desc),
      Some("""SELECT r_name, n_name, n_nationkey
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY r_name ASC, n_name DESC""".stripMargin)),

    // ---- J7: range join via bucketed bounded candidates (the scalable
    // interval-join pattern; the oracle is the NAIVE theta-join, so the
    // hash compare proves the bucketing enumerates exactly the same
    // pairs). Pairs of same-user events within 1 hour.
    QueryDef(
      "j7_range_join_bucketed",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
        val a = e.select(col("user_id"), col("event_id").as("e1"),
          col("us").as("us1"))
        val b = e.select(col("user_id"), col("event_id").as("e2"),
          col("us").as("us2"))
        graft.operators.Scale.boundedRangeJoin(a, b, Seq("user_id"),
          "us1", "us2", 3600000000L)
          .filter(col("us2") > col("us1") ||
            (col("us2") === col("us1") && col("e2") > col("e1")))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct("user_id").as("n_users"),
            max(col("us2") - col("us1")).as("max_gap_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch_us(date_trunc('microseconds', ts)) AS us FROM events)
             |SELECT COUNT(*) AS n_pairs,
             |  COUNT(DISTINCT a.user_id) AS n_users,
             |  MAX(b.us - a.us) AS max_gap_us
             |FROM e a JOIN e b ON a.user_id = b.user_id
             | AND b.us - a.us <= 3600000000
             | AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))"""
        .stripMargin)),

    // ---- J8: as-of join (latest order at-or-before each event, per
    // customer) — union + running-last-value on the Spark side, DuckDB's
    // native ASOF LEFT JOIN as the oracle: two entirely different
    // algorithms hash-compared.
    QueryDef(
      "j8_asof_join",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("user_id").as("custkey"), col("event_id"),
            unix_micros(col("ts")).as("ets"))
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey").as("custkey"),
            // o_orderdate is TIMESTAMP_NTZ; session is UTC so the cast
            // to LTZ is exact and unix_micros applies
            unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
            col("o_orderdate").cast("date").as("last_order_date"),
            col("o_orderkey"))
        graft.operators.Scale.asOfJoin(e, o, Seq("custkey"),
          "ets", "ots", "last_order_date", "o_orderkey")
          .select("event_id", "last_order_date")
      },
      Some("""SELECT e.event_id, CAST(o.o_orderdate AS DATE) AS last_order_date
             |FROM (SELECT event_id, user_id,
             |        date_trunc('microseconds', ts) AS ts FROM events) e
             |ASOF LEFT JOIN orders o
             |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts"""
        .stripMargin)),

    // ---- J9: incremental join-view maintenance — 20% of orders and
    // ~14% of customers arrive as insert deltas; the maintained view
    // (old view + ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR, delta sides broadcast) must
    // equal the oracle's one-shot full join. Algorithm-vs-different-
    // algorithm: DuckDB never sees the delta decomposition.
    QueryDef(
      "j9_join_view_delta",
      (s, dir) => {
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        val (ordBase, ordDelta) = (
          ord.filter(pmod(col("o_orderkey"), lit(5)) =!= 0),
          ord.filter(pmod(col("o_orderkey"), lit(5)) === 0))
        val (custBase, custDelta) = (
          cust.filter(pmod(col("o_custkey"), lit(7)) =!= 0),
          cust.filter(pmod(col("o_custkey"), lit(7)) === 0))
        ordBase.join(custBase, Seq("o_custkey"))
          .unionByName(graft.streaming.Incremental.joinViewDelta(
            ordBase, ordDelta, custBase, custDelta, Seq("o_custkey")))
          .select("o_orderkey", "o_custkey", "c_name")
      },
      Some("""SELECT o_orderkey, o_custkey, c_name
             |FROM orders JOIN customer ON o_custkey = c_custkey"""
        .stripMargin)),

    // ---- W2: lag-window sessionization (gap > 1h starts a session) —
    // window-family depth beyond row_number; total order via (µs ts, id)
    QueryDef(
      "w2_lag_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 3600,
              1).otherwise(0))
          .groupBy("user_id")
          .agg(sum(col("new_session")).as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT user_id,
             |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |  COUNT(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN prev_ts IS NULL
             |           OR date_diff('second', prev_ts, date_trunc('microseconds', ts)) > 3600
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT user_id, ts, lag(date_trunc('microseconds', ts)) OVER (
             |      PARTITION BY user_id
             |      ORDER BY date_trunc('microseconds', ts) ASC, event_id ASC)
             |      AS prev_ts
             |    FROM events)
             |) GROUP BY 1""".stripMargin)),

    // ---- W3: gap-fill/resample — irregular events regularized to a
    // per-user daily grid (missing days are ZERO datapoints, LOCF
    // carries the last observed day-sum forward). The grid explode
    // runs on the aggregated (user, day) frame, never raw events;
    // per-day sums are decimal-summed (order-free) for exact parity.
    QueryDef(
      "w3_gapfill_locf",
      (s, dir) => graft.operators.TimeSeries.gapFillDaily(
        Tables(s, dir, "events"), "user_id", "ts", "value"),
      Some("""WITH byday AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |    COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      AS day_value
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id,
             |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
             |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
             |        FROM byday GROUP BY 1))
             |SELECT g.user_id, g.day,
             |  COALESCE(b.n_events, 0) AS n_events, b.day_value,
             |  last_value(b.day_value IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.day ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS filled_value
             |FROM grid g LEFT JOIN byday b USING (user_id, day)"""
        .stripMargin)),

    // ---- grouping sets: ROLLUP totals (free in Spark per SURVEY §2.7,
    // exposed for the materialized-rollup A11 family)
    QueryDef(
      "a11_rollup",
      (s, dir) => Tables(s, dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("revenue")),
      Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
             |  COALESCE(o_orderstatus, 'ALL') AS status,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"""
        .stripMargin)),

    // ---- J10: bucketed co-located join — both fact tables written
    // bucketed by the join key (8 buckets, sorted), so the join reads
    // bucket i against bucket i with NO Exchange on either side (the
    // plan assert lives in ScaleSpec; at 100 TB this is the difference
    // between joining in place and shuffling both corpora). The gate
    // pins semantics: the bucketed round trip must not change the
    // join's result vs DuckDB joining the raw parquet.
    QueryDef(
      "j10_bucketed_join",
      (s, dir) => {
        // scope path AND catalog names by the input dir so concurrent
        // runs (sf0.01 verify + sf1 bench on one box) cannot delete
        // each other's bucketed tables mid-join (shared scheme:
        // Tables.gateTag/gatePath)
        val tag = Tables.gateTag(dir)
        val base = Tables.gatePath(dir, "buckets")
        val fsPath = new org.apache.hadoop.fs.Path(base)
        fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(fsPath, true) // deterministic rebuild per run
        s.sql(s"DROP TABLE IF EXISTS g_orders_bkt_$tag")
        s.sql(s"DROP TABLE IF EXISTS g_lineitem_bkt_$tag")
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/orders")
          .saveAsTable(s"g_orders_bkt_$tag")
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/lineitem")
          .saveAsTable(s"g_lineitem_bkt_$tag")
        s.table(s"g_lineitem_bkt_$tag")
          .join(s.table(s"g_orders_bkt_$tag"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1""".stripMargin)),

    // ---- D6: field-level survivorship ("golden record") — per
    // user_id cluster each field independently resolves to its modal
    // value with a lexical tie-break; the oracle recomputes each
    // field's mode via count + row_number windows and joins them back
    // (a different algorithm from the operator's single unpivoted
    // pass, so the hash compare checks the semantics, not the plan).
    QueryDef(
      "d6_golden_record",
      (s, dir) => {
        // null-hardened derivation: props.k parses as an integer ONLY
        // when it is one syntactically — a regex guard both engines
        // evaluate identically. (A bare cast diverges on decimal
        // strings: Spark cast('3.7' AS INT) truncates to 3 where
        // DuckDB TRY_CAST yields NULL, and a strict DuckDB CAST would
        // throw where Spark silently nulls.) Anything non-integer maps
        // to 'k-1' on both sides.
        val kStr = get_json_object(col("props"), "$.k")
        val e = Tables(s, dir, "events")
          .withColumn("kbucket", concat(lit("k"), coalesce(
            when(kStr.rlike("^-?[0-9]+$"), kStr.cast("int")) % 5,
            lit(-1)).cast("string")))
        graft.operators.Dedup.goldenRecord(e, Seq("user_id"),
          Seq("event_type", "kbucket"))
      },
      // LEFT joins: a cluster whose field is all-NULL must survive
      // with a NULL golden value (goldenRecord's contract), not drop
      Some("""WITH e AS (SELECT user_id, event_type,
             |    'k' || CAST(COALESCE(CASE
             |      WHEN regexp_matches(json_extract_string(props, '$.k'),
             |        '^-?[0-9]+$')
             |      THEN CAST(json_extract_string(props, '$.k') AS INT)
             |      END % 5, -1) AS VARCHAR) AS kbucket
             |  FROM events),
             |te AS (SELECT user_id, event_type AS v, COUNT(*) AS c
             |  FROM e WHERE event_type IS NOT NULL GROUP BY 1, 2),
             |me AS (SELECT user_id, v AS event_type FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id
             |    ORDER BY c DESC, v ASC) AS rn FROM te) WHERE rn = 1),
             |tk AS (SELECT user_id, kbucket AS v, COUNT(*) AS c
             |  FROM e WHERE kbucket IS NOT NULL GROUP BY 1, 2),
             |mk AS (SELECT user_id, v AS kbucket FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id
             |    ORDER BY c DESC, v ASC) AS rn FROM tk) WHERE rn = 1),
             |sz AS (SELECT user_id, COUNT(*) AS n_members FROM e
             |  GROUP BY 1)
             |SELECT sz.user_id, me.event_type, mk.kbucket, sz.n_members
             |FROM sz LEFT JOIN me USING (user_id)
             |  LEFT JOIN mk USING (user_id)""".stripMargin)),

    // ---- W4: sliding (hop) windows in batch — the streaming window
    // shape run over history. Spark's window(ts, 1h, 30m) assigns each
    // event to exactly two hops; the oracle reconstructs the same
    // assignment from epoch-µs arithmetic (both hop starts are ts
    // floored to its 30-min bucket minus k·30min, k ∈ {0,1} — always
    // in range since ts − start_k ∈ [k·30m, (k+1)·30m) ⊂ [0, 1h)).
    // DECIMAL event sums so the per-window totals are order-exact.
    QueryDef(
      "w4_hop_window",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(col("window.start").as("ws"), col("n"), col("sum_value")),
      Some("""WITH e AS (SELECT
             |    epoch_us(date_trunc('microseconds', ts)) AS us, value
             |  FROM events),
             |hops AS (SELECT
             |    us - us % 1800000000 - k.k * 1800000000 AS ws_us,
             |    value
             |  FROM e, (VALUES (0), (1)) k(k))
             |SELECT make_timestamp(ws_us) AS ws, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM hops GROUP BY 1""".stripMargin)),

    // ---- W5: ntile quartiles per segment (total order via the
    // (acctbal DESC, custkey) tie-break so bucket edges are exact)
    QueryDef(
      "w5_ntile",
      (s, dir) => Tables(s, dir, "customer")
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy("c_mktsegment")
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
        .select(col("c_custkey"), col("c_mktsegment"), col("quartile")),
      Some("""SELECT c_custkey, c_mktsegment,
             |  ntile(4) OVER (PARTITION BY c_mktsegment
             |    ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
             |FROM customer""".stripMargin)),

    // ---- W6: running (prefix) sum per user over the total event
    // order — DECIMAL accumulation so every prefix is exact, cast to
    // DOUBLE only at the edge
    QueryDef(
      "w6_running_sum",
      (s, dir) => Tables(s, dir, "events")
        .withColumn("running", sum(col("value").cast("decimal(18,6)"))
          .over(Window.partitionBy("user_id")
            .orderBy(col("ts").asc, col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
        .select(col("event_id"), col("user_id"), col("running")),
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             |    PARTITION BY user_id
             |    ORDER BY date_trunc('microseconds', ts) ASC, event_id ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |  AS DOUBLE) AS running
             |FROM events""".stripMargin)),

    // ---- W7: full sessionization — session IDS via a running sum
    // over the gap flags (w2 only counted sessions), then per-session
    // rollups: event count, exact µs duration, DECIMAL value total.
    // Two stacked windows + one aggregate, all on the same
    // (user, time, id) total order.
    QueryDef(
      "w7_session_stats",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("event_id").asc)
        Tables(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              col("us") - col("prev_us") > 3600000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            (max(col("us")) - min(col("us"))).as("duration_us"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, value,
             |    epoch_us(date_trunc('microseconds', ts)) AS us
             |  FROM events),
             |f AS (SELECT *, CASE WHEN prev_us IS NULL
             |      OR us - prev_us > 3600000000 THEN 1 ELSE 0 END
             |      AS new_session
             |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id
             |    ORDER BY us ASC, event_id ASC) AS prev_us FROM e)),
             |g AS (SELECT *, CAST(SUM(new_session) OVER (
             |    PARTITION BY user_id ORDER BY us ASC, event_id ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS session_id
             |  FROM f)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MAX(us) - MIN(us) AS duration_us,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM g GROUP BY 1, 2""".stripMargin)),

    // ---- V9: extraction gap analysis (missing days vs calendar range)
    QueryDef(
      "v9_gap_analysis",
      (s, dir) => {
        val days = Tables(s, dir, "events")
          .agg(min(col("ts").cast("date")).as("lo"),
            max(col("ts").cast("date")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        val present = Tables(s, dir, "events")
          .select(col("ts").cast("date").as("d")).distinct()
        days.join(present, Seq("d"), "left_anti")
          .agg(count(lit(1)).as("missing_days"))
      },
      Some("""WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo,
             |                  MAX(CAST(ts AS DATE)) AS hi FROM events),
             |days AS (SELECT CAST(unnest(generate_series(lo, hi,
             |                 INTERVAL 1 DAY)) AS DATE) AS d FROM b)
             |SELECT COUNT(*) AS missing_days FROM days
             |WHERE d NOT IN (SELECT DISTINCT CAST(ts AS DATE) FROM events)"""
        .stripMargin)),

    // ---- W8: relative-position window functions — percent_rank and
    // cume_dist per event_type over a TIE-FREE total order
    // (value, event_id), completing the window family (w1 rank,
    // w2 lag, w4 hop, w5 ntile, w6 running sum, w7 session stats).
    // Both are exact integer ratios → IEEE-identical cross-engine.
    QueryDef(
      "w8_percent_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").asc, col("event_id").asc)
        Tables(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
      },
      Some("""SELECT event_type, event_id, value,
             |  percent_rank() OVER (PARTITION BY event_type
             |    ORDER BY value ASC, event_id ASC) AS pr,
             |  cume_dist() OVER (PARTITION BY event_type
             |    ORDER BY value ASC, event_id ASC) AS cd
             |FROM events""".stripMargin)),

    // ---- D7: SCD Type-2 intervals from a change stream (Scd.scd2) —
    // the history-preserving sibling of keepLatest: consecutive
    // observations with an unchanged tracked value collapse into one
    // validity episode [valid_from, valid_to). Orders acts as the
    // change log: per customer, order keys are the version sequence
    // (globally unique — scd2 requires a tie-free version; the
    // testdata's lineitem repeats (orderkey, linenumber), which
    // breaks cross-engine window order) and the order status is the
    // tracked attribute. ONE key-shuffle total (both windows share
    // the partitioning; ScdSpec pins a single Exchange). Oracle: the
    // same lag-change-detect + lead-close in DuckDB SQL.
    QueryDef(
      "d7_scd2_intervals",
      (s, dir) => graft.operators.Scd.scd2(
        Tables(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderstatus")),
        Seq("o_custkey"), "o_orderkey", Seq("o_orderstatus")),
      Some("""WITH m AS (SELECT o_custkey, o_orderkey, o_orderstatus,
             |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderkey) AS pv,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderkey) AS rn
             |  FROM orders),
             |c AS (SELECT o_custkey, o_orderkey, o_orderstatus
             |  FROM m WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM pv)
             |SELECT o_custkey, o_orderstatus,
             |  o_orderkey AS valid_from,
             |  lead(o_orderkey) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderkey) AS valid_to,
             |  lead(o_orderkey) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderkey) IS NULL AS is_current
             |FROM c""".stripMargin)),

    // ---- J11: explicit salted skew join (SkewJoin.saltedJoin) — a
    // derived key sends ~80% of lineitem to one value (the hot-domain
    // shape); the salted join spreads that key over 16 reducers while
    // the dimension side replicates 16×. The gate pins BIT-IDENTICAL
    // results to the plain unsalted join the oracle runs; the spread
    // and determinism mechanics are spec'd (SkewJoinSpec). AQE's
    // skew-split is the default remedy — this is the deterministic
    // fallback it documents.
    QueryDef(
      "j11_salted_skew_join",
      (s, dir) => {
        val hot = when(col("l_orderkey") % 10 < 8, 0L)
          .otherwise(col("l_orderkey") % 97)
        val fact = Tables(s, dir, "lineitem")
          .select(hot.as("k"), col("l_quantity"))
        val dim = Tables(s, dir, "supplier")
          .groupBy((col("s_suppkey") % 97).as("k"))
          .agg(count(lit(1)).as("dim_n"))
        graft.operators.SkewJoin.saltedJoin(fact, dim, Seq("k"), 16)
          .groupBy("k")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)") * col("dim_n"))
              .cast("double").as("weighted_qty"))
      },
      Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
             |      ELSE l_orderkey % 97 END AS k, l_quantity
             |  FROM lineitem),
             |d AS (SELECT s_suppkey % 97 AS k, COUNT(*) AS dim_n
             |  FROM supplier GROUP BY 1)
             |SELECT k, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * dim_n)
             |    AS DOUBLE) AS weighted_qty
             |FROM f JOIN d USING (k) GROUP BY 1""".stripMargin)),
  )
}
