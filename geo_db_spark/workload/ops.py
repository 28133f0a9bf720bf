"""The reference's post-phase operators (SURVEY.md §2 D1-D12) surfaced in
generic form over the driver's synthetic tables, each backed by the
operator library in geo_db_spark.operators.relational and paired with a
DuckDB oracle.

Reference parity map (file:line cites into /root/reference/):
- d1_customers_without_orders  -> anti-join delete, src/post/city_countries.sql:2-7
- d2_argmin_order_per_customer -> MIN(priority) pick, src/post/city_countries.sql:9-23
- d4_top2_orders_per_customer  -> ORDER BY .. LIMIT k per group, src/post/per_city.sql:39-40
- d5_customer_names_per_nation -> DISTINCT + GROUP_CONCAT, src/post/city_labels.sql:5-25
- d8_preferred_lineitem        -> prioritized pick, src/post/esperanto_city_labels.sql:5-21
- d9_customer_nation_name      -> join-update, src/post/subdivision_iso.sql:5-12
- d10_dedup_order_part         -> dedup by re-key, src/post/cleanup/02.sql:1-17
- d11_orders_with_big_lineitem -> EXISTS semi-join keep, src/post/cleanup/05.sql:2-6
- w1/w2                        -> engine-growth window/event-time ops (not in
                                  reference; SURVEY.md §2-E "not present" list)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.relational import (
    anti_join,
    argmin_per_group,
    dedup_by_key,
    join_replace_column,
    ordered_group_concat,
    prioritized_pick,
    semi_join,
    top_k_per_group,
)
from geo_db_spark.session import tune


def d1_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, urgent, "c_custkey").select("c_custkey", "c_name")


ORACLE_D1 = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def d2_argmin_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load(spark, sf_dir, "orders")
    return argmin_per_group(
        orders,
        "o_custkey",
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
    ).select("o_custkey", "o_orderkey", "o_totalprice")


ORACLE_D2 = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) = 1
"""


def d4_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load(spark, sf_dir, "orders")
    return top_k_per_group(
        orders,
        "o_custkey",
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=2,
        rank_col="rank",
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank")


ORACLE_D4 = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
FROM orders
QUALIFY rank <= 2
"""


def d5_customer_names_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    enriched = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return ordered_group_concat(
        enriched,
        "n_name",
        value="c_name",
        order_by=["c_name"],
        sep=" / ",
        out_col="names",
    )


ORACLE_D5 = """
SELECT n_name, string_agg(DISTINCT c_name, ' / ' ORDER BY c_name) AS names
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

def d5_salted_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME ordered group-concat as d5, through the two-phase SALTED
    aggregation (r7 skew tooling): collect_list has no map-side partial,
    so a hot nation floods one reducer row-by-row; salting spreads each
    key over 8 sorted chunks merged in a second ~n_salts-row-per-key
    aggregate. Oracle = d5's — salting must not change one byte of
    output."""
    tune(spark)
    from geo_db_spark.operators.relational import salted_ordered_concat

    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    enriched = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return salted_ordered_concat(
        enriched,
        "n_name",
        value="c_name",
        order_by=["c_name"],
        sep=" / ",
        out_col="names",
        n_salts=8,
    )


def d8_preferred_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order pick one lineitem, preferring returned ('R') lines —
    the eo-first pick shape with a deterministic tiebreak."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    return prioritized_pick(
        li,
        "l_orderkey",
        preference=(F.col("l_returnflag") == "R").cast("int"),
        # (orderkey, linenumber) is NOT unique in the synthetic data —
        # extend the tiebreak until the order is total, or the winner
        # is engine-dependent (caught by the sf0.01 oracle sweep)
        tiebreak=[
            F.col("l_linenumber").asc(),
            F.col("l_returnflag").asc(),
            F.col("l_partkey").asc(),
            F.col("l_suppkey").asc(),
            F.col("l_extendedprice").asc(),
        ],
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


ORACLE_D8 = """
SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
QUALIFY row_number() OVER (
    PARTITION BY l_orderkey
    ORDER BY CAST(l_returnflag = 'R' AS INT) DESC,
             l_linenumber, l_returnflag, l_partkey, l_suppkey, l_extendedprice) = 1
"""


def d9_customer_nation_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-update: rewrite the FK column to the dimension's name, the
    Q-id -> ISO rewrite shape (cleanup/05.sql:8-14)."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").withColumn(
        "nation", F.col("c_nationkey").cast("string")
    )
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("nation_key"), "n_name"
    )
    out = join_replace_column(
        cust.withColumnRenamed("nation", "nation_key"),
        nation,
        on="nation_key",
        replace="nation_key",
        with_col="n_name",
    )
    return out.select("c_custkey", "c_name", F.col("nation_key").alias("nation"))


ORACLE_D9 = """
SELECT c_custkey, c_name, n_name AS nation
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def d10_dedup_order_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup by re-key: one lineitem per (orderkey, partkey), keeping the
    lowest line number — deterministic winner (SQLite's is arbitrary)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    return dedup_by_key(
        li,
        key=["l_orderkey", "l_partkey"],
        prefer_order=[F.col("l_linenumber").asc()],
    ).select("l_orderkey", "l_partkey", "l_linenumber")


ORACLE_D10 = """
SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_partkey ORDER BY l_linenumber) = 1
"""


def d11_orders_with_big_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load(spark, sf_dir, "orders")
    big = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return semi_join(orders, big, "o_orderkey").select("o_orderkey", "o_totalprice")


ORACLE_D11 = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


def w1_running_sum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum of event value per user in event-time
    order. Engine-growth op: window functions as a user surface
    (absent from the reference, SURVEY.md §2-E)."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    return ev.select(
        "event_id", "user_id", "ts", run.cast("double").alias("running_value")
    )


ORACLE_W1 = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
"""


def w2_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type: the batch
    equivalent of the streaming windowed agg (geo_db_spark.streaming)."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    sum_dec = F.sum(F.col("value").cast("decimal(18,6)"))
    return (
        ev.groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), sum_dec.alias("_sv"))
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n_events",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


ORACLE_W2 = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via
    F.session_window — the batch twin of streaming.sessionize_stateful.
    Oracle reproduces the gap semantics with lag + cumulative-sum."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


ORACLE_W3 = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
"""


def w4_rate_limit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.rate_limit_dedup: at most one event per
    (user_id, event_type, minute), deterministic min-(ts, event_id)
    winner. One shuffle on the dedup key; the streaming variant bounds
    the same state by watermark instead of corpus size."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    keyed = ev.withColumn("minute", F.date_trunc("minute", F.col("ts")))
    w = Window.partitionBy("user_id", "event_type", "minute").orderBy("ts", "event_id")
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_id", "user_id", "event_type", "minute")
    )


ORACLE_W4 = """
SELECT event_id, user_id, event_type, date_trunc('minute', ts) AS minute
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type, date_trunc('minute', ts)
    ORDER BY ts, event_id) = 1
"""


def g1_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, order-year) revenue — grouping-sets surface."""
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    enriched = (
        orders.join(cust.select("c_custkey", "c_nationkey"), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("o_year"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("p"))
    )
    return (
        enriched.rollup("n_name", "o_year")
        .agg(F.sum("p").cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_G1 = """
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_year)
"""


def g2_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set-op surface: BUILDING-segment customers minus those with
    an urgent order."""
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.exceptAll(urgent.distinct().join(building, "c_custkey", "left_semi"))


ORACLE_G2 = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def g3_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join shape: for every event, the user's latest purchase
    timestamp at-or-before it (running max over event time)."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return ev.select("event_id", "user_id", "ts", last_purchase.alias("last_purchase_ts"))


ORACLE_G3 = """
SELECT event_id, user_id, ts,
       MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
FROM events
"""


def g5_asof_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE two-table as-of join: for each event, the user's latest order
    (o_orderdate <= ts; ties by max o_orderkey), events without a prior
    order kept with NULLs.

    Scale shape — the union + running-max pattern: tag both inputs, union
    them, ONE window partitioned by the join key ordered by time (orders
    sort before events at equal timestamps so 'at-or-before' includes
    same-instant orders), take the running max of the (date, orderkey)
    struct, keep event rows. One shuffle total, no range-join row
    explosion, no per-key memory beyond the window's running state —
    unlike a t1.key=t2.key AND t1.t<=t2.t join whose intermediate is
    |matches| rows. Skew = one hot user's events land in one partition;
    acceptable because state is O(1) per row.
    """
    tune(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
    )
    o_struct = "struct<od:timestamp,ok:bigint>"
    tagged = orders.select(
        "user_id",
        "t",
        F.lit(1).alias("is_order"),
        F.struct(F.col("t").alias("od"), F.col("o_orderkey").alias("ok")).alias("o"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).unionByName(
        ev.select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(0).alias("is_order"),
            F.lit(None).cast(o_struct).alias("o"),
            "event_id",
            "ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t"), F.col("is_order").desc(), F.col("o.ok"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof", F.max("o").over(w))
        .filter(F.col("is_order") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof.ok").alias("asof_orderkey"),
            F.col("asof.od").alias("asof_orderdate"),
        )
    )


ORACLE_G5 = """
WITH ranked AS (
  SELECT e.event_id,
         o.o_orderkey AS asof_orderkey,
         o.o_orderdate AS asof_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id, e.ts, m.asof_orderkey, m.asof_orderdate
FROM events e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m
  ON e.event_id = m.event_id
"""


def g4_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (get_json_object path probing —
    the F9 scalar surface) + grouped agg on the extracted value."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_G4 = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def g6_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per user, one summed-value column per event
    type. Explicit pivot values keep the plan a single groupBy (Spark
    skips the extra distinct-scan job); DECIMAL sums for hash stability."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")))
    )
    return out.select(
        "user_id",
        *[F.col(t).cast("double").alias(f"sum_{t}") for t in EVENT_TYPES],
    )


ORACLE_G6 = f"""
SELECT user_id,
       {", ".join(
           "CAST(SUM(CASE WHEN event_type = '" + t + "' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_" + t
           for t in EVENT_TYPES)}
FROM events GROUP BY user_id
"""


def g7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p95) per event type. Inputs quantized
    to DECIMAL so both engines interpolate over identical doubles; exact
    percentile is deterministic (unlike approx sketches — see
    sk_kmv_distinct_* for the approximate path)."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile(v, F.lit(0.5)).alias("p50"),
            F.percentile(v, F.lit(0.95)).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_G7 = """
SELECT event_type,
       quantile_cont(CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE), 0.95) AS p95,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def g8_window_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window surface in one pass: per-user lag (previous event
    time + gap), lead (next event id), and global-by-type ntile quartile.
    Both windows order by a UNIQUE key tuple (ts, event_id) so every
    function is deterministic; the two partitionings are separate
    shuffles by design (user_id and event_type are different keys)."""
    tune(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type", "value")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("event_type").orderBy("value", "event_id")
    prev_ts = F.lag("ts").over(w_user)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        prev_ts.alias("prev_ts"),
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))).alias("gap_us"),
        F.lead("event_id").over(w_user).alias("next_event_id"),
        F.ntile(4).over(w_type).alias("value_quartile"),
    )


ORACLE_G8 = """
SELECT event_id, user_id, event_type,
       LAG(ts) OVER w_user AS prev_ts,
       epoch_us(ts) - epoch_us(LAG(ts) OVER w_user) AS gap_us,
       LEAD(event_id) OVER w_user AS next_event_id,
       NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS value_quartile
FROM events
WINDOW w_user AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def g9_range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval correlation via the bucketed range join
    (operators/rangejoin.py): for every purchase event, the count and
    summed value of the same user's clicks in the preceding 24 hours.
    The join key is (user_id, time bucket) — a hash equi-join whose
    intermediate is O(matches) even under user skew; the exact interval
    is a residual predicate. Purchases with no clicks return via the
    aggregate-then-left-join, not an outer bucket join."""
    tune(spark)
    from geo_db_spark.operators.rangejoin import bucketed_range_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    matches = bucketed_range_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="c_ts",
        lower_s=-86400.0,
        upper_s=0.0,
    )
    agg = matches.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("c_value").cast("decimal(18,6)")).alias("_sv"),
    )
    return purchases.join(agg, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("_sv").cast("double"), F.lit(0.0)).alias("click_value"),
    )


ORACLE_G9 = """
SELECT p.event_id, p.user_id, p.ts,
       COUNT(c.user_id) AS n_clicks,
       COALESCE(CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS click_value
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 24 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""


def g19_interval_join_clicks_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the r7 streaming two-sided interval join
    (streaming.click_impression_stream_join): every (click, view) pair
    of the same user within ±10 minutes, via the bucketed range join —
    hash equi-join on (user_id, time bucket) with the exact ±window as a
    residual, O(matches) intermediate. Puts the join's SEMANTICS under
    the driver's value oracle; the streaming test pins stream==batch."""
    tune(spark)
    from geo_db_spark.operators.rangejoin import bucketed_range_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_event_id"), F.col("ts").alias("v_ts")
    )
    return bucketed_range_join(
        clicks,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="v_ts",
        lower_s=-600.0,
        upper_s=600.0,
    ).select("c_event_id", "user_id", "ts", "v_event_id", "v_ts")


ORACLE_G19 = """
SELECT c.event_id AS c_event_id, c.user_id, c.ts,
       v.event_id AS v_event_id, v.ts AS v_ts
FROM events c
JOIN events v
  ON v.event_type = 'view'
 AND v.user_id = c.user_id
 AND v.ts >= c.ts - INTERVAL 10 MINUTE
 AND v.ts <= c.ts + INTERVAL 10 MINUTE
WHERE c.event_type = 'click'
"""


def g10_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: per event_type counts and
    value sums at THREE time resolutions (minute, hour, day) from one
    scan — GROUPING SETS over pre-computed time buckets, so Spark plans
    a single aggregate (with partial map-side combine) instead of three
    scans + a union. `resolution` disambiguates rows; the finer buckets
    are NULL at coarser grain exactly as in the SQL twin."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("minute", "ts").alias("minute"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.date_trunc("day", "ts").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    out = (
        b.groupingSets(
            [
                ["event_type", "day", "hour", "minute"],
                ["event_type", "day", "hour"],
                ["event_type", "day"],
            ],
            "event_type",
            "day",
            "hour",
            "minute",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            "day",
            "hour",
            "minute",
            F.when(F.col("minute").isNotNull(), "minute")
            .when(F.col("hour").isNotNull(), "hour")
            .otherwise("day")
            .alias("resolution"),
            "n_events",
            "sum_value",
        )
    )
    return out


ORACLE_G10 = """
SELECT event_type, day, hour, minute,
       CASE WHEN minute IS NOT NULL THEN 'minute'
            WHEN hour IS NOT NULL THEN 'hour'
            ELSE 'day' END AS resolution,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type,
         date_trunc('minute', ts) AS minute,
         date_trunc('hour', ts) AS hour,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         value
  FROM events
) b
GROUP BY GROUPING SETS (
  (event_type, day, hour, minute),
  (event_type, day, hour),
  (event_type, day)
)
"""


def g11_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completes the join-type matrix: inner/left/
    semi/anti/outer are covered elsewhere): per-nation customer vs
    supplier account balances, keeping nations that have only one side.
    Aggregate-then-join: the outer join runs on 25-row inputs, never on
    the raw tables."""
    tune(spark)
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ckey"))
        .agg(F.sum(F.col("c_acctbal").cast("decimal(14,2)")).alias("_cb"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("skey"))
        .agg(F.sum(F.col("s_acctbal").cast("decimal(14,2)")).alias("_sb"))
    )
    return cust.join(supp, cust.ckey == supp.skey, "full_outer").select(
        F.coalesce(F.col("ckey"), F.col("skey")).cast("int").alias("nationkey"),
        F.col("_cb").cast("double").alias("cust_balance"),
        F.col("_sb").cast("double").alias("supp_balance"),
    )


ORACLE_G11 = """
SELECT COALESCE(c.ckey, s.skey) AS nationkey,
       CAST(c._cb AS DOUBLE) AS cust_balance,
       CAST(s._sb AS DOUBLE) AS supp_balance
FROM (SELECT c_nationkey AS ckey, SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS _cb
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS skey, SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS _sb
      FROM supplier GROUP BY s_nationkey) s
  ON c.ckey = s.skey
"""


def g12_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (with g2's EXCEPT this completes the set-op surface):
    nation keys that have BOTH a high-balance customer and a
    high-balance supplier."""
    tune(spark)
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 1000)
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 1000)
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
    )
    return cust.intersect(supp)


ORACLE_G12 = """
SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer WHERE c_acctbal > 1000
INTERSECT
SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier WHERE s_acctbal > 1000
"""


def g14_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling in one scan: per-column min / max / null count /
    distinct count for a representative column set, long-format (one row
    per column). The warehouse 'profile this table' pass — everything
    computes in a single aggregate job with map-side partials; distinct
    counts are exact here (swap in the KMV sketch for 100 TB profiling)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in ("l_quantity", "l_extendedprice", "l_discount")
            for e in (
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
                F.countDistinct(c).alias(f"{c}_distinct"),
            )
        ],
    )
    rows = [
        agg.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            F.col(f"{c}_min").cast("double").alias("min_v"),
            F.col(f"{c}_max").cast("double").alias("max_v"),
            F.col(f"{c}_nulls").alias("n_nulls"),
            F.col(f"{c}_distinct").alias("n_distinct"),
        )
        for c in ("l_quantity", "l_extendedprice", "l_discount")
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


ORACLE_G14 = """
SELECT 'l_quantity' AS column, COUNT(*) AS n_rows,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v, CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT l_quantity) AS n_distinct
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
       CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT l_discount)
FROM lineitem
"""


def g16_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the event stream: users who viewed, then later
    clicked, then later purchased (strict temporal order, each stage's
    clock starting at the previous stage's first qualifying event).

    Scale shape: three user-keyed conditional min-aggregations chained by
    user-key equi-joins — every shuffle is on user_id, AQE co-locates the
    tiny later stages; no windows over the full stream, no self-join on
    the raw events."""
    tune(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(df, etype, after=None):
        src = df.filter(F.col("event_type") == etype)
        if after is not None:
            src = src.join(after, "user_id").filter(F.col("ts") > F.col("t0"))
        return src.groupBy("user_id").agg(F.min("ts").alias("t0"))

    s1 = first_after(ev, "view")
    s2 = first_after(ev, "click", s1.select("user_id", "t0"))
    s3 = first_after(ev, "purchase", s2.select("user_id", "t0"))
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


ORACLE_G16 = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t0
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t0
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t0
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t0
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_click,
       CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_view_click_purchase
"""


def g17_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; per (cohort week, weeks-since-cohort) the count of distinct
    active users. Both week truncations are ISO-Monday in Spark and
    DuckDB, and the offset divides an exact multiple of 7 days.

    Scale shape: one user-keyed min-aggregation for cohorts, one join
    back on user_id, one (cohort, offset) groupBy — all partial-agg
    friendly, no windows."""
    tune(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("w"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


ORACLE_G17 = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN cohort USING (user_id)
GROUP BY 1, 2
"""



QUERIES = {
    "g14_profile_lineitem": g14_profile_lineitem,
    "d1_customers_without_urgent_orders": d1_customers_without_urgent_orders,
    "d2_argmin_order_per_customer": d2_argmin_order_per_customer,
    "d4_top2_orders_per_customer": d4_top2_orders_per_customer,
    "d5_customer_names_per_nation": d5_customer_names_per_nation,
    "d5_salted_group_concat": d5_salted_group_concat,
    "d8_preferred_lineitem": d8_preferred_lineitem,
    "d9_customer_nation_name": d9_customer_nation_name,
    "d10_dedup_order_part": d10_dedup_order_part,
    "d11_orders_with_big_lineitem": d11_orders_with_big_lineitem,
    "w1_running_sum_per_user": w1_running_sum_per_user,
    "w2_tumbling_window_counts": w2_tumbling_window_counts,
    "w3_sessionize": w3_sessionize,
    "w4_rate_limit_dedup": w4_rate_limit_dedup,
    "g1_rollup_revenue": g1_rollup_revenue,
    "g2_except_customers": g2_except_customers,
    "g3_asof_last_purchase": g3_asof_last_purchase,
    "g4_json_props": g4_json_props,
    "g5_asof_two_table": g5_asof_two_table,
    "g6_pivot_event_values": g6_pivot_event_values,
    "g7_percentiles": g7_percentiles,
    "g8_window_pack": g8_window_pack,
    "g9_range_join_clicks": g9_range_join_clicks,
    "g19_interval_join_clicks_views": g19_interval_join_clicks_views,
    "g10_multi_resolution_rollup": g10_multi_resolution_rollup,
    "g11_full_outer_balance": g11_full_outer_balance,
    "g12_intersect_nations": g12_intersect_nations,
    "g16_funnel_conversion": g16_funnel_conversion,
    "g17_cohort_retention": g17_cohort_retention,
}

ORACLES = {
    "g14_profile_lineitem": ORACLE_G14,
    "g11_full_outer_balance": ORACLE_G11,
    "g12_intersect_nations": ORACLE_G12,
    "g16_funnel_conversion": ORACLE_G16,
    "g17_cohort_retention": ORACLE_G17,
    "g10_multi_resolution_rollup": ORACLE_G10,
    "w4_rate_limit_dedup": ORACLE_W4,
    "g8_window_pack": ORACLE_G8,
    "g9_range_join_clicks": ORACLE_G9,
    "g19_interval_join_clicks_views": ORACLE_G19,
    "d1_customers_without_urgent_orders": ORACLE_D1,
    "d2_argmin_order_per_customer": ORACLE_D2,
    "d4_top2_orders_per_customer": ORACLE_D4,
    "d5_customer_names_per_nation": ORACLE_D5,
    "d5_salted_group_concat": ORACLE_D5,
    "d8_preferred_lineitem": ORACLE_D8,
    "d9_customer_nation_name": ORACLE_D9,
    "d10_dedup_order_part": ORACLE_D10,
    "d11_orders_with_big_lineitem": ORACLE_D11,
    "w1_running_sum_per_user": ORACLE_W1,
    "w2_tumbling_window_counts": ORACLE_W2,
    "w3_sessionize": ORACLE_W3,
    "g1_rollup_revenue": ORACLE_G1,
    "g2_except_customers": ORACLE_G2,
    "g3_asof_last_purchase": ORACLE_G3,
    "g4_json_props": ORACLE_G4,
    "g5_asof_two_table": ORACLE_G5,
    "g6_pivot_event_values": ORACLE_G6,
    "g7_percentiles": ORACLE_G7,
}


def g19_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (mktsegment, order-priority) revenue with explicit grouping
    flags — the last grouping-sets shape not covered by g1's ROLLUP.
    grouping() flags (not the raw grouping_id bit layout) are emitted so
    the output is engine-neutral."""
    tune(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    enriched = orders.join(
        cust.select("c_custkey", "c_mktsegment"), orders.o_custkey == F.col("c_custkey")
    ).select(
        "c_mktsegment",
        F.col("o_orderpriority"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    return (
        enriched.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.sum("p").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
        )
    )


ORACLE_G19 = """
SELECT c_mktsegment, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""

QUERIES["g19_cube_revenue"] = g19_cube_revenue
ORACLES["g19_cube_revenue"] = ORACLE_G19


def g20_window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window functions in one deterministic pass:
    percent_rank / cume_dist / nth_value over a per-segment balance
    ordering (unique key tuple so every function is stable), plus
    dense_rank for the tie-free contrast."""
    tune(spark)
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.col("bal").cast("double").alias("acctbal"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.nth_value(F.col("bal").cast("double"), 3).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("third_lowest"),
    )


ORACLE_G20 = """
SELECT c_custkey, c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(dense_rank() OVER w AS INT) AS drank,
       nth_value(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE), 3) OVER (
         PARTITION BY c_mktsegment ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_lowest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_custkey)
"""

QUERIES["g20_window_rank_surface"] = g20_window_rank_surface
ORACLES["g20_window_rank_surface"] = ORACLE_G20


def g21_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (`<=>` / IS NOT DISTINCT FROM) join surface:
    customers with a negative balance get a NULL segment key; a
    null-safe join against the distinct key set still matches those
    rows to the NULL dim row (a plain equi-join would silently drop
    them — the classic nullable-FK bug)."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("k"),
    )
    dim = cust.select("k").distinct().select(
        F.col("k").alias("dk"), F.coalesce("k", F.lit("UNSEGMENTED")).alias("label")
    )
    return (
        cust.join(dim, cust["k"].eqNullSafe(dim["dk"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_G21 = """
WITH keyed AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS k
  FROM customer
),
dim AS (
  SELECT k AS dk, COALESCE(k, 'UNSEGMENTED') AS label FROM (SELECT DISTINCT k FROM keyed)
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.dk
GROUP BY 1
"""

QUERIES["g21_null_safe_join"] = g21_null_safe_join
ORACLES["g21_null_safe_join"] = ORACLE_G21


def g22_explode_outer_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER / explode_outer surface: long words (>4 chars)
    per part name; parts with NO long word survive the explode as a NULL
    row (plain explode would drop them) and land in the '<none>' bucket."""
    tune(spark)
    part = load(spark, sf_dir, "part")
    words = F.expr("filter(split(p_name, ' '), w -> length(w) > 4)")
    ex = part.select("p_partkey", F.explode_outer(words).alias("w"))
    return ex.groupBy(F.coalesce("w", F.lit("<none>")).alias("word")).agg(
        F.count_distinct("p_partkey").alias("n_parts")
    )


ORACLE_G22 = """
WITH lw AS (
  SELECT p_partkey,
         list_filter(regexp_split_to_array(p_name, ' '), x -> length(x) > 4) AS ws
  FROM part
),
ex AS (SELECT p_partkey, unnest(ws) AS w FROM lw),
none AS (SELECT p_partkey FROM lw WHERE len(ws) = 0)
SELECT w AS word, CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts FROM ex GROUP BY 1
UNION ALL
SELECT '<none>', CAST(COUNT(*) AS BIGINT) FROM none HAVING COUNT(*) > 0
"""

QUERIES["g22_explode_outer_words"] = g22_explode_outer_words
ORACLES["g22_explode_outer_words"] = ORACLE_G22


def g23_unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt surface (DataFrame.unpivot, SQL stack): the wide
    per-lineitem metric columns (l_extendedprice, l_discount, l_tax)
    melt into (metric, value) long form, then aggregate per metric x
    return flag — the wide->long reshape every metrics pipeline needs,
    dual of the g6 pivot. Values are decimal-quantized before the sum
    so the hash matches the oracle's exact arithmetic."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("extended_price"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    ).unpivot(
        ["l_returnflag"],
        ["extended_price", "discount", "tax"],
        "metric",
        "value",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


ORACLE_G23 = """
WITH long AS (
  SELECT l_returnflag, 'extended_price' AS metric, CAST(l_extendedprice AS DOUBLE) AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', CAST(l_discount AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', CAST(l_tax AS DOUBLE) FROM lineitem
)
SELECT l_returnflag, metric,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM long GROUP BY 1, 2
"""

QUERIES["g23_unpivot_lineitem_metrics"] = g23_unpivot_lineitem_metrics
ORACLES["g23_unpivot_lineitem_metrics"] = ORACLE_G23


def g24_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL bag semantics (exceptAll /
    intersectAll): multiset difference and intersection of the lineitem
    quantity bags of two return flags, per quantity value. Bag semantics
    matter when duplicates carry meaning (here: how many lineitems of
    each quantity one mode has OVER the other) — the set-based g2/g12
    EXCEPT/INTERSECT collapse them."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    air = li.filter(F.col("l_returnflag") == "R").select(F.col("l_quantity").cast("long").alias("q"))
    mail = li.filter(F.col("l_returnflag") == "A").select(F.col("l_quantity").cast("long").alias("q"))
    diff = air.exceptAll(mail).groupBy("q").agg(F.count(F.lit(1)).alias("surplus"))
    both = air.intersectAll(mail).groupBy("q").agg(F.count(F.lit(1)).alias("common"))
    return diff.join(both, "q", "full_outer").select(
        "q",
        F.coalesce("surplus", F.lit(0)).alias("surplus"),
        F.coalesce("common", F.lit(0)).alias("common"),
    )


ORACLE_G24 = """
WITH a AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS ca
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
m AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS cm
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
),
j AS (
  SELECT COALESCE(a.q, m.q) AS q,
         COALESCE(ca, 0) AS ca, COALESCE(cm, 0) AS cm
  FROM a FULL OUTER JOIN m USING (q)
)
SELECT q,
       CAST(GREATEST(ca - cm, 0) AS BIGINT) AS surplus,
       CAST(LEAST(ca, cm) AS BIGINT) AS common
FROM j
WHERE GREATEST(ca - cm, 0) > 0 OR LEAST(ca, cm) > 0
"""

QUERIES["g24_except_all_lineitems"] = g24_except_all_lineitems
ORACLES["g24_except_all_lineitems"] = ORACLE_G24


def g25_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS surface (completing the grouping family:
    ROLLUP g1, CUBE g19): revenue at three chosen granularities —
    (flag, status), (flag), and grand total — with GROUPING() markers
    disambiguating real NULLs from subtotal rows. SQL API on a temp
    view; Catalyst expands to the same Expand+Aggregate as cube/rollup."""
    tune(spark)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_g25")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem_g25
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


ORACLE_G25 = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""

QUERIES["g25_grouping_sets_revenue"] = g25_grouping_sets_revenue
ORACLES["g25_grouping_sets_revenue"] = ORACLE_G25


def g21_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact z-score outlier flagging (r7): events whose value
    deviates from their event_type's mean by more than 3 sigma. The
    data-quality gate every pipeline runs before training — done WITHOUT
    sqrt or float accumulation: values quantize to integers v =
    floor(value·1000), and |x-μ| > 3σ is tested as the equivalent
    integer inequality (n·x − s)² > 9·(n·s2 − s²) with s = Σv,
    s2 = Σv² (both exact int64 — derived by multiplying the float
    inequality through by n²). One pass for the per-group moments
    (map-side combined, two longs of state per group), broadcast back,
    codegen comparison — the same shape at any scale."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    base = ev.select("event_id", "event_type", v.alias("v"))
    mom = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    j = base.join(F.broadcast(mom), "event_type")
    dev = (F.col("n") * F.col("v") - F.col("s")).cast("double")
    var_n2 = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    )
    return j.filter(dev * dev > 9 * var_n2).select(
        "event_id",
        "event_type",
        "v",
        F.col("n").alias("group_n"),
    )


ORACLE_G21 = """
WITH base AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 1000) AS BIGINT) AS v FROM events
),
mom AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM base GROUP BY event_type
)
SELECT b.event_id, b.event_type, b.v, mom.n AS group_n
FROM base b JOIN mom USING (event_type)
WHERE CAST(mom.n * b.v - mom.s AS DOUBLE) * CAST(mom.n * b.v - mom.s AS DOUBLE)
      > 9 * (CAST(mom.n AS DOUBLE) * CAST(mom.s2 AS DOUBLE) - CAST(mom.s AS DOUBLE) * CAST(mom.s AS DOUBLE))
"""

QUERIES["g21_zscore_outliers"] = g21_zscore_outliers
ORACLES["g21_zscore_outliers"] = ORACLE_G21


def g27_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate (r7b): median absolute deviation instead of
    g21's mean/sigma — MAD is what production data-quality gates use
    when the metric itself has heavy tails (3-sigma's mean AND sigma are
    dragged by the very outliers being hunted; the median and MAD are
    50%-breakdown robust). Flags events with |v - median| > 3 * MAD per
    event type.

    Two exact-percentile passes (median of v, then median of |v - med|),
    g7's determinism recipe (decimal-quantized doubles so both engines
    interpolate identical values); the per-type (median, mad) table is
    dimension-sized and broadcast onto the event scan — same comparison
    shape as g21's broadcast moments."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)").cast("double")
    med = ev.groupBy("event_type").agg(F.percentile(v, F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        v.alias("v"),
        "med",
        F.abs(v - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("absdev"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("v") - F.col("med")) > F.lit(3.0) * F.col("mad"))
        .select("event_type", "event_id", "v", "med", "mad")
    )


ORACLE_G27 = """
WITH q AS (
  SELECT event_type, event_id,
         CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS v
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM q GROUP BY event_type
),
mad AS (
  SELECT q.event_type, quantile_cont(abs(q.v - m.med), 0.5) AS mad
  FROM q JOIN med m USING (event_type) GROUP BY q.event_type
)
SELECT q.event_type, q.event_id, q.v, m.med, d.mad
FROM q JOIN med m USING (event_type) JOIN mad d USING (event_type)
WHERE abs(q.v - m.med) > 3.0 * d.mad
"""

QUERIES["g27_mad_outliers"] = g27_mad_outliers
ORACLES["g27_mad_outliers"] = ORACLE_G27
