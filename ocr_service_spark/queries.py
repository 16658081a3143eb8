"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as a (spark, sf_dir) -> DataFrame callable plus a
DuckDB-runnable ANSI-SQL oracle that computes the same result.

Parity rules (the driver hash-compares values with columns sorted by
name, rows order-insensitive):
- every computed double is rounded explicitly on BOTH sides; sums over
  doubles go through DECIMAL(18,x) casts so partial-agg order can never
  change the result;
- timestamps leave the query as `date_format(...)` strings, so session
  timezone can't skew the comparison;
- ranking ties always break on a unique key (vec_id / custkey / ...);
- aliases match exactly between the Spark plan and the oracle SQL.

Scale notes ride on each query: the same plan is what we'd run at
10^12 rows — broadcast hints on dimension tables, salted two-phase
aggregation for skewed keys, map-side-combinable aggs, no collect().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_service_spark.operators.dedup import dedup_latest

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Aggregation tier (SURVEY.md §2.4: A1/A8 analogs on TPC-H-ish tables)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — partial+final hash agg with map-side combine
    (reference analog: hand-rolled sum/len accumulations,
    core/processor.py:223-231; SURVEY.md A1/A8). Decimal-cast sums make
    the result independent of partial-agg order at any parallelism."""
    l = _t(spark, sf_dir, "lineitem")
    dec2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                  .cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(dec2("l_quantity")).cast("double") / F.count("*"), 4
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c.c_custkey
    LIMIT 10
    """,
)
def top_customers(spark, sf_dir):
    """Join + agg + global top-k (SURVEY.md J/A4/O4). Aggregate the fact
    FIRST (shrinks 15k orders -> 1.5k groups before the join), then
    broadcast-join the customer dim: at 10^12 rows the pre-agg side of
    the join is what keeps the shuffle small. Spark's TakeOrderedAndProject
    handles the top-10 without a global sort."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spent"),
        F.count("*").alias("n_orders"),
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "region_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def region_revenue(spark, sf_dir):
    """TPC-H Q5-shaped multiway star join (SURVEY.md §2.3 'multi-way
    equi-joins'). One shuffle join on the fact keys (lineitem x orders);
    every dimension is broadcast — the plan at 100 TB is a single
    shuffle stage plus broadcast hash joins."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                  .cast("decimal(18,4)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "mktsegment_having",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) >= 300
    ORDER BY c_mktsegment
    """,
)
def mktsegment_having(spark, sf_dir):
    """GroupBy + HAVING (SURVEY.md A2: the reference's grouped feedback
    mining with count/avg-confidence thresholds,
    services/feedback_collector.py:185-234)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*"), 4,
            ).alias("avg_acctbal"),
        )
        .filter(F.col("n_customers") >= 300)
        .orderBy("c_mktsegment")
    )


@query(
    "priority_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_finished,
           SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def priority_counts(spark, sf_dir):
    """Conditional counts (SURVEY.md A7/A12: applied-vs-pending and
    success counters, services/feedback_collector.py:251-267)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
    )


@query(
    "rollup_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem(spark, sf_dir):
    """ROLLUP grouping sets (SURVEY.md §2.4 'grouping sets available
    built-in'; reference computes per-phase AND total stats separately,
    scripts/process_certificates_all_phases.py:319-355 — rollup does
    both in one pass)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "part_brand_stats",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part
    WHERE p_type LIKE '%PROMO%' OR p_type = 'ECONOMY'
    GROUP BY p_brand
    """,
)
def part_brand_stats(spark, sf_dir):
    """Predicate-pushdown filter + agg (SURVEY.md P-tier + A-tier); the
    LIKE filter reaches the parquet scan as a pushed StringContains."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%PROMO%") | (F.col("p_type") == "ECONOMY"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count("*"), 4,
            ).alias("avg_price"),
            F.max("p_size").cast("bigint").alias("max_size"),
        )
    )


# ---------------------------------------------------------------------------
# Window tier (SURVEY.md §2.5) over the events table
# ---------------------------------------------------------------------------

@query(
    "window_running",
    oracle="""
    SELECT event_id, user_id,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           LAG(event_id) OVER w AS prev_event_id
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_running(spark, sf_dir):
    """row_number / running sum / lag over a per-user event stream
    (SURVEY.md §2.5 'ranking, lag/lead, sliding frames'). Total order
    inside the partition is (ts, event_id) so parallel runs agree;
    running sums go through DECIMAL so frame-prefix sums are exact."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )


@query(
    "sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + cumulative
    flag sum — the batch twin of a Structured Streaming session window
    (SURVEY.md §2.10 'session windows: none in reference, built for the
    streaming tier'). At scale this is one shuffle on user_id."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ in
    # Spark 4; unix_millis wants an instant — the NTZ→LTZ cast uses the
    # session tz (UTC) and cancels out in gap/duration arithmetic.
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (ms - F.lag(ms).over(w) > 1800000) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("is_new"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    dur = F.unix_millis(F.max("ts").cast("timestamp_ltz")) - F.unix_millis(
        F.min("ts").cast("timestamp_ltz"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        dur.alias("duration_ms"),
    )


@query(
    "tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window(spark, sf_dir):
    """Tumbling event-time window agg — the batch shape of
    `readStream → groupBy(window(ts, '1 hour')) → agg` (SURVEY.md §2.10;
    streaming variant lives in ocr_service_spark/streaming/). Uses
    F.window (real window struct), emitted as a formatted string so the
    oracle's date_trunc matches byte-for-byte."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT event_type, user_id, total_value, rnk FROM (
      SELECT event_type, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY SUM(CAST(value AS DECIMAL(18,6))) DESC, user_id) AS rnk
      FROM events GROUP BY event_type, user_id
    ) WHERE rnk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Best-per-group / top-k per key (SURVEY.md W1: the reference's
    max-by-confidence candidate pick, core/validators.py:186-191).
    Aggregate first, then a window over the (small) aggregated set —
    never a window over the raw fact table."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    per = e.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        per.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "user_id", "total_value", "rnk")
    )


# ---------------------------------------------------------------------------
# Set operations / semi-anti joins (SURVEY.md §2.7, §2.3)
# ---------------------------------------------------------------------------

@query(
    "set_ops_users",
    oracle="""
    SELECT 'click_and_purchase' AS kind, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'view_no_signup' AS kind, user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    )
    """,
)
def set_ops_users(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL (SURVEY.md U1-U3; reference only
    has list-append unions, core/processor.py:412-438 — set ops come
    free in Spark)."""
    e = _t(spark, sf_dir, "events")
    by = lambda t: e.filter(F.col("event_type") == t).select("user_id").distinct()
    both = by("click").intersect(by("purchase")).select(
        F.lit("click_and_purchase").alias("kind"), "user_id")
    only = by("view").exceptAll(by("signup")).select(
        F.lit("view_no_signup").alias("kind"), "user_id")
    return both.unionByName(only)


@query(
    "anti_semi_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, FALSE AS has_orders
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_name, TRUE AS has_orders
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_semi_customers(spark, sf_dir):
    """Left-anti + left-semi joins (SURVEY.md §2.3: the reference's
    'skip candidates already in the corrections DB',
    services/active_learning.py:110). The orders side is reduced to
    distinct keys before joining — at 10^12 rows the anti join probe
    side must be the deduplicated key set, not the raw fact."""
    c = _t(spark, sf_dir, "customer")
    o_keys = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    anti = c.join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit(False).alias("has_orders"))
    semi = c.join(o_keys, c.c_custkey == o_keys.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit(True).alias("has_orders"))
    return anti.unionByName(semi)


# ---------------------------------------------------------------------------
# Dedup tier
# ---------------------------------------------------------------------------

@query(
    "dedup_latest_events",
    oracle="""
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_latest_events(spark, sf_dir):
    """The north-rule dedup-and-validate shuffle: keep the latest row
    per key via SALTED two-phase max-of-struct aggregation (no window,
    no sort — operators/dedup.py). At 10^12 rows a hot key is split
    across n_salts reducers in phase 1; phase 2 touches one row per
    (key, salt)."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    d = dedup_latest(e, key="user_id", order_cols=("ts", "event_id"), n_salts=8)
    return d.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
    )


# ---------------------------------------------------------------------------
# Correction joins (SURVEY.md §2.3 J1/J2) — broadcast dict + edit-distance
# ---------------------------------------------------------------------------

_CORRECTIONS = [
    ("tabel", "table"), ("scna", "scan"), ("jion", "join"),
    ("filtre", "filter"), ("valu", "value"), ("spark", "SPARK"),
    ("merge", "MERGE"), ("batch", "BATCH"),
]
_CORR_VALUES = ", ".join(f"('{o}', '{c}')" for o, c in _CORRECTIONS)


@query(
    "correction_join",
    oracle=f"""
    WITH corrections(original, corrected) AS (VALUES {_CORR_VALUES}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    exact AS (
      SELECT 'exact_match' AS method, c.original, c.corrected, COUNT(*) AS n
      FROM toks t JOIN corrections c ON t.tok = c.original
      GROUP BY c.original, c.corrected
    ),
    sim AS (
      SELECT 'similarity' AS method, c.original, c.corrected, COUNT(*) AS n
      FROM (SELECT DISTINCT doc_id, tok FROM toks) t
      JOIN corrections c
        ON levenshtein(t.tok, c.original) BETWEEN 1 AND 2 AND abs(length(t.tok) - length(c.original)) <= 2
      GROUP BY c.original, c.corrected
    )
    SELECT * FROM exact UNION ALL SELECT * FROM sim
    """,
)
def correction_join(spark, sf_dir):
    """J1 exact broadcast-hash dictionary join + J2 edit-distance theta
    join (reference core/correctors.py:154-161, 121-141). The theta join
    is a broadcast nested-loop against the tiny corrections dim with a
    cheap length-delta prefilter before levenshtein — the rewrite of the
    reference's O(tokens x corrections) python scan."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    corr = spark.createDataFrame(_CORRECTIONS, "original string, corrected string")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    exact = (
        toks.join(F.broadcast(corr), toks.tok == corr.original)
        .groupBy("original", "corrected")
        .agg(F.count("*").alias("n"))
        .select(F.lit("exact_match").alias("method"), "original", "corrected", "n")
    )
    dtoks = toks.distinct()
    sim = (
        dtoks.join(
            F.broadcast(corr),
            (F.abs(F.length(dtoks.tok) - F.length(corr.original)) <= 2)
            & F.levenshtein(dtoks.tok, corr.original).between(1, 2),
        )
        .groupBy("original", "corrected")
        .agg(F.count("*").alias("n"))
        .select(F.lit("similarity").alias("method"), "original", "corrected", "n")
    )
    return exact.unionByName(sim)


# ---------------------------------------------------------------------------
# Feedback mining (SURVEY.md A2/A3/T4) over a synthesized feedback stream
# ---------------------------------------------------------------------------

@query(
    "feedback_mining",
    oracle="""
    WITH feedback AS (
      SELECT concat('w', CAST(event_id % 50 AS VARCHAR)) AS original,
             upper(concat('w', CAST(event_id % 50 AS VARCHAR))) AS corrected,
             ROUND((event_id % 100) / 100.0, 2) AS confidence,
             (event_id % 4 = 0) AS applied
      FROM events WHERE event_type = 'error'
    )
    SELECT original, corrected, COUNT(*) AS occurrences,
           ROUND(CAST(SUM(CAST(confidence AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), 4) AS avg_confidence
    FROM feedback
    WHERE NOT applied
    GROUP BY original, corrected
    HAVING COUNT(*) >= 2 AND ROUND(CAST(SUM(CAST(confidence AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), 4) >= 0.5
    ORDER BY occurrences DESC, avg_confidence DESC, original
    LIMIT 20
    """,
)
def feedback_mining(spark, sf_dir):
    """The reference's active-learning candidate mining verbatim
    (get_unapplied_corrections: group unapplied (original, corrected)
    pairs, HAVING count>=min_occurrences AND avg_conf>=min_confidence,
    multi-key desc sort, services/feedback_collector.py:185-234 +
    A2/O1): here over a feedback stream synthesized deterministically
    from the events table so the oracle sees identical input."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    fb = e.select(
        F.concat(F.lit("w"), (F.col("event_id") % 50).cast("string")).alias("original"),
        F.upper(F.concat(F.lit("w"), (F.col("event_id") % 50).cast("string"))).alias("corrected"),
        F.round((F.col("event_id") % 100) / 100.0, 2).alias("confidence"),
        (F.col("event_id") % 4 == 0).alias("applied"),
    )
    avg_conf = F.round(
        F.sum(F.col("confidence").cast("decimal(10,2)")).cast("double") / F.count("*"), 4
    )
    return (
        fb.filter(~F.col("applied"))
        .groupBy("original", "corrected")
        .agg(F.count("*").alias("occurrences"), avg_conf.alias("avg_confidence"))
        .filter((F.col("occurrences") >= 2) & (F.col("avg_confidence") >= 0.5))
        .orderBy(F.desc("occurrences"), F.desc("avg_confidence"), F.asc("original"))
        .limit(20)
    )
