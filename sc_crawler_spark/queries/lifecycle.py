"""Lifecycle / sync / temporal queries (SURVEY.md §2.2 K1, §2.4 J6,
§2.10 T1-T3) plus the streaming-analog batch windows (§2.11 extension).

The sync fixture follows FIXTURES.md §2.7: a deterministic mutation of the
``orders`` table plays the target snapshot so both engines can construct
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sync import hash_diff
from ..operators.upsert import merge_upsert
from ..operators.windows import latest_snapshot, session_flags
from ..functions.scalars import dround, sql_round
from ..tables import load

# ----------------------------------------------------- hash-diff sync (J6/T3)


def _orders_stable(spark: SparkSession, sf: str) -> DataFrame:
    """Orders projected to hash-stable columns (ints/strings only; price
    as integer cents so double->string formatting never enters the hash)."""
    return load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
    )


def hash_diff_sync(spark: SparkSession, sf: str) -> DataFrame:
    """Full sync classification: new / update / deleted between a source
    snapshot and a deterministically mutated target (cli.py:373-597).

    Target := source MINUS (orderkey%19=3)           -> those become 'new'
              with price+100 cents where %17=5       -> 'update'
              PLUS clones orderkey+10000000 (%23=7)  -> 'deleted'
    """
    src = _orders_stable(spark, sf)
    kept = src.filter(F.col("o_orderkey") % 19 != 3)
    mutated = kept.withColumn(
        "price_cents",
        F.when(F.col("o_orderkey") % 17 == 5, F.col("price_cents") + 100)
        .otherwise(F.col("price_cents")),
    )
    extra = src.filter(F.col("o_orderkey") % 23 == 7).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    tgt = mutated.unionByName(extra)
    return hash_diff(src, tgt, pks=["o_orderkey"])


# DuckDB mirror of functions/hashing.row_hash: sha256 over
# (name, null-flag, value-length, value) frames sorted by column name,
# joined on <US> = chr(31). The length field makes the encoding
# injective (values containing the separator cannot realign frames).
_HASH_COLS = ["o_custkey", "o_orderpriority", "o_orderstatus", "price_cents"]
_HASH_EXPR = "sha256(concat_ws(chr(31), " + ", ".join(
    f"'{c}', CASE WHEN {c} IS NULL THEN 'n' ELSE 'v' END, "
    f"CAST(length(coalesce(CAST({c} AS VARCHAR), '')) AS VARCHAR), "
    f"coalesce(CAST({c} AS VARCHAR), '')" for c in _HASH_COLS
) + "))"

HASH_DIFF_SQL = f"""
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders
), tgt AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CASE WHEN o_orderkey % 17 = 5 THEN price_cents + 100 ELSE price_cents END AS price_cents
  FROM src WHERE o_orderkey % 19 != 3
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_orderpriority, price_cents
  FROM src WHERE o_orderkey % 23 = 7
), sh AS (SELECT o_orderkey, {_HASH_EXPR} AS row_sha FROM src),
   th AS (SELECT o_orderkey, {_HASH_EXPR} AS row_sha FROM tgt)
SELECT s.o_orderkey, 'new' AS action FROM sh s
  WHERE NOT EXISTS (SELECT 1 FROM th t WHERE t.o_orderkey = s.o_orderkey)
UNION ALL
SELECT s.o_orderkey, 'update' AS action FROM sh s JOIN th t USING (o_orderkey)
  WHERE s.row_sha != t.row_sha
UNION ALL
SELECT t.o_orderkey, 'deleted' AS action FROM th t
  WHERE NOT EXISTS (SELECT 1 FROM sh s WHERE s.o_orderkey = t.o_orderkey)
"""

# --------------------------------------------------- merge upsert + T1 sweep


def merge_upsert_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Inactivate-then-upsert inventory cycle (K1+T1 — insert.py:115-173,
    tables.py:224-283): even customers are 're-fetched' with a new balance,
    some arrive as brand-new rows, everyone missing from the fetch flips
    to inactive."""
    cust = load(spark, sf, "customer")
    current = cust.withColumn("status", F.lit("active"))
    refetched = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 10
    )
    new_rows = cust.filter(F.col("c_custkey") % 37 == 2).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    updates = refetched.unionByName(new_rows).withColumn("status", F.lit("active"))
    merged = merge_upsert(current, updates, pks=["c_custkey"], inactivate_missing=True)
    return merged.select(
        "c_custkey", dround(F.col("c_acctbal"), 4).alias("acctbal"), "status"
    )


MERGE_UPSERT_SQL = f"""
WITH updates AS (
  SELECT c_custkey, c_acctbal + 10 AS c_acctbal FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal FROM customer WHERE c_custkey % 37 = 2
)
SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
       {sql_round('coalesce(u.c_acctbal, c.c_acctbal)')} AS acctbal,
       CASE WHEN u.c_custkey IS NOT NULL THEN 'active' ELSE 'inactive' END AS status
FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.c_custkey
"""

# ----------------------------------------------------------- SCD2 latest (T2)


def scd2_latest_event(spark: SparkSession, sf: str) -> DataFrame:
    """Current state from an append-only history (T2 — tables_scd.py:45-53):
    newest version row per entity."""
    ev = load(spark, sf, "events")
    return latest_snapshot(ev, ["user_id"], observed_at="ts", tiebreak="event_id").select(
        "user_id", "event_id", "event_type", dround(F.col("value"), 4).alias("value")
    )


SCD2_SQL = f"""
SELECT user_id, event_id, event_type, {sql_round('value')} AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
"""

# ------------------------------------------------- SCD2 time-travel (T2, r16)

_AS_OF_TS = "2024-01-10 00:00:00"


def scd_as_of_event(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 time-travel (r16, r15 verdict task 8): each user's version
    row ACTIVE at the as-of instant — the newest event with
    ts <= '2024-01-10' (mid-history, so some users' current version
    differs from their as-of version and late-born users drop out).
    One filter + one window over the append-only history, no join;
    the ts predicate is pushdown-eligible, so a date-partitioned
    100 TB history prunes before the window shuffles
    (operators/windows.py as_of_snapshot)."""
    from ..operators.windows import as_of_snapshot

    ev = load(spark, sf, "events")
    return as_of_snapshot(
        ev, ["user_id"], F.lit(_AS_OF_TS).cast("timestamp"),
        observed_at="ts", tiebreak="event_id",
    ).select("user_id", "event_id", "event_type",
             dround(F.col("value"), 4).alias("value"))


SCD_AS_OF_SQL = f"""
SELECT user_id, event_id, event_type, {sql_round('value')} AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '{_AS_OF_TS}')
WHERE rn = 1
"""

# ------------------------------------------------- sessions & running windows


def session_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (streaming session-window batch analog):
    30-minute inactivity gap, per-user session and event counts.

    Counts-only shape: aggregates the gap-break FLAGS directly
    (max(cumsum(flags)) == sum(flags)), so the plan is one lag-window
    pass + one hash aggregate — the running-sum window pass that the
    generic ``sessionize`` needs for per-row session_ids is skipped
    (same work the DuckDB oracle does; r7 64x A/B: 0.223 s vs 0.245 s
    and one fewer WindowExec over ~48M rows)."""
    ev = load(spark, sf, "events")
    flagged = session_flags(ev, "user_id", "ts", gap_seconds=1800,
                            tiebreak="event_id")
    return flagged.groupBy("user_id").agg(
        F.sum("_is_new").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


SESSION_SQL = """
WITH flags AS (
  SELECT user_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flags GROUP BY user_id
"""


def running_user_value(spark: SparkSession, sf: str) -> DataFrame:
    """Running total per user (frame-spec window; decimal-accumulated so
    the cumulative sum is order-exact in both engines)."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast("decimal(28,6)")).over(w)
    return ev.select("user_id", "event_id", dround(running, 4).alias("running_value"))


RUNNING_SQL = f"""
SELECT user_id, event_id,
  {sql_round("SUM(CAST(value AS DECIMAL(28,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_value
FROM events
"""


def tumbling_daily_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-day event-time window (Structured Streaming's windowed
    agg pattern run in batch; F.window == date_trunc for aligned tumble)."""
    ev = load(spark, sf, "events")
    win = F.window(F.col("ts"), "1 day")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum(F.col("value").cast("decimal(28,6)")), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value")
    )


TUMBLING_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS wstart, event_type, COUNT(*) AS n_events,
  {sql_round("SUM(CAST(value AS DECIMAL(28,6)))")} AS sum_value
FROM events GROUP BY 1, 2
"""


def sync_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A15 — stats-of-sync summary (cli.py:540-552): count of new /
    update / deleted actions from the same hash-diff classification.
    Reuses the diff's plan; the rollup is one tiny partial-aggregated
    count on top."""
    return (
        hash_diff_sync(spark, sf)
        .groupBy("action")
        .agg(F.count("*").alias("n"))
    )


SYNC_STATS_SQL = f"""
WITH diff AS ({HASH_DIFF_SQL})
SELECT action, count(*) AS n FROM diff GROUP BY action
"""




# --------------------------------------------------------- as-of join (T4+)

def asof_latest_event_value(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each order picks the user's LATEST event value at or
    before the order date (operators/windows.as_of_join — tagged-union +
    one window pass, single shuffle; DuckDB's native ASOF JOIN is the
    oracle). Users map onto customers via ``o_custkey % 150``; events
    pre-aggregate with max_by so equal-timestamp ties are deterministic.
    """
    from ..operators.windows import as_of_join

    ev = (
        load(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        "o_orderdate",
    )
    joined = as_of_join(orders, ev, ["user_id"], "o_orderdate", "ts",
                        ["value"])
    return joined.select(
        "o_orderkey", "user_id",
        dround(F.col("asof_value"), 6).alias("asof_value"),
        F.col("asof_ts").alias("asof_ts"),
    )


ASOF_SQL = f"""
WITH ev AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE value IS NOT NULL GROUP BY user_id, ts
),
o AS (
  SELECT o_orderkey, o_custkey % 150 AS user_id, o_orderdate FROM orders
)
SELECT o.o_orderkey, o.user_id,
       {sql_round("ev.value", 6)} AS asof_value,
       ev.ts AS asof_ts
FROM o ASOF LEFT JOIN ev
  ON o.user_id = ev.user_id AND ev.ts <= o.o_orderdate
"""




def range_join_event_window(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: for each PURCHASE event, count + sum of the same
    user's event values in the 24h window ending at the purchase
    (operators/windows.range_join_buckets — day-bucket equi-join +
    residual range filter, never an inequality join; DuckDB's native
    range join is the oracle)."""
    from ..operators.windows import range_join_buckets
    from ..functions.scalars import decimal_sum

    ev = (load(spark, sf, "events")
          .filter(F.col("value").isNotNull())
          .select("user_id", "ts", "value"))
    purchases = (load(spark, sf, "events")
                 .filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id",
                         F.col("ts").alias("p_ts")))
    j = range_join_buckets(purchases, ev, ["user_id"], "p_ts", "ts",
                           window_days=1)
    return (
        j.groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_events"),
             dround(decimal_sum(F.col("value")).cast("double"), 4)
             .alias("window_value"))
    )


RANGE_JOIN_SQL = f"""
SELECT p.event_id, p.user_id,
       COUNT(*) AS n_events,
       {sql_round("CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)", 4)} AS window_value
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts BETWEEN p.ts - INTERVAL 1 DAY AND p.ts
WHERE p.event_type = 'purchase' AND e.value IS NOT NULL
GROUP BY p.event_id, p.user_id
"""


def spot_price_asof(spark: SparkSession, sf: str) -> DataFrame:
    """T4: spot-price feed with source-reported ``observed_at`` override
    (_aws.py:1102-1104 — the row's timestamp is the API's reported
    Timestamp, NOT the fetch time) + keep-last per (server, zone) PK.

    The events table plays the spot feed: server = user_id % 50, zone =
    event_type, reported timestamp = ts. The winner per (server, zone)
    is the row with the LATEST reported timestamp (event_id tiebreak for
    a total order) — computed as a max_by aggregate (map-side partial
    combine; the 100 TB-safe formulation of keep-last, no window sort).
    """
    from ..operators.windows import argmax_per_group

    feed = (
        load(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 50).alias("server_id"),
            F.col("event_type").alias("zone_id"),
            F.col("value").alias("spot_price"),
            F.col("ts").alias("observed_at"),
            "event_id",
        )
    )
    best = argmax_per_group(
        feed, ["server_id", "zone_id"],
        [F.col("observed_at"), F.col("event_id")],
        ["spot_price", "observed_at"],
    )
    return best.select(
        "server_id", "zone_id",
        dround(F.col("spot_price"), 6).alias("spot_price"),
        "observed_at",
    )


SPOT_ASOF_SQL = f"""
WITH feed AS (
  SELECT user_id % 50 AS server_id, event_type AS zone_id,
         value AS spot_price, ts AS observed_at, event_id
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY server_id, zone_id
    ORDER BY observed_at DESC, event_id DESC) AS rn
  FROM feed
)
SELECT server_id, zone_id, {sql_round('spot_price', 6)} AS spot_price,
       observed_at
FROM r WHERE rn = 1
"""


def approx_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based scale twin of an exact per-type COUNT(DISTINCT
    user_id): ``approx_count_distinct`` (HyperLogLog++, fixed-size
    mergeable registers) instead of the exact form whose aggregation
    state is a per-group hash set of every id. At 100 TB
    exact-distinct's state is unbounded and its partial aggregation
    ships entire id sets through the shuffle; the HLL sketch is O(1)
    per group (2^p registers at rsd=0.5%) and merges
    register-wise. The PRODUCTION query is the sketch-only groupBy.

    TOLERANCE ORACLE (r9 verdict task 5): DuckDB's
    approx_count_distinct is its own HLL variant with different
    register hashing, so the sketch VALUE can't hash-match. Instead
    this emits the exact distinct count plus ``within_bound`` = (HLL
    relative error vs that exact count <= 2%); the oracle emits the
    same exact count with a literal TRUE. A hash match verifies group
    keys, event counts, exact distincts across engines AND that the
    sketch stayed inside tolerance — a drifting sketch flips the flag
    and reds the row. The exact arm exists only for this verification
    harness (it's the sf-scale twin, not the 100 TB path)."""
    ev = load(spark, sf, "events")
    exact = F.count_distinct(F.col("user_id"))
    approx = F.approx_count_distinct("user_id", rsd=0.005)
    return ev.groupBy("event_type").agg(
        exact.alias("n_users_exact"),
        (F.abs(approx - exact) <= exact * F.lit(0.02))
        .alias("within_bound"),
        F.count("*").alias("n_events"),
    )


APPROX_DISTINCT_SQL = """
SELECT event_type,
  COUNT(DISTINCT user_id) AS n_users_exact,
  TRUE AS within_bound,
  COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel analysis: view -> click -> purchase, each stage
    timestamp strictly AFTER the previous stage's — the sequential-
    pattern shape (a user who purchased before ever clicking does not
    count as a stage-3 conversion).

    The dependent stage minimums (t_click = first click after t_view)
    chain through three unordered same-partition windows over user_id
    — ONE shuffle total, no sort (min-over-partition needs none), no
    self-joins (the naive form is a 3-way self-join on user_id).
    A per-user distinct then collapses to one row per user and a single
    partial-aggregated global count finishes — at 100 TB the only data
    movement is the one user_id exchange."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("tv", tv)
    tc = F.min(F.when((F.col("event_type") == "click")
                      & (F.col("ts") > F.col("tv")), F.col("ts"))).over(w)
    staged = staged.withColumn("tc", tc)
    tp = F.min(F.when((F.col("event_type") == "purchase")
                      & (F.col("ts") > F.col("tc")), F.col("ts"))).over(w)
    per_user = (staged.withColumn("tp", tp)
                .select("user_id", "tv", "tc", "tp").distinct())
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("tv").alias("n_viewed"),
        F.count("tc").alias("n_clicked"),
        F.count("tp").alias("n_purchased"),
        dround(F.count("tc") / F.count("tv"), 6).alias("view_to_click"),
        dround(F.count("tp") / F.count("tc"), 6).alias("click_to_purchase"),
    )


FUNNEL_SQL = f"""
WITH t1 AS (
  SELECT user_id, ts, event_type,
    MIN(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS tv
  FROM events),
t2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
      OVER (PARTITION BY user_id) AS tc
  FROM t1),
t3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
      OVER (PARTITION BY user_id) AS tp
  FROM t2),
u AS (SELECT DISTINCT user_id, tv, tc, tp FROM t3)
SELECT COUNT(*) AS n_users, COUNT(tv) AS n_viewed,
  COUNT(tc) AS n_clicked, COUNT(tp) AS n_purchased,
  {sql_round("COUNT(tc) / CAST(COUNT(tv) AS DOUBLE)", 6)} AS view_to_click,
  {sql_round("COUNT(tp) / CAST(COUNT(tc) AS DOUBLE)", 6)} AS click_to_purchase
FROM u
"""


def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-touch ISO week,
    counted distinct in each later week they were active — the
    retention-triangle shape.

    Single-pass plan: because date_trunc is monotone,
    ``cohort_week = date_trunc(week, min(ts)) = min(active week)`` —
    so the naive two-scans-plus-self-join (first-touch agg JOIN
    distinct active weeks) collapses to ONE scan and ONE user-keyed
    shuffle: ``collect_set`` of active weeks per user (map-side
    partials dedup before the exchange; state is bounded by the
    calendar, not the row count), cohort week as ``array_min``,
    explode, triangle rollup. 64x A/B (interleaved, best-of-3):
    join form 1.69 s -> window form 0.95 s -> this form 0.79 s.

    NULL-timestamp rows are excluded EXPLICITLY (filter + mirrored
    WHERE): collect_set silently drops NULL elements, so without the
    filter the Spark form and the DISTINCT-based oracle would diverge
    on an events dump with NULL ts — stating the exclusion keeps the
    mirrored pair equivalent on every input, not just the fixtures."""
    ev = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("wks"))
    return (
        per_user.select(F.array_min("wks").alias("cohort_week"),
                        F.explode("wks").alias("wk"))
        .groupBy("cohort_week",
                 (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
                 .cast("int").alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )


COHORT_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
  WHERE ts IS NOT NULL),
c AS (SELECT user_id, wk,
        MIN(wk) OVER (PARTITION BY user_id) AS cohort_week FROM active)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
  CAST(date_diff('day', cohort_week, wk) / 7 AS INT) AS week_offset,
  COUNT(*) AS n_active
FROM c GROUP BY 1, 2
"""


def twap_user_value(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    is weighted by how long it HELD — the whole-second gap to the
    user's next event (the open-ended last event carries no weight).
    The mean-of-samples lies when sampling is bursty; TWAP is the
    timeseries-correct aggregate.

    One user_id shuffle: a lead() window (ordered by ts with the
    event_id tiebreak) and the per-user aggregate reuse the same
    partitioning; weighted sums are DECIMAL-routed. Gaps are
    whole-second (floor-epoch difference) in BOTH engines —
    unix_timestamp here, date_diff('second') in the oracle — so the
    weights are exact integers."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_timestamp(F.lead("ts").over(w))
           - F.unix_timestamp(F.col("ts")))
    weighted = ev.withColumn("dur_s", dur).filter(F.col("dur_s").isNotNull())
    return weighted.groupBy("user_id").agg(
        dround(F.sum((F.col("value") * F.col("dur_s")).cast("decimal(28,6)"))
               .cast("double")
               / F.sum(F.col("dur_s")).cast("double"), 6).alias("twap"),
        F.sum("dur_s").alias("observed_s"),
    )


TWAP_SQL = f"""
WITH d AS (
  SELECT user_id, value,
    date_diff('second', ts,
              lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) AS dur_s
  FROM events)
SELECT user_id,
  {sql_round("CAST(SUM(CAST(value * dur_s AS DECIMAL(28,6))) AS DOUBLE) / CAST(SUM(dur_s) AS DOUBLE)", 6)} AS twap,
  CAST(SUM(dur_s) AS BIGINT) AS observed_s
FROM d WHERE dur_s IS NOT NULL
GROUP BY user_id
"""


def gap_fill_daily_value(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar resampling with forward fill: one row per (user, day)
    over each user's observed span — days with no events carry the
    last observed day-close value (deterministic: the day's close is
    the row_number-1 event by (ts, event_id) DESC).

    Plan — the scalable gap-fill idiom, NOT grid-then-join: the naive
    form builds a calendar grid, left-joins the observations back and
    forward-fills with last(ignorenulls) — two scans of events plus a
    join. Instead each day-close row explodes across ITS OWN gap
    (``sequence(day, next_day - 1)`` via a lead window), carrying its
    value — the fill is the explode. ONE scan, ONE user-keyed shuffle
    (the (user,day) rollup's WindowGroupLimit and the lead window
    share it), zero joins."""
    ev = load(spark, sf, "events")
    daily_w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .withColumn("rn", F.row_number().over(daily_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("close_value"))
    )
    lead_w = Window.partitionBy("user_id").orderBy("day")
    return (
        daily.withColumn("next_day", F.lead("day").over(lead_w))
        .select(
            "user_id", "close_value", F.col("day").alias("obs_day"),
            F.explode(F.sequence(
                "day",
                F.coalesce(F.date_sub("next_day", 1), F.col("day"))))
            .alias("day"))
        .select(
            "user_id",
            # TIMESTAMP out, not DATE: Spark dates surface as pandas
            # objects while DuckDB DATEs become datetime64 — the
            # cross-engine dtype convention is midnight timestamps
            # (same as cohort_retention)
            F.col("day").cast("timestamp").alias("day"),
            F.col("close_value").alias("filled_value"),
            (F.col("day") == F.col("obs_day")).alias("is_observed"))
    )


GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, day, value AS close_value FROM (
    SELECT user_id, CAST(ts AS DATE) AS day, value,
      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
spans AS (
  SELECT user_id, close_value, day AS obs_day,
    coalesce(lead(day) OVER (PARTITION BY user_id ORDER BY day)
             - INTERVAL 1 DAY, CAST(day AS TIMESTAMP)) AS gap_end
  FROM daily)
SELECT user_id,
  unnest(generate_series(CAST(obs_day AS TIMESTAMP), gap_end,
                         INTERVAL 1 DAY)) AS day,
  close_value AS filled_value,
  unnest(generate_series(CAST(obs_day AS TIMESTAMP), gap_end,
                         INTERVAL 1 DAY)) = CAST(obs_day AS TIMESTAMP)
    AS is_observed
FROM spans
"""


def gap_fill_interp_value(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-interpolation twin of :func:`gap_fill_daily_value` (r8,
    verdict item 8): gap days take the value interpolated between the
    surrounding day-closes, weighted by day offset —
    ``close + (next_close - close) * offset / gap_days`` — instead of
    carrying the last close flat. Same explode-across-its-own-gap plan
    (ONE scan, ONE user-keyed shuffle, zero joins; the lead window just
    ships one more column); the trailing observation has no right
    anchor, so it emits only its own day at its own value, exactly like
    the forward-fill twin. Both engines evaluate the identical
    double-expression order, rounded to 6."""
    ev = load(spark, sf, "events")
    daily_w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .withColumn("rn", F.row_number().over(daily_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("close_value"))
    )
    lead_w = Window.partitionBy("user_id").orderBy("day")
    interp = F.when(
        F.col("next_close").isNull(), F.col("close_value")
    ).otherwise(
        F.col("close_value")
        + (F.col("next_close") - F.col("close_value"))
        * F.datediff(F.col("day"), F.col("obs_day"))
        / F.datediff(F.col("next_day"), F.col("obs_day"))
    )
    return (
        daily.withColumn("next_day", F.lead("day").over(lead_w))
        .withColumn("next_close", F.lead("close_value").over(lead_w))
        .select(
            "user_id", "close_value", "next_close", "next_day",
            F.col("day").alias("obs_day"),
            F.explode(F.sequence(
                "day",
                F.coalesce(F.date_sub("next_day", 1), F.col("day"))))
            .alias("day"))
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            dround(interp, 6).alias("interp_value"),
            (F.col("day") == F.col("obs_day")).alias("is_observed"))
    )


GAP_FILL_INTERP_SQL = f"""
WITH daily AS (
  SELECT user_id, day, value AS close_value FROM (
    SELECT user_id, CAST(ts AS DATE) AS day, value,
      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
spans AS (
  SELECT user_id, close_value, day AS obs_day,
    lead(day) OVER w AS next_day,
    lead(close_value) OVER w AS next_close
  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)),
expanded AS (
  SELECT user_id, close_value, next_close, obs_day, next_day,
    unnest(generate_series(
      CAST(obs_day AS TIMESTAMP),
      coalesce(CAST(next_day AS TIMESTAMP) - INTERVAL 1 DAY,
               CAST(obs_day AS TIMESTAMP)),
      INTERVAL 1 DAY)) AS day
  FROM spans)
SELECT user_id, day,
  {sql_round(
      "CASE WHEN next_close IS NULL THEN close_value "
      "ELSE close_value + (next_close - close_value) "
      "* datediff('day', obs_day, CAST(day AS DATE)) "
      "/ datediff('day', obs_day, next_day) END", 6)} AS interp_value,
  day = CAST(obs_day AS TIMESTAMP) AS is_observed
FROM expanded
"""


def event_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily anomaly detection: days whose total event value
    sits >= 2 sample standard deviations from that user's daily mean —
    the two-moment aggregation shape (sum + sum-of-squares in one
    pass, never a second scan for the mean).

    Cross-engine determinism: variance derives from DECIMAL-routed
    Σx and Σx² — ``var = (Σx² - (Σx)²/n) / (n-1)`` — so mean/std are
    computed from identical digits in both engines rather than relying
    on each engine's streaming ``stddev`` implementation (whose
    accumulation order differs). Degenerate users are excluded on the
    PRE-sqrt variance (``n >= 2 AND var > 0``) — the guard must run
    before the sqrt, not on its result: fp cancellation (or the
    DECIMAL quantization of a tiny dsum²) can drive the computed var
    a hair NEGATIVE, where DuckDB's sqrt hard-errors and Spark emits
    NaN that PASSES a ``std > 0`` filter (NaN compares greater in
    both engines). Two shuffles: (user, day) rollup, then the
    user-level moments as an unordered window on one exchange."""
    ev = load(spark, sf, "events")
    daily = (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("user_id", "day")
        .agg(F.sum(F.col("value").cast("decimal(28,6)")).alias("dsum"))
        .select("user_id", "day", F.col("dsum").cast("double").alias("dsum"))
    )
    w = Window.partitionBy("user_id")
    n = F.count("*").over(w)
    sx = F.sum(F.col("dsum").cast("decimal(28,6)")).over(w).cast("double")
    sx2 = F.sum((F.col("dsum") * F.col("dsum"))
                .cast("decimal(28,6)")).over(w).cast("double")
    mean = sx / n
    var = (sx2 - sx * sx / n) / (n - 1)
    z = (F.col("dsum") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        daily.withColumn("n_days", n).withColumn("mean", mean)
        .withColumn("var", var)
        .filter((F.col("n_days") >= 2) & (F.col("var") > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2)
        .select("user_id", "day", dround(F.col("dsum"), 4).alias("daily_sum"),
                dround(F.col("z"), 6).alias("zscore"))
    )


ANOMALY_SQL = f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS dsum
  FROM events GROUP BY 1, 2),
m AS (
  SELECT user_id, day, dsum,
    COUNT(*) OVER w AS n,
    CAST(SUM(CAST(dsum AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sx,
    CAST(SUM(CAST(dsum * dsum AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sx2
  FROM daily WINDOW w AS (PARTITION BY user_id)),
v AS (
  SELECT user_id, day, dsum, n, sx,
    (sx2 - sx * sx / n) / (n - 1) AS var
  FROM m),
sc AS (
  SELECT user_id, day, dsum,
    (dsum - sx / n) / sqrt(var) AS z
  FROM v WHERE n >= 2 AND var > 0)
SELECT user_id, CAST(day AS TIMESTAMP) AS day,
  {sql_round("dsum")} AS daily_sum, {sql_round("z", 6)} AS zscore
FROM sc WHERE abs(z) >= 2
"""


QUERIES = {
    "spot_price_asof": (spot_price_asof, SPOT_ASOF_SQL),
    "event_anomaly_zscore": (event_anomaly_zscore, ANOMALY_SQL),
    "twap_user_value": (twap_user_value, TWAP_SQL),
    "gap_fill_daily_value": (gap_fill_daily_value, GAP_FILL_SQL),
    "gap_fill_interp_value": (gap_fill_interp_value, GAP_FILL_INTERP_SQL),
    "funnel_conversion": (funnel_conversion, FUNNEL_SQL),
    "approx_distinct_users": (approx_distinct_users, APPROX_DISTINCT_SQL),
    "cohort_retention": (cohort_retention, COHORT_SQL),
    "hash_diff_sync": (hash_diff_sync, HASH_DIFF_SQL),
    "sync_stats": (sync_stats, SYNC_STATS_SQL),
    "merge_upsert_lifecycle": (merge_upsert_lifecycle, MERGE_UPSERT_SQL),
    "scd2_latest_event": (scd2_latest_event, SCD2_SQL),
    "scd_as_of_event": (scd_as_of_event, SCD_AS_OF_SQL),
    "session_counts": (session_counts, SESSION_SQL),
    "running_user_value": (running_user_value, RUNNING_SQL),
    "tumbling_daily_stats": (tumbling_daily_stats, TUMBLING_SQL),
    "asof_latest_event_value": (asof_latest_event_value, ASOF_SQL),
    "range_join_event_window": (range_join_event_window, RANGE_JOIN_SQL),
}
