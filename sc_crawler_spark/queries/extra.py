"""Additional operator coverage: grouping sets, exact distinct counts,
multi-quantiles, scalar-subquery joins, global top-k, set ops, and the
reference's P6 float-tolerance config filter / P9 text standardizers.

The reference has no rollup/cube (SURVEY.md §2.5 note) — Catalyst gives
them for free, so they're exposed as engine capabilities beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import decimal_sum, dround, sql_round
from ..tables import load

# ------------------------------------------------------------ grouping sets


def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total rows
    (partial aggregation reused across grouping sets by Catalyst)."""
    li = load(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dround(decimal_sum(disc), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue,
  COUNT(*) AS n_items
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with GROUPING() flags: all four
    grouping sets from one pass (Expand + single shuffle); the grouping
    markers disambiguate real NULLs from subtotal rows — the convention
    every BI layer expects."""
    li = load(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.cube("l_returnflag", "l_linestatus").agg(
        dround(decimal_sum(disc), 4).alias("revenue"),
        F.count("*").alias("n_items"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue,
  COUNT(*) AS n_items,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): the hierarchical subset of
    CUBE — detail, per-flag subtotal, grand total — from one Expand
    pass; GROUPING() flags mark subtotal rows."""
    li = load(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dround(decimal_sum(disc), 4).alias("revenue"),
        F.count("*").alias("n_items"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue,
  COUNT(*) AS n_items,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def pivot_status_counts(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: order counts per priority x status, statuses as columns.
    The value list is EXPLICIT ('O','F','P') — with it Spark pivots in
    one pass without the extra distinct-values job, and the output
    schema is stable for the oracle."""
    orders = load(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


PIVOT_SQL = """
SELECT o_orderpriority,
  COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS n_open,
  COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS n_filled,
  COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS n_partial
FROM orders GROUP BY o_orderpriority
"""


def moving_range_avg(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame window: per-user mean event value over the TRAILING
    24 HOURS of event time (rangeBetween on epoch MICROSECONDS — a
    value-based frame, not a row count; late/dense bursts weight
    correctly). Microseconds, not unix_timestamp: second truncation
    would admit pairs up to 86400.999s apart and merge same-second
    events into one RANGE peer group, diverging from the oracle's
    fractional epoch. Decimal-accumulated for parity."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        # NTZ-tolerant: some lake files carry TIMESTAMP_NTZ; the cast
        # interprets it in the UTC session zone, matching the oracle's
        # naive-UTC convention
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-86400 * 10**6, 0)
    )
    return ev.select(
        "event_id", "user_id",
        dround(
            F.sum(F.col("value").cast("decimal(28,6)")).over(w)
            .cast("double") / F.count("*").over(w), 4)
        .alias("avg_24h"),
    )


MOVING_RANGE_SQL = f"""
SELECT event_id, user_id,
  {sql_round(
      "CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)"
      " / COUNT(*) OVER w", 4)} AS avg_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {86400 * 10**6} PRECEDING AND CURRENT ROW)
"""


def distinct_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (expand+two-phase agg in Spark)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_items"),
    )


DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers, COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


def price_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact p25/p50/p75 per group (A2 family; interpolating quantiles)."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        dround(F.percentile(F.col("o_totalprice"), F.lit(0.25)), 4).alias("p25"),
        dround(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("p50"),
        dround(F.percentile(F.col("o_totalprice"), F.lit(0.75)), 4).alias("p75"),
    )


QUARTILES_SQL = f"""
SELECT o_orderstatus,
  {sql_round("quantile_cont(o_totalprice, 0.25)")} AS p25,
  {sql_round("quantile_cont(o_totalprice, 0.50)")} AS p50,
  {sql_round("quantile_cont(o_totalprice, 0.75)")} AS p75
FROM orders GROUP BY o_orderstatus
"""

# ------------------------------------------------- scalar-subquery pattern


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 20% of their part's
    average quantity — per-part scalar aggregate joined back to the fact."""
    li = load(spark, sf, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (decimal_sum(F.col("l_quantity")).cast("double") / F.count("*"))
        .alias("avg_qty")
    )
    j = li.join(avg_qty, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return j.agg(
        dround(decimal_sum(F.col("l_extendedprice")).cast("double") / 7.0, 4)
        .alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


Q17_SQL = f"""
WITH pa AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  {sql_round("CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)/7.0")} AS avg_yearly,
  COUNT(*) AS n_items
FROM lineitem JOIN pa USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
"""


def heavy_hitter_users(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-5 by aggregate (sort-limit after agg; Spark uses
    TakeOrderedAndProject — no full sort)."""
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(dround(decimal_sum(F.col("value")), 4).alias("total_value"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(5)
    )


HEAVY_SQL = f"""
SELECT user_id,
  {sql_round("SUM(CAST(value AS DECIMAL(28,6)))")} AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 5
"""

def approx_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based scale twin of heavy_hitter_users: a REAL Count-Min
    sketch built in-plan — every event hashes into ``_CMS_D`` rows of
    ``_CMS_W`` counters (one explode + one groupBy; the 4096-cell
    table is a commutative monoid, so it partial-aggregates map-side
    and MERGES across batches/streams — the mergeability HLL/GK
    sketches in this suite already rely on), and a user's estimated
    count is the MIN over its d probed cells. At 100 TB the exact
    per-user top-k needs a full user-keyed shuffle; the sketch ships
    4096 longs and answers point queries from a broadcast.

    TOLERANCE ORACLE (the approx_distinct_users doctrine): DuckDB has
    no CMS, so the oracle emits the exact arm + literal TRUE while the
    Spark side emits the exact arm + ``within_bound`` = (estimate >=
    exact AND estimate <= N). Both halves are DETERMINISTIC invariants
    of a correct sketch — CMS never underestimates (every probed cell
    counts at least the key's own inserts) and no cell can exceed the
    total insert count — so a red here is always a broken sketch,
    never sketch bad luck. The r13 advice flagged the previous
    ``estimate - exact <= d*N/w`` arm: that epsilon bound is only
    PROBABILISTIC (Markov tail ~(1/4)^d per key), so a healthy sketch
    could flip the flag on adversarially skewed data and red the hash
    against the oracle's literal TRUE. The exact arm exists for the
    verification harness; the sketch is the production path. Geometry
    + probe/partial builders live in operators/sketch.py, shared with
    the streaming fold (streaming_cms_sketch)."""
    from ..operators.sketch import cms_partial, cms_probes

    ev = load(spark, sf, "events").select("user_id")
    probes = cms_probes(F.col("user_id"))
    sketch = cms_partial(ev, "user_id")
    n_total = ev.agg(F.count("*").alias("n_total"))
    top = (ev.groupBy("user_id")
           .agg(F.count("*").alias("n_events_exact"))
           .orderBy(F.col("n_events_exact").desc(), "user_id")
           .limit(5))
    est = (top.select("user_id", "n_events_exact",
                      F.explode(probes).alias("p"))
           .join(F.broadcast(sketch),
                 (F.col("p.row") == F.col("row"))
                 & (F.col("p.cell") == F.col("cell")))
           .groupBy("user_id", "n_events_exact")
           .agg(F.min("cnt").alias("cms_est")))
    return (est.crossJoin(F.broadcast(n_total))
            .select("user_id", "n_events_exact",
                    ((F.col("cms_est") >= F.col("n_events_exact"))
                     & (F.col("cms_est") <= F.col("n_total")))
                    .alias("within_bound"))
            .orderBy(F.col("n_events_exact").desc(), "user_id"))


APPROX_HEAVY_SQL = """
SELECT user_id, COUNT(*) AS n_events_exact, TRUE AS within_bound
FROM events GROUP BY user_id
ORDER BY n_events_exact DESC, user_id LIMIT 5
"""

# ------------------------------------------------------------------ set ops


def except_building_buyers(spark: SparkSession, sf: str) -> DataFrame:
    """E2 set difference via EXCEPT (distinct): buyers who are not in the
    BUILDING segment."""
    orders = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    building = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("custkey"))
    return orders.subtract(building)


EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style stats pass over ``orders`` (operators/profile.py):
    one scan, per-column null/exact-distinct counts, numeric min/max."""
    from ..operators.profile import profile_table

    return profile_table(load(spark, sf, "orders"))


def _profile_orders_sql() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    parts = []
    for c in cols:
        mn = (sql_round(f"CAST(MIN({c}) AS DOUBLE)", 4) if c in numeric
              else "CAST(NULL AS DOUBLE)")
        mx = (sql_round(f"CAST(MAX({c}) AS DOUBLE)", 4) if c in numeric
              else "CAST(NULL AS DOUBLE)")
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, {mn} AS min_num, "
            f"{mx} AS max_num FROM orders")
    return "\nUNION ALL\n".join(parts)


def intersect_repeat_buyers(spark: SparkSession, sf: str) -> DataFrame:
    """E3 sibling via INTERSECT (distinct set semantics): customers who
    ordered in BOTH 1996 and 1997 — compiles to a left-semi join over
    deduped sides, never a full materialized distinct union."""
    orders = load(spark, sf, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey"))
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""

# ------------------------------------------- P6 float-tolerance filter, P9


def config_tolerance_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P6 — `_config_matches` float tolerance (workload_profile_scores.py:
    79-98): keep rows whose value is within eps of a config constant
    (here: near-integral values), then best-per-subject (A1)."""
    ev = load(spark, sf, "events")
    eps = 0.05
    near = ev.filter(
        F.abs(F.col("value") - F.round(F.col("value"), 0)) < eps
    )
    return near.groupBy("user_id").agg(
        dround(F.max("value"), 4).alias("best_near_integral"),
        F.count("*").alias("n_matching"),
    )


TOLERANCE_SQL = f"""
SELECT user_id,
  {sql_round("MAX(value)")} AS best_near_integral,
  COUNT(*) AS n_matching
FROM events
WHERE abs(value - round(value, 0)) < 0.05
GROUP BY user_id
"""


def standardize_part_names(spark: SparkSession, sf: str) -> DataFrame:
    """P9 — text standardizer chains (inspector.py:760-1012): prefix strip
    + regex cleanup + case fold, as a pure projection."""
    part = load(spark, sf, "part")
    cleaned = F.upper(
        F.regexp_replace(
            F.regexp_replace(F.col("p_name"), r"^(small|large|cold|blue) ", ""),
            r"[aeiou]", "",
        )
    )
    return part.select(
        "p_partkey",
        cleaned.alias("standardized_name"),
        F.length(cleaned).alias("std_len"),
    )


STANDARDIZE_SQL = """
SELECT p_partkey,
  upper(regexp_replace(regexp_replace(p_name, '^(small|large|cold|blue) ', ''),
        '[aeiou]', '', 'g')) AS standardized_name,
  length(upper(regexp_replace(regexp_replace(p_name, '^(small|large|cold|blue) ', ''),
        '[aeiou]', '', 'g'))) AS std_len
FROM part
"""


def ecpus_scalability(spark: SparkSession, sf: str) -> DataFrame:
    """A12/A13 — benchmark-curve derivations (reference inspector.py:562-574,
    1329-1376): best1 = score of the first sample, bestn = max score,
    ecpus = bestn/best1, scalability = ecpus/n_samples*100. Mapped onto
    ``events`` (each user's stream is the curve, event_id the sample order).

    Scale note: one groupBy shuffle only — ``min_by`` replaces the
    row_number-window + filter formulation (which would add a per-group
    sort over the full fact table).
    """
    ev = load(spark, sf, "events")
    agg = ev.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("best1"),
        F.max("value").alias("bestn"),
        F.count("*").alias("n_samples"),
    )
    ecpus = F.col("bestn") / F.col("best1")
    return agg.select(
        "user_id", "best1", "bestn",
        dround(ecpus, 4).alias("ecpus"),
        dround(ecpus / F.col("n_samples") * 100, 4).alias("scalability"),
    )


def sku_prefix_join(spark: SparkSession, sf: str) -> DataFrame:
    """J7 — computed-key equi-join via prefix strip (reference
    _aws.py:1563-1570: ``db.m5.large`` -> ``m5.large``). Analog on the
    lake: customer and supplier rows share the numeric suffix of their
    ``<Kind>#NNN`` names; join on the stripped key. The supplier side
    is a plain projection of its scan, so stats-v1's file-size estimate
    is accurate and the static planner broadcasts it while it fits —
    no hard hint (supplier SCALES with sf; the r8 scaling-dim
    discipline: a forced hint dies at the broadcast ceiling instead of
    degrading to shuffle).
    """
    cust = load(spark, sf, "customer").select(
        "c_custkey",
        F.regexp_replace("c_name", r"^Customer#", "").alias("entity_num"),
    )
    supp = load(spark, sf, "supplier").select(
        "s_suppkey", "s_acctbal",
        F.regexp_replace("s_name", r"^Supplier#", "").alias("entity_num"),
    )
    return (
        cust.join(supp, "entity_num")
        .select("entity_num", "c_custkey", "s_suppkey",
                dround(F.col("s_acctbal"), 2).alias("s_acctbal"))
    )


SKU_PREFIX_SQL = f"""
SELECT regexp_replace(c_name, '^Customer#', '') AS entity_num,
       c_custkey, s_suppkey,
       {sql_round("s_acctbal", 2)} AS s_acctbal
FROM customer
JOIN supplier ON regexp_replace(c_name, '^Customer#', '')
               = regexp_replace(s_name, '^Supplier#', '')
"""


def first_version_orders(spark: SparkSession, sf: str) -> DataFrame:
    """W3 — first-row-per-version filter (reference _aws.py:1368-1375:
    keep RDS options matching the first EngineVersion). Analog: keep every
    order placed on each customer's earliest order date — dense_rank, not
    row_number, because ALL rows at the first version survive.
    """
    orders = load(spark, sf, "orders")
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (
        orders.withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate",
                dround(F.col("o_totalprice"), 2).alias("o_totalprice"))
    )


FIRST_VERSION_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       {sql_round("o_totalprice", 2)} AS o_totalprice
FROM (
  SELECT *, dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk
  FROM orders
) WHERE rk = 1
"""


ECPUS_SQL = f"""
SELECT user_id, best1, bestn,
  {sql_round("bestn/best1")} AS ecpus,
  {sql_round("bestn/best1/n_samples*100")} AS scalability
FROM (
  SELECT user_id, arg_min(value, event_id) AS best1,
         max(value) AS bestn, count(*) AS n_samples
  FROM events GROUP BY user_id
)
"""


def shuffled_sample_orders(spark: SparkSession, sf: str) -> DataFrame:
    """O5 — shuffled-order sampling under a budget (reference
    _alicloud.py:1125-1156: shuffle the list, fetch until time runs out).
    The engine form is a SEEDED HASH shuffle — order by md5(seed|key),
    take N — deterministic and identical across engines/re-runs, unlike
    ``rand()``. A global top-N by hash is a TakeOrderedAndProject: no
    full sort, each partition keeps N, driver merges."""
    orders = load(spark, sf, "orders")
    h = F.md5(F.concat(F.lit("seed42|"), F.col("o_orderkey").cast("string")))
    return (
        orders.withColumn("sample_key", h)
        .orderBy("sample_key")
        .limit(100)
        .select("sample_key", "o_orderkey",
                dround(F.col("o_totalprice"), 2).alias("o_totalprice"))
    )


SAMPLE_SQL = f"""
SELECT md5('seed42|' || CAST(o_orderkey AS VARCHAR)) AS sample_key,
       o_orderkey, {sql_round("o_totalprice", 2)} AS o_totalprice
FROM orders
ORDER BY sample_key LIMIT 100
"""


# -------------------------------------------------- tiered-price billing

# A PRICE_TIER_STRUCT-shaped schedule (schemas.py:53-55): upper bound is
# a STRING so the reference's float('inf') <-> "Infinity" JSON convention
# (F5) round-trips; the open last tier is the "Infinity" literal.
_BILLING_TIERS: list[tuple[float, str, float]] = [
    (0.0, "10.0", 1.0),
    (10.0, "40.0", 0.8),
    (40.0, "Infinity", 0.5),
]


def tiered_price_billing(spark: SparkSession, sf: str) -> DataFrame:
    """P3/F5 end-to-end: graduated (tiered) billing of lineitem
    quantities against a tier array — each tier charges its rate on the
    quantity overlapping [lower, upper), the open tier via
    CAST('Infinity' AS DOUBLE). This is the reference's traffic_price
    ``price_tiered`` consumption semantics (_aws.py:1268-1309 builds the
    tiers; table_fields.py:228-257 defines the struct).

    The fold runs INSIDE the row over the tier array (F.aggregate) —
    no explode, no extra shuffle; the only shuffle is the final groupBy.
    """
    li = load(spark, sf, "lineitem")
    tiers = F.array(*[
        F.struct(
            F.lit(lo).alias("lower"), F.lit(up).alias("upper"),
            F.lit(p).alias("price"),
        )
        for lo, up, p in _BILLING_TIERS
    ])
    qty = F.col("l_quantity")
    cost = F.aggregate(
        tiers,
        F.lit(0.0),
        lambda acc, t: acc + F.greatest(
            F.least(qty, t["upper"].cast("double")) - t["lower"], F.lit(0.0)
        ) * t["price"],
    )
    return (
        li.withColumn("_cost", cost)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dround(decimal_sum(F.col("_cost")), 4).alias("total_cost"),
            dround(F.max("_cost"), 4).alias("max_cost"),
        )
    )


def _tiered_billing_sql() -> str:
    # the same schedule folded in the same left-to-right order, so the
    # double accumulation is bit-identical to F.aggregate's fold
    terms = " + ".join(
        f"GREATEST(LEAST(l_quantity, CAST('{up}' AS DOUBLE)) - {lo}, 0.0) * {p}"
        for lo, up, p in _BILLING_TIERS
    )
    return f"""
WITH costed AS (SELECT l_returnflag, (0.0 + {terms}) AS _cost FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n_items,
  {sql_round("SUM(CAST(_cost AS DECIMAL(28,6)))")} AS total_cost,
  {sql_round("MAX(_cost)")} AS max_cost
FROM costed GROUP BY l_returnflag
"""


# ---------------------------------------------- config JSON as primary key


def benchmark_config_pk(spark: SparkSession, sf: str) -> DataFrame:
    """BenchmarkScore's JSON-as-PK semantics (reference
    table_bases.py:1250-1267): the benchmark ``config`` dict is carried
    as a CANONICAL sorted-key JSON string and participates in the
    primary key, so grouping/joining on it is exact string equality.

    Synthesizes score observations from lineitem (server = supplier
    bucket, benchmark = returnflag, config = {datasize, threads}),
    builds the config PK with ``to_json(struct(...))`` over name-sorted
    fields (functions/hashing.py:66-71 convention), then aggregates
    best-score per full PK — the reference's keep-best upsert unit.
    """
    li = load(spark, sf, "lineitem")
    config = F.to_json(F.struct(
        (F.col("l_quantity").cast("int") % 4 * 16).alias("datasize"),
        F.col("l_linenumber").alias("threads"),
    ))
    return (
        li.select(
            F.lit("aws").alias("vendor_id"),
            F.concat(F.lit("srv-"), (F.col("l_suppkey") % 50).cast("string"))
            .alias("server_id"),
            F.concat(F.lit("bench:"), F.col("l_returnflag"))
            .alias("benchmark_id"),
            config.alias("config"),
            (F.col("l_extendedprice") / 1000).alias("score"),
        )
        .groupBy("vendor_id", "server_id", "benchmark_id", "config")
        .agg(
            F.count("*").alias("n_obs"),
            dround(F.max("score"), 4).alias("best_score"),
        )
    )


CONFIG_PK_SQL = f"""
SELECT 'aws' AS vendor_id,
       'srv-' || CAST(l_suppkey % 50 AS VARCHAR) AS server_id,
       'bench:' || l_returnflag AS benchmark_id,
       '{{"datasize":' || CAST((CAST(l_quantity AS INT) % 4) * 16 AS VARCHAR)
           || ',"threads":' || CAST(l_linenumber AS VARCHAR) || '}}' AS config,
       COUNT(*) AS n_obs,
       {sql_round("MAX(l_extendedprice / 1000)")} AS best_score
FROM lineitem
GROUP BY 1, 2, 3, 4
"""


QUERIES = {
    "cube_revenue": (cube_revenue, CUBE_SQL),
    "rollup_revenue": (rollup_revenue, ROLLUP_SQL),
    "pivot_status_counts": (pivot_status_counts, PIVOT_SQL),
    "moving_range_avg": (moving_range_avg, MOVING_RANGE_SQL),
    "tiered_price_billing": (tiered_price_billing, _tiered_billing_sql()),
    "benchmark_config_pk": (benchmark_config_pk, CONFIG_PK_SQL),
    "ecpus_scalability": (ecpus_scalability, ECPUS_SQL),
    "shuffled_sample_orders": (shuffled_sample_orders, SAMPLE_SQL),
    "sku_prefix_join": (sku_prefix_join, SKU_PREFIX_SQL),
    "first_version_orders": (first_version_orders, FIRST_VERSION_SQL),
    "distinct_part_counts": (distinct_part_counts, DISTINCT_SQL),
    "price_quartiles": (price_quartiles, QUARTILES_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "heavy_hitter_users": (heavy_hitter_users, HEAVY_SQL),
    "approx_heavy_hitters": (approx_heavy_hitters, APPROX_HEAVY_SQL),
    "except_building_buyers": (except_building_buyers, EXCEPT_SQL),
    "intersect_repeat_buyers": (intersect_repeat_buyers, INTERSECT_SQL),
    "profile_orders": (profile_orders, _profile_orders_sql()),
    "config_tolerance_filter": (config_tolerance_filter, TOLERANCE_SQL),
    "standardize_part_names": (standardize_part_names, STANDARDIZE_SQL),
}
