"""Generic relational operator queries (SURVEY.md §2.3-2.9) over the
TPC-H-ish lake tables.

Each query exercises one operator class from the reference's inventory,
re-expressed as a declarative DataFrame plan (Catalyst handles pushdown,
pruning, join strategy; dims broadcast under AQE). SQL oracles mirror the
decimal-accumulation / decimal-rounding conventions (see queries/__init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import decimal_sum, dround, extract_last_number, sql_round
from ..operators.windows import argmax_per_group
from ..tables import gated_broadcast, load

# ---------------------------------------------------------------- q1: A-aggs


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped scan+filter+groupBy aggregate (A1/A10 analogs;
    filter pushes down to the parquet scan)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dround(decimal_sum(F.col("l_quantity")), 4).alias("sum_qty"),
        dround(decimal_sum(F.col("l_extendedprice")), 4).alias("sum_base_price"),
        dround(decimal_sum(disc_price), 4).alias("sum_disc_price"),
        dround(decimal_sum(charge), 4).alias("sum_charge"),
        dround(decimal_sum(F.col("l_quantity")).cast("double") / F.count("*"), 4).alias("avg_qty"),
        dround(decimal_sum(F.col("l_discount")).cast("double") / F.count("*"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {sql_round("SUM(CAST(l_quantity AS DECIMAL(28,6)))")} AS sum_qty,
  {sql_round("SUM(CAST(l_extendedprice AS DECIMAL(28,6)))")} AS sum_base_price,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS sum_disc_price,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,6)))")} AS sum_charge,
  {sql_round("CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*)")} AS avg_qty,
  {sql_round("CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*)")} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# -------------------------------------- correlated subqueries (SQL planner)


def q2_min_price_order(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2's operator shape on the lake tables: a correlated
    SCALAR subquery — each customer's cheapest order(s). Expressed in
    SQL on purpose: Spark's planner DECORRELATES the subquery into an
    aggregate + join (RewriteCorrelatedScalarSubquery), which is the
    scale-safe plan; the DataFrame API has no subquery surface."""
    load(spark, sf, "orders").createOrReplaceTempView("_t_orders")
    return spark.sql("""
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice AS min_price
        FROM _t_orders o
        WHERE o.o_totalprice = (
            SELECT MIN(o2.o_totalprice) FROM _t_orders o2
            WHERE o2.o_custkey = o.o_custkey)
    """)


Q2_SQL = """
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice AS min_price
FROM orders o
WHERE o.o_totalprice = (
    SELECT MIN(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey)
"""


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4's operator shape (correlated EXISTS -> left-semi join):
    orders in 1996H1 with at least one returned line item, counted per
    priority (l_commitdate/receiptdate are not in the lake; the
    returned-flag predicate keeps the EXISTS correlated + filtered)."""
    load(spark, sf, "orders").createOrReplaceTempView("_t_orders")
    load(spark, sf, "lineitem").createOrReplaceTempView("_t_lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM _t_orders o
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM _t_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """)


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# ------------------------------------------------------- q3: join+agg+limit


def q3_shipping_priority(spark: SparkSession, sf: str,
                         _tables: dict | None = None) -> DataFrame:
    """3-way equi-join + aggregate + deterministic top-10 (J2/J3 + O4).

    Star-join order: the BUILDING-segment customer dim reduces ORDERS
    FIRST (~1/5 survival), so the fact-fact join sees the smallest
    possible sides; lineitem is projected to 3 columns before it
    moves. No hard broadcast hint on customer — it SCALES with sf
    (tens of GB at the 100 TB target, where a forced broadcast dies at
    the ceiling instead of degrading to shuffle); AQE auto-broadcasts
    the 1-column projection at any scale where it fits (plan-guarded:
    tests/test_skew_and_plans.py
    test_r8_unhinted_scaling_dims_broadcast_from_stats)
    and falls back to a shuffle join beyond. AQE likewise broadcasts
    the reduced orders side when it fits."""
    t = _tables or {}  # bench's bucketed twin overrides the facts
    cust = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        t.get("orders", load(spark, sf, "orders"))
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = t.get("lineitem", load(spark, sf, "lineitem")).filter(
        F.col("l_shipdate") > "1998-01-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # (measured at 64x: pre-aggregating lineitem per orderkey before
    # the join LOSES — 2.8 s vs 1.8 s interleaved — the extra hash-agg
    # over the full fact costs more than the shuffle rows it saves)
    # r16: the REDUCED orders side is itself size-gated — at small SF
    # (sf0.1: orders 2.7 MB on disk) the whole dim-reduced orders
    # broadcasts and the fact-fact join costs lineitem ZERO exchanges
    # (measured: 0.73 s -> ~0.4 s warm at sf0.1); past the gate
    # (64x: 174 MB > threshold) the hint vanishes and the plan is
    # exactly the r15 shuffle/bucketed shape. Same gate discipline as
    # the customer/supplier dims — base-table on-disk bytes, never
    # the stats-v1 join-output estimate.
    orders = gated_broadcast(spark, sf, "orders", orders)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dround(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# ------------------------------------------- q5: multi-join with region gate


def q5_local_supplier_volume(spark: SparkSession, sf: str,
                             _tables: dict | None = None) -> DataFrame:
    """6-table join with broadcast dims + group aggregate (J1/J2/J3).

    Star-join order — the plan that survives 100x: the region gate
    folds into nation (fixed-size: hard broadcast hints stay), then
    into supplier and customer, and each FACT is reduced by its dim
    BEFORE the fact-fact join (orders x asia-customers, lineitem x
    asia-suppliers, ~1/|regions| survival each). Customer and
    supplier are SCALING tables, so their hints are SIZE-GATED
    (``gated_broadcast``, tables.py): the reduced dims are join
    outputs whose stats-v1 estimate is the useless input product, so
    the gate consults the base table's on-disk bytes instead — hint
    while the table fits the broadcast threshold, plain join (AQE
    decides, degrades to shuffle) past the ceiling. A HARD hint here
    dies at the 100 TB target; NO hint regresses 64x q5 3 s -> 8 s
    (the fact pays a map-side shuffle even after AQE converts).
    Plan-guarded both regimes: test_r8_gated_broadcast_*. Only then
    do the two reduced facts join on orderkey (+ the same-nation
    constraint); AQE broadcasts the reduced orders side when it
    fits. The old order joined the full 38M-row lineitem to the full
    orders first — a maximal shuffle whose output the dims then
    threw away."""
    # _tables: optional {name: DataFrame} fact overrides — the bench's
    # bucketed variant feeds catalog tables whose bucket spec makes the
    # fact-fact join below exchange-free; identical results either way
    t = _tables or {}
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf, "nation")
    asia_nations = (
        nation.join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(asia_nations),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = (
        load(spark, sf, "customer")
        .join(F.broadcast(asia_nations.select("n_nationkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    orders = (
        t.get("orders", load(spark, sf, "orders"))
        .join(gated_broadcast(spark, sf, "customer", cust),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = (
        t.get("lineitem", load(spark, sf, "lineitem"))
        .join(gated_broadcast(spark, sf, "supplier", supp),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_extendedprice", "l_discount",
                "s_nationkey", "n_name")
    )
    revenue = decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # (measured at 64x: pre-aggregating lineitem per (orderkey, nation)
    # before this join loses, 2.8 s vs 2.5 s interleaved — same result
    # as q3: the extra hash-agg over the fact costs more than the
    # shuffle rows it saves)
    # r16: size-gate the reduced orders side like q3 — at sf0.1 the
    # 2-column asia-orders frame broadcasts and lineitem never
    # shuffles before the final 5-row aggregate; at 64x/100 TB the
    # gate stays shut and the r15 shuffle/bucketed plan is unchanged.
    orders = gated_broadcast(spark, sf, "orders", orders)
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey)
                & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(dround(revenue, 4).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY n_name
"""

# --------------------------------------------------- broadcast dim join (J1)


def dim_join_enrichment(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast dimension join: customer count + avg balance per region
    (J1 — the reference's lookup-dict probe, utils.py:118-143)."""
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dround(decimal_sum(F.col("c_acctbal")).cast("double") / F.count("*"), 4).alias("avg_acctbal"),
        )
    )


DIM_JOIN_SQL = f"""
SELECT r_name, COUNT(*) AS n_customers,
  {sql_round("CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*)")} AS avg_acctbal
FROM customer, nation, region
WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY r_name
"""

# ------------------------------------------------------------ semi/anti (J5/J6)


def semi_join_big_spenders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi existence gate (J5 — `_server_in_zone`, _gcp.py:82-85)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", dround(F.col("c_acctbal"), 4).alias("acctbal"))
    )


SEMI_SQL = f"""
SELECT c_custkey, c_name, {sql_round("c_acctbal")} AS acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


def anti_join_no_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti set difference (J6 'new rows' / E2, cli.py:509-514)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

# ------------------------------------------------------------- windows (W1-W3)


def top1_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Top-1 per group under total order (W1 — inspector.py:599-602).

    max_by aggregate, not a row_number window: partial (map-side)
    aggregation reduces each scan partition to one candidate per
    customer before the shuffle — no sort, and the shuffle carries one
    row per (partition, group) instead of the whole fact table.
    Ascending o_orderkey tiebreak = max on its negation.
    """
    orders = load(spark, sf, "orders")
    best = argmax_per_group(
        orders, ["o_custkey"],
        [F.col("o_totalprice"), -F.col("o_orderkey")],
        ["o_orderkey", "o_totalprice"],
    )
    return best.select("o_custkey", "o_orderkey",
                       dround(F.col("o_totalprice"), 4).alias("best_price"))


TOP1_SQL = f"""
SELECT o_custkey, o_orderkey, {sql_round("o_totalprice")} AS best_price
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
WHERE rn = 1
"""


def keep_last_dedup_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-last PK dedup with explicit arrival position (A4/W2 —
    insert.py:24-72; l_linenumber plays the arrival-position column)."""
    li = load(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey", "l_suppkey").orderBy(
        F.col("l_linenumber").desc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                dround(F.col("l_quantity"), 4).alias("quantity"))
    )


KEEP_LAST_SQL = f"""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       {sql_round("l_quantity")} AS quantity
FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_partkey, l_suppkey
        ORDER BY l_linenumber DESC) AS rn FROM lineitem)
WHERE rn = 1
"""

# ------------------------------------------------------------ aggregates


def exact_median_price(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median per group (A2 — fleet medians must be exact,
    workload_profile_scores.py:215-223)."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        dround(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("median_price"),
        F.count("*").alias("n_orders"),
    )


MEDIAN_SQL = f"""
SELECT o_orderpriority,
  {sql_round("quantile_cont(o_totalprice, 0.5)")} AS median_price,
  COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def approx_median_price(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based scale twin of :func:`exact_median_price`:
    ``approx_percentile`` (Greenwald-Khanna, mergeable fixed-size
    summaries) instead of the exact ``percentile`` whose aggregation
    buffer holds every distinct value. At 100 TB the exact form's
    per-group state is unbounded; the sketch is O(1/accuracy) per group
    regardless of row count — the PRODUCTION query is the sketch-only
    groupBy.

    TOLERANCE ORACLE (r9 verdict task 5): DuckDB's approx_quantile is a
    different sketch (t-digest), so the sketch VALUE can't hash-match.
    Instead this emits the exact median plus ``within_bound`` = (sketch
    relative error vs that exact median <= 0.5%); the oracle emits the
    same exact median with a literal TRUE. A hash match therefore
    verifies group keys, counts, exact medians across engines AND that
    the GK sketch stayed inside tolerance — a drifting sketch flips the
    flag and reds the row. The exact arm exists only for this
    verification harness (it's the sf-scale twin, not the 100 TB
    path)."""
    orders = load(spark, sf, "orders")
    exact = F.expr("percentile(o_totalprice, 0.5)")
    approx = F.percentile_approx(F.col("o_totalprice"), F.lit(0.5),
                                 F.lit(10000))
    return orders.groupBy("o_orderpriority").agg(
        dround(exact, 4).alias("median_price_exact"),
        (F.abs(approx - exact) <= F.abs(exact) * 0.005)
        .alias("within_bound"),
        F.count("*").alias("n_orders"),
    )


APPROX_MEDIAN_SQL = f"""
SELECT o_orderpriority,
  {sql_round("quantile_cont(o_totalprice, 0.5)")} AS median_price_exact,
  TRUE AS within_bound,
  COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def mode_brand_per_type(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic mode (A8 — most-frequent GPU model, inspector.py:
    1066-1067): count + row_number with lexicographic tiebreak."""
    part = load(spark, sf, "part")
    counts = part.groupBy("p_type", "p_brand").count()
    w = Window.partitionBy("p_type").orderBy(F.col("count").desc(), F.col("p_brand"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_type", F.col("p_brand").alias("mode_brand"),
                F.col("count").alias("n"))
    )


MODE_SQL = """
SELECT p_type, p_brand AS mode_brand, n
FROM (SELECT p_type, p_brand, COUNT(*) AS n,
        row_number() OVER (PARTITION BY p_type ORDER BY COUNT(*) DESC, p_brand) AS rn
      FROM part GROUP BY p_type, p_brand)
WHERE rn = 1
"""


def group_merge_nations(spark: SparkSession, sf: str) -> DataFrame:
    """Group-merge of catalog rows (A6 — merge_database_catalog_rows,
    vendor_helpers.py:114-135): sorted distinct union per group."""
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


GROUP_MERGE_SQL = """
SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation, region WHERE n_regionkey = r_regionkey
GROUP BY r_name
"""


def minmax_bounds_part(spark: SparkSession, sf: str) -> DataFrame:
    """Min/max bounds fold (A7 — storage-type bounds, _aws.py:1470-1510)."""
    part = load(spark, sf, "part")
    return part.groupBy("p_type").agg(
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        dround(F.max("p_retailprice"), 4).alias("max_price"),
        F.count("*").alias("n_parts"),
    )


MINMAX_SQL = f"""
SELECT p_type, MIN(p_size) AS min_size, MAX(p_size) AS max_size,
       {sql_round("MAX(p_retailprice)")} AS max_price,
       COUNT(*) AS n_parts
FROM part GROUP BY p_type
"""


def argmax_customer_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """max_by extraction (A13 — best1/bestn, inspector.py:562-574) with a
    total-order tiebreak, as a partial-agg-friendly aggregate (no window
    sort; ascending c_custkey tiebreak = max on its negation)."""
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    top = argmax_per_group(
        cust, ["c_nationkey"],
        [F.col("c_acctbal"), -F.col("c_custkey")],
        ["c_name", "c_acctbal"],
    )
    return top.join(F.broadcast(nation), top.c_nationkey == nation.n_nationkey).select(
        "n_name", F.col("c_name").alias("top_customer"),
        dround(F.col("c_acctbal"), 4).alias("acctbal"),
    )


ARGMAX_SQL = f"""
SELECT n_name, c_name AS top_customer, {sql_round("c_acctbal")} AS acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
        ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) c, nation
WHERE rn = 1 AND c_nationkey = n_nationkey
"""


def count_expansion(spark: SparkSession, sf: str) -> DataFrame:
    """Count-based row expansion (A11 — `_array_expand_by_count`,
    _aws.py:292-313): explode(sequence) == unnest(generate_series)."""
    part = load(spark, sf, "part")
    n = (F.col("p_size") % 3 + 1).cast("int")
    return (
        part.withColumn("copy_idx", F.explode(F.sequence(F.lit(1), n)))
        .groupBy("p_brand")
        .agg(F.count("*").alias("expanded_rows"))
    )


COUNT_EXPANSION_SQL = """
SELECT p_brand, COUNT(*) AS expanded_rows
FROM (SELECT p_brand,
        unnest(generate_series(1, CAST(p_size % 3 + 1 AS BIGINT))) AS i
      FROM part)
GROUP BY p_brand
"""


def weighted_geomean_price(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted geometric mean (A3 core math — workload_profile_scores.py:
    240-400): 2^(sum(w*log2(x))/sum(w)), decimal-accumulated."""
    li = load(spark, sf, "lineitem")
    wlog = (F.col("l_quantity") * F.log2(F.col("l_extendedprice"))).cast("decimal(28,12)")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(wlog).alias("swl"),
        F.sum(F.col("l_quantity").cast("decimal(28,12)")).alias("sw"),
    )
    score = F.pow(F.lit(2.0), F.col("swl").cast("double") / F.col("sw").cast("double"))
    return agg.select("l_returnflag", dround(score, 4).alias("geo_mean_price"))


GEOMEAN_SQL = f"""
SELECT l_returnflag,
  {sql_round("pow(2.0, CAST(SUM(CAST(l_quantity * log2(l_extendedprice) AS DECIMAL(28,12))) AS DOUBLE) / CAST(SUM(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE))")} AS geo_mean_price
FROM lineitem GROUP BY l_returnflag
"""

# ------------------------------------------------------------- scalar funcs


def sig_fig_prices(spark: SparkSession, sf: str) -> DataFrame:
    """3-significant-figure rounding (F7 — workload_profile_scores.py:
    37-57) via string-length magnitude (cross-engine exact for x>=1)."""
    orders = load(spark, sf, "orders").filter(F.col("o_totalprice") >= 1)
    mag = F.length(F.floor(F.abs(F.col("o_totalprice"))).cast("bigint").cast("string")) - 1
    decimals = F.greatest(F.lit(2) - mag, F.lit(0))
    shift = F.pow(F.lit(10.0), decimals.cast("double"))
    return orders.select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * shift, 0) / shift).alias("price_3sf"),
    )


SIG_FIG_SQL = """
SELECT o_orderkey,
  round(o_totalprice * s) / s AS price_3sf
FROM (SELECT o_orderkey, o_totalprice,
        pow(10.0, CAST(greatest(2 - (length(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR)) - 1), 0) AS DOUBLE)) AS s
      FROM orders WHERE o_totalprice >= 1)
"""


def unit_conversions(spark: SparkSession, sf: str) -> DataFrame:
    """Unit conversion arithmetic (F4/F6 — utils.py:13-26: 730 h/month,
    GiB->GB; 4-decimal price rounding, tables.py:263-283)."""
    orders = load(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        dround(F.col("o_totalprice") / 730.0, 4).alias("hourly_price"),
        dround(F.col("o_totalprice") * 1.073741824, 4).alias("gib_as_gb"),
    )


UNIT_CONV_SQL = f"""
SELECT o_orderkey,
  {sql_round("o_totalprice / 730.0")} AS hourly_price,
  {sql_round("o_totalprice * 1.073741824")} AS gib_as_gb
FROM orders
"""


def extract_brand_number(spark: SparkSession, sf: str) -> DataFrame:
    """Last-number extraction (F3 — str_utils.py:64-80)."""
    part = load(spark, sf, "part")
    return part.select(
        "p_partkey", extract_last_number(F.col("p_brand")).alias("brand_num")
    )


EXTRACT_NUM_SQL = r"""
SELECT p_partkey,
  CAST(nullif(regexp_extract(p_brand, '([0-9]+\.?[0-9]*)[^0-9]*$', 1), '') AS DOUBLE) AS brand_num
FROM part
"""


def json_props_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Nested JSON path extraction (F18 — terms→priceDimensions walking,
    _aws.py:405-447) over the events.props JSON column."""
    ev = load(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.count("*").alias("n_events"),
    )


JSON_EXTRACT_SQL = """
SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def min_unit_price_per_part(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's flagship slice query shape (SURVEY.md §7.2:
    'cheapest ondemand price per server across regions'): min unit price
    per part joined back to the dimension."""
    li = load(spark, sf, "lineitem").filter(F.col("l_quantity") > 0)
    part = load(spark, sf, "part")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    best = li.groupBy("l_partkey").agg(dround(F.min(unit), 4).alias("min_unit_price"))
    return best.join(F.broadcast(part), best.l_partkey == part.p_partkey).select(
        "p_partkey", "p_name", "min_unit_price"
    )


MIN_UNIT_PRICE_SQL = f"""
SELECT p_partkey, p_name,
  {sql_round("MIN(l_extendedprice / l_quantity)")} AS min_unit_price
FROM lineitem, part
WHERE l_quantity > 0 AND l_partkey = p_partkey
GROUP BY p_partkey, p_name
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter — 4-table join (nation broadcast), decimal revenue agg,
    top-20 via TakeOrderedAndProject with a total order."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation),
              cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dround(decimal_sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: customers with any single order above a
    quantity threshold — HAVING-gated aggregate as the IN-subquery
    (semi join on the aggregated key), then re-aggregation."""
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(decimal_sum(F.col("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    qty = li.groupBy("l_orderkey").agg(
        dround(decimal_sum(F.col("l_quantity")), 4).alias("total_qty"))
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"],
                    "left_semi")
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(qty, orders["o_orderkey"] == qty["l_orderkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
  {sql_round("q.total_qty")} AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS total_qty
      FROM lineitem GROUP BY l_orderkey) q
  ON o_orderkey = q.l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 150)
"""


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year — the nation dim joins TWICE (supplier side and customer
    side, both broadcast), with the symmetric pair predicate and a
    year-extraction group key."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    a, b = "NATION_3", "NATION_7"
    pair = (
        ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
        | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dround(decimal_sum(revenue), 4).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
  {sql_round("SUM(CAST(volume AS DECIMAL(28,6)))")} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
"""


def q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year) for
    parts matching a name filter — the multi-fact star join (lineitem
    x orders plus three broadcast dims) with a LIKE-filtered dim and an
    extract(year) group key the registry didn't cover yet.

    The lake has no partsupp table, so supply cost is proxied as
    ``p_retailprice * l_quantity * 0.1`` (same join shape, documented
    adaptation): amount = l_extendedprice*(1-l_discount) - cost.
    The p_name filter prunes part BEFORE its broadcast; the only
    shuffle joins the two facts on orderkey. Supplier is a SCALING
    table so it carries no hard hint — AQE auto-broadcasts it while
    it fits and degrades to shuffle past the ceiling (part keeps its
    hint: the 'red' LIKE filter bounds it at any sf)."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part").filter(F.col("p_name").contains("red"))
    supp = load(spark, sf, "supplier")
    orders = load(spark, sf, "orders")
    nation = load(spark, sf, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dround(decimal_sum(amount), 4).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT nation, o_year,
  {sql_round("SUM(CAST(amount AS DECIMAL(28,6)))")} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - p_retailprice * l_quantity * 0.1 AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
"""


def q16_parts_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute
    triple with a NOT-IN supplier exclusion — Spark plans the NOT IN
    as a (broadcast) anti join and the count(distinct) as a two-phase
    expand/agg; both shapes were missing from the registry.

    partsupp is proxied by the (l_partkey, l_suppkey) pairs observed
    in lineitem; "complaint" suppliers are those with negative account
    balance (the lake has no s_comment column)."""
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    ps = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    bad = load(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps["l_suppkey"] == bad["s_suppkey"],
                "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q12_priority_shipmode(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: CONDITIONAL aggregation — CASE expressions
    inside SUM classify joined rows into high/low priority counts per
    group, a shape (pivot-less conditional counts) the registry didn't
    cover. lineitem has no shipmode column in this lake, so the group
    key is l_returnflag (same operator shape); the date filter pushes
    into the lineitem scan, orders arrives projected to 2 columns."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = load(spark, sf, "orders").select("o_orderkey",
                                              "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: a DISJUNCTION of per-branch conjunctions over
    dim and fact columns — the OR-of-ANDs predicate that exercises
    CNF conversion: Catalyst pushes the common l_quantity bounds and
    the per-branch p_brand/p_size constraints into the scans while the
    cross-table residual evaluates post-join."""
    part = load(spark, sf, "part")
    li = load(spark, sf, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    branch = (
        ((F.col("p_brand") == "Brand#12")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23")
           & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34")
           & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    revenue = decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.filter(branch).agg(
        dround(revenue, 4).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = f"""
SELECT
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: group aggregate gated by a HAVING clause that
    compares against a fraction of the GLOBAL total — an uncorrelated
    scalar subquery in HAVING (here the per-part stock value of one
    nation's suppliers vs 0.1% of that nation's total). Catalyst
    computes the global once (one-row broadcast) and filters the
    aggregate — never per-group re-aggregation.

    Determinism: the fraction is multiplied through
    (sum_part * 1000 > sum_total, both DECIMAL) — no double threshold
    to disagree on the last ulp."""
    load(spark, sf, "lineitem").createOrReplaceTempView("_t_lineitem")
    load(spark, sf, "supplier").createOrReplaceTempView("_t_supplier")
    load(spark, sf, "nation").createOrReplaceTempView("_t_nation")
    return spark.sql(f"""
        SELECT l_partkey,
               {sql_round("CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)")} AS stock_value
        FROM _t_lineitem
        JOIN _t_supplier ON l_suppkey = s_suppkey
        JOIN _t_nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) * 1000 > (
            SELECT SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
            FROM _t_lineitem
            JOIN _t_supplier ON l_suppkey = s_suppkey
            JOIN _t_nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7')
    """)


Q11_SQL = f"""
SELECT l_partkey,
       {sql_round("CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)")} AS stock_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) * 1000 > (
    SELECT SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)))
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7')
"""


def q21_single_supplier_blame(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: DOUBLE correlated subquery — an EXISTS (another
    supplier also shipped this order) and a NOT EXISTS (no OTHER
    supplier had a returned line) against the same fact, both
    correlated to the outer row. The planner must decorrelate both
    into semi/anti hash joins; a surviving correlated probe
    re-executes per outer row. Adapted to the lake's columns: the
    original's receipt>commit lateness predicate becomes
    l_returnflag = 'R' (same operator shape, different column).
    Counts per supplier the multi-supplier orders where THAT supplier
    alone had returned lines."""
    load(spark, sf, "lineitem").createOrReplaceTempView("_t_lineitem")
    load(spark, sf, "supplier").createOrReplaceTempView("_t_supplier")
    return spark.sql("""
        SELECT s.s_suppkey, COUNT(*) AS numblame
        FROM _t_supplier s
        JOIN _t_lineitem l1
          ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
        WHERE EXISTS (
            SELECT 1 FROM _t_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM _t_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s.s_suppkey
    """)


Q21_SQL = """
SELECT s.s_suppkey, COUNT(*) AS numblame
FROM supplier s
JOIN lineitem l1
  ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_suppkey
"""


def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — a
    COUNT-OF-COUNTS histogram. Customers left-join their non-urgent
    orders (zero-order customers must survive with count 0 — the whole
    point of the outer join), count per customer, then count customers
    per order-count. Two shuffles, both with map-side partial combine;
    all outputs are integers, so cross-engine parity is exact."""
    cust = load(spark, sf, "customer").select("c_custkey")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips NULLs
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-then-select-the-max — per-supplier
    revenue over a date window, keeping the supplier(s) whose revenue
    EQUALS the global max (ties all surface, per spec). The max is an
    uncorrelated scalar subquery over the same aggregate; Catalyst
    plans the aggregate once per branch and the max as a one-row
    broadcast. Revenue compares in DECIMAL (exact), rounds only for
    output."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    rev = li.groupBy("l_suppkey").agg(
        decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("_rev"))
    max_rev = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(max_rev), rev["_rev"] == max_rev["_mx"])
        .select(F.col("l_suppkey").alias("s_suppkey"),
                dround(F.col("_rev").cast("double"), 4)
                .alias("total_revenue"))
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS _rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey,
       {sql_round("CAST(_rev AS DOUBLE)")} AS total_revenue
FROM rev WHERE _rev = (SELECT MAX(_rev) FROM rev)
"""


def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: join + RATIO of conditional aggregates over a
    date-sliced fact — 100 * sum(CASE promo THEN revenue)/sum(revenue)
    for one month of shipments. The lake's p_type carries class labels
    (ECONOMY/SMALL/...), so 'ECONOMY' plays the PROMO% marker — the
    operator shape (broadcast dim join + two CASE-gated decimal sums
    folded into one scalar) is identical. Both sums go through DECIMAL
    and the ratio is computed once from the two aggregates, so the
    single output row is order-independent in both engines."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = decimal_sum(F.when(F.col("p_type") == "ECONOMY", disc)
                        .otherwise(F.lit(0.0)))
    total = decimal_sum(disc)
    return j.agg(
        dround(promo.cast("double") * 100 / total.cast("double"), 4)
        .alias("promo_revenue_pct"),
        dround(total, 4).alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT
  {sql_round("CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)) ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DOUBLE) * 100 / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)")} AS promo_revenue_pct,
  {sql_round("SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)))")} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated SCALAR subquery (the positive-
    balance average) gating a filter, then an ANTI join (customers with
    no RECENT orders — the 'lost customers' date-filtered anti join of
    the original), then a group aggregate. The lake's customer has no
    phone country code, so the nation key plays it: customers in 7
    target nations whose balance beats the average positive balance of
    those nations, minus anyone who ordered since 2000-01-01, counted
    per nation (every customer has SOME order at lake density; the
    date filter keeps the anti join selective, like the original's
    7-year window).

    Expressed in SQL so Catalyst's subquery planner handles both
    shapes: the scalar subqueries become one-row broadcasts (computed
    once, never per-row) and NOT EXISTS becomes a left-anti hash join
    on custkey — guarded against correlated re-execution in
    test_skew_and_plans (no Subquery nodes survive).

    Determinism: the canonical form's ``acctbal > AVG(acctbal)``
    compares against a DOUBLE average whose last-ulp value depends on
    summation order — a boundary row could flip between engines. The
    average is multiplied through instead (``bal * count > sum``,
    count > 0), all in DECIMAL: exact in both engines."""
    load(spark, sf, "customer").createOrReplaceTempView("_t_customer")
    load(spark, sf, "orders").createOrReplaceTempView("_t_orders")
    return spark.sql(f"""
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               {sql_round("CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)")} AS totacctbal
        FROM _t_customer c
        WHERE c_nationkey IN (1, 4, 7, 10, 13, 16, 19)
          AND CAST(c_acctbal AS DECIMAL(28,6)) * (
            SELECT COUNT(*) FROM _t_customer
            WHERE c_acctbal > 0.0
              AND c_nationkey IN (1, 4, 7, 10, 13, 16, 19)) > (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) FROM _t_customer
            WHERE c_acctbal > 0.0
              AND c_nationkey IN (1, 4, 7, 10, 13, 16, 19))
          AND NOT EXISTS (
            SELECT 1 FROM _t_orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
    """)


Q22_SQL = f"""
SELECT c_nationkey,
       COUNT(*) AS numcust,
       {sql_round("CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)")} AS totacctbal
FROM customer c
WHERE c_nationkey IN (1, 4, 7, 10, 13, 16, 19)
  AND CAST(c_acctbal AS DECIMAL(28,6)) * (
    SELECT COUNT(*) FROM customer
    WHERE c_acctbal > 0.0
      AND c_nationkey IN (1, 4, 7, 10, 13, 16, 19)) > (
    SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) FROM customer
    WHERE c_acctbal > 0.0
      AND c_nationkey IN (1, 4, 7, 10, 13, 16, 19))
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-aggregate — three range predicates
    on one fact, no join, one scalar out. The registry's only query
    whose whole plan is scan -> filter -> partial agg -> final agg;
    it pins the pushdown contract (all three predicates reach the
    parquet scan as PushedFilters, ReadSchema is 4 columns of 11) and
    gives the bench a pure scan-throughput floor that isolates
    exchange cost from scan cost at the 64x block."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dround(decimal_sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
        .alias("revenue"))


Q6_SQL = f"""
SELECT {sql_round("SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q8_national_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the deepest join tree in
    the registry (two facts + part/supplier/customer and nation TWICE,
    once per side of the trade) feeding a ratio of conditional sums per
    order year. The nation dim joins under two aliases. Fixed-size
    dims (nation x2, region, PROMO-filtered part) keep hard broadcast
    hints; customer and supplier SCALE with sf so they carry none —
    AQE auto-broadcasts them while they fit and degrades to shuffle
    past the ceiling, so at bench scale the only exchanges remain the
    fact-fact join on orderkey and the final 2-row groupBy.

    Adaptation (no p_comment/partsupp in the lake): the target product
    line is p_type = 'PROMO', the market is region 'AMERICA', and the
    'nation' whose share is measured is NATION_5. Numerator and
    denominator accumulate in DECIMAL; the ratio is one double divide
    per year row — order-independent in both engines."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    part = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf, "supplier")
    s_nation = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name"))
    c_nation = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey"))
    cust = load(spark, sf, "customer")
    region = load(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = decimal_sum(
        F.when(F.col("sn_name") == "NATION_5", volume).otherwise(F.lit(0.0)))
    total_vol = decimal_sum(volume)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(s_nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(dround(nation_vol.cast("double") / total_vol.cast("double"), 4)
             .alias("mkt_share"))
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  {sql_round("CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6)) ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DOUBLE) / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)")} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
"""


def q20_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: an aggregate-vs-aggregate threshold gating a
    semi join — suppliers whose 1997 shipped quantity of a 'red%' part
    exceeds HALF of everyone's shipped quantity of that part, named
    with their nation. The canonical form's correlated
    ``ps_availqty > 0.5 * (SELECT SUM(l_quantity) ...)`` becomes a
    window total over the (part, supplier) rollup: one shuffle for the
    groupBy, the per-part total via a window on the same rows (no
    second scan, no correlated re-execution), then a semi join into
    supplier (partsupp is proxied by observed lineitem pairs, as in
    q16/q11).

    The 0.5 factor is exact: qty and the window total are DECIMAL, and
    ``qty * 2 > total`` avoids a double multiply — no engine-boundary
    row can flip."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    red = load(spark, sf, "part").filter(
        F.col("p_name").startswith("red")).select("p_partkey")
    sp = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(decimal_sum(F.col("l_quantity")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    big = (
        sp.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") * 2 > F.col("part_total"))
        .select("l_suppkey").distinct()
    )
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    return (
        supp.join(big, supp["s_suppkey"] == big["l_suppkey"], "left_semi")
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


Q20_SQL = """
WITH sp AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey),
big AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS part_total
    FROM sp)
  WHERE qty * 2 > part_total)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM big)
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q8_national_market_share": (q8_national_market_share, Q8_SQL),
    "q20_dominant_suppliers": (q20_dominant_suppliers, Q20_SQL),
    "q14_promo_effect": (q14_promo_effect, Q14_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity, Q22_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q21_single_supplier_blame": (q21_single_supplier_blame, Q21_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q9_product_type_profit": (q9_product_type_profit, Q9_SQL),
    "q16_parts_supplier": (q16_parts_supplier, Q16_SQL),
    "q12_priority_shipmode": (q12_priority_shipmode, Q12_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "dim_join_enrichment": (dim_join_enrichment, DIM_JOIN_SQL),
    "semi_join_big_spenders": (semi_join_big_spenders, SEMI_SQL),
    "anti_join_no_orders": (anti_join_no_orders, ANTI_SQL),
    "top1_order_per_customer": (top1_order_per_customer, TOP1_SQL),
    "keep_last_dedup_lineitem": (keep_last_dedup_lineitem, KEEP_LAST_SQL),
    "exact_median_price": (exact_median_price, MEDIAN_SQL),
    "approx_median_price": (approx_median_price, APPROX_MEDIAN_SQL),
    "q2_min_price_order": (q2_min_price_order, Q2_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "mode_brand_per_type": (mode_brand_per_type, MODE_SQL),
    "group_merge_nations": (group_merge_nations, GROUP_MERGE_SQL),
    "minmax_bounds_part": (minmax_bounds_part, MINMAX_SQL),
    "argmax_customer_per_nation": (argmax_customer_per_nation, ARGMAX_SQL),
    "count_expansion": (count_expansion, COUNT_EXPANSION_SQL),
    "weighted_geomean_price": (weighted_geomean_price, GEOMEAN_SQL),
    "sig_fig_prices": (sig_fig_prices, SIG_FIG_SQL),
    "unit_conversions": (unit_conversions, UNIT_CONV_SQL),
    "extract_brand_number": (extract_brand_number, EXTRACT_NUM_SQL),
    "json_props_extract": (json_props_extract, JSON_EXTRACT_SQL),
    "min_unit_price_per_part": (min_unit_price_per_part, MIN_UNIT_PRICE_SQL),
}
