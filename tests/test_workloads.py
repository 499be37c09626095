"""Real workload-profile catalog (reference workload_profiles.py:125-470,
workload_profile_scores.py:37-442; reconstruction property mirrors
reference tests/test_workload_profile_scores.py:27-41)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sc_crawler_spark.workloads import (
    ENTRIES,
    N_VARIANTS,
    VARIANTS,
    WORKLOADS,
    benchmark_scores,
    workload_catalog_breakdown,
    workload_profiles_catalog,
)

SF = "/root/testdata/sf0.001"


def test_catalog_shape_and_weights():
    # weights within each workload sum to 1.0 (workload_profiles.py:9)
    for wk, w in WORKLOADS.items():
        total = sum(float(b[1]) for b in w["benchmarks"])
        assert abs(total - 1.0) < 1e-9, (wk, total)
    # global entry index order is the workload-key iteration order
    assert [e["entry_idx"] for e in ENTRIES] == list(range(len(ENTRIES)))
    # every entry has at least one exactly-matching variant
    variant_cfgs = {(bid, cfg) for _, bid, cfg in VARIANTS}
    assert N_VARIANTS == len(VARIANTS) == len(variant_cfgs)


def test_fixture_is_deterministic(spark):
    a = benchmark_scores(spark, SF).orderBy("vendor_id", "server_id",
                                            "variant_id", "score").collect()
    b = benchmark_scores(spark, SF).orderBy("vendor_id", "server_id",
                                            "variant_id", "score").collect()
    assert a == b and len(a) > 0


def test_score_reconstruction_from_breakdown(spark):
    """Rebuild each composite from its published per-component breakdown
    the same way the reference test does: score ≈ 2^(Σ w·log2(norm) / Σ w)
    over the component rows (normalized is 3-sig-fig rounded, so allow a
    small relative tolerance)."""
    scores = {
        (r.vendor_id, r.server_id, r.benchmark_id): (r.score, r.coverage)
        for r in workload_profiles_catalog(spark, SF).collect()
    }
    rows = workload_catalog_breakdown(spark, SF).collect()
    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault(
            (r.vendor_id, r.server_id, f"workload_profile:{r.workload_key}"),
            []).append(r)
    assert by_group, "breakdown produced no rows"
    checked = 0
    for key, comps in by_group.items():
        score, coverage = scores[key]
        log_sum = sum(r.weight * math.log2(r.normalized) for r in comps)
        total_w = sum(r.weight for r in comps)
        # IGNOREd components carry no weight; coverage is the kept weight
        assert abs(total_w - coverage) < 1e-6, key
        rebuilt = 2 ** (log_sum / total_w)
        assert abs(rebuilt - score) / score < 0.02, (key, rebuilt, score)
        checked += 1
    assert checked == len(scores), "every composite row has breakdown rows"


def test_config_subset_match_tolerance(spark):
    """P6 float tolerance (1e-6) and subset semantics through the real
    matching path: jittered configs inside tolerance match, mismatched
    configs don't (reference _config_matches:79-99)."""
    from sc_crawler_spark.workloads import _MATCH_SPARK

    cases = [
        # (config, filter, expect)
        ('{"size":"1k","connections_per_vcpus":8.0000004,"x":"extra"}',
         '{"connections_per_vcpus":8.0,"size":"1k"}', True),
        ('{"size":"1k","connections_per_vcpus":8.01}',
         '{"connections_per_vcpus":8.0,"size":"1k"}', False),
        ('{"size":"64k","connections_per_vcpus":8.0}',
         '{"connections_per_vcpus":8.0,"size":"1k"}', False),
        ('{"size":"1k"}',  # missing filter key
         '{"connections_per_vcpus":8.0,"size":"1k"}', False),
        ('{"anything":1}', None, True),  # no filter matches all
        # INT-typed filter values use the reference's int(actual) ==
        # expected truncation branch (workload_profile_scores.py:79-99):
        ('{"block_size":16384.9}', '{"block_size":16384}', True),
        ('{"block_size":16384}', '{"block_size":16384}', True),
        ('{"block_size":16385.1}', '{"block_size":16384}', False),
        ('{"block_size":"16k"}', '{"block_size":16384}', False),
        # float-typed filter values keep the 1e-6 tolerance (8.9 is NOT
        # truncated against 8.0):
        ('{"connections_per_vcpus":8.9}',
         '{"connections_per_vcpus":8.0}', False),
    ]
    df = spark.createDataFrame(
        [(c, f, e) for c, f, e in cases], ["config", "flt", "expect"])
    got = df.withColumn("ok", F.expr(_MATCH_SPARK)).collect()
    for r in got:
        assert r.ok == r.expect, (r.config, r.flt)

    # identical verdicts from the DuckDB side of the oracle
    import duckdb

    from sc_crawler_spark.workloads import _MATCH_DUCK
    con = duckdb.connect()
    for cfg, flt, expect in cases:
        fv = "NULL" if flt is None else "'" + flt.replace("'", "''") + "'"
        (got_d,) = con.execute(
            f"SELECT {_MATCH_DUCK} FROM (SELECT {fv} AS flt) en, "
            f"(SELECT '{cfg}' AS config) sv"
        ).fetchone()
        assert bool(got_d) == expect, ("duckdb", cfg, flt)


def test_hib_derived_from_benchmark_catalog():
    """higher_is_better comes from the static benchmark catalog, not a
    hardcoded literal (ADVICE r2): the catalog carries real
    lower-is-better rows, and every entry's flag equals its benchmark's
    catalog flag."""
    from sc_crawler_spark.sources.lookup import BENCHMARKS
    from sc_crawler_spark.workloads import ENTRIES, _HIB

    assert _HIB["redis:latency"] is False
    assert _HIB["compression_text:ratio"] is False
    assert _HIB["passmark:memory_latency"] is False
    catalog = {b[0]: b[6] for b in BENCHMARKS}
    for e in ENTRIES:
        assert e["hib"] == catalog[e["benchmark_id"]], e["benchmark_id"]


def test_llm_require_suppresses(spark):
    """Servers missing a REQUIRE component have no llm row at all."""
    cat = workload_profiles_catalog(spark, SF)
    per_wk = {r.benchmark_id: r.cnt
              for r in cat.groupBy("benchmark_id").agg(
                  F.count("*").alias("cnt")).collect()}
    assert per_wk["workload_profile:llm"] < per_wk["workload_profile:web"]


def test_workload_score_rows_from_custom_scores(spark):
    """workload_score_rows over an arbitrary benchmark_score frame
    (recompute_workload_profiles, workload_profile_scores.py:248-400):
    median-ratio geomean, partial-coverage note, full breakdown JSON
    with ignored components at weight_share 0."""
    import json as _json
    import math

    from sc_crawler_spark.workloads import workload_score_rows

    scores = spark.createDataFrame(
        [("aws", "a", "stress_ng:best1", "{}", 100.0),
         ("aws", "a", "stress_ng:bestn", "{}", 1000.0),
         ("aws", "b", "stress_ng:best1", "{}", 200.0),
         ("aws", "b", "stress_ng:bestn", "{}", 4000.0)],
        "vendor_id string, server_id string, benchmark_id string, "
        "config string, score double")
    rows = {(r["server_id"], r["benchmark_id"]): r
            for r in workload_score_rows(spark, scores).collect()}

    a = rows[("a", "workload_profile:compute")]
    wsum = 0.10 * math.log2(100 / 150) + 0.15 * math.log2(1000 / 2500)
    expect = 2 ** (wsum / 0.25)
    assert abs(a["score"] - expect) / expect < 1e-3
    assert a["config"] == "{}"
    assert a["framework_version"] == "2.0"
    assert "Partial coverage: missing component benchmark(s): " in a["note"]
    assert "PassMark CPU Mark (composite)" in a["note"]

    bd = _json.loads(a["score_breakdown"])
    assert bd["aggregation"] == "weighted_geometric_mean"
    assert bd["normalization"] == "median_ratio"
    assert abs(bd["coverage"] - 0.25) < 1e-9
    comps = {c["label"]: c for c in bd["components"]}
    assert len(comps) == 8                       # scored + ignored all listed
    scored = comps["stress-ng div16 single core"]
    assert scored["raw"] == 100.0 and scored["reference"] == 150.0
    assert abs(scored["weight_share"] - 0.4) < 1e-9
    assert scored["higher_is_better"] is True
    ignored = comps["PassMark CPU Mark (composite)"]
    assert ignored["weight_share"] == 0.0
    assert ignored.get("normalized") is None and ignored.get("raw") is None

    # the fleet midpoint server scores ~1.0 on the symmetric entries
    b = rows[("b", "workload_profile:compute")]
    assert b["score"] > a["score"]


def test_config_match_respects_json_value_types(spark):
    """P6 parity pin (r7): the reference's numeric branches require the
    ACTUAL value be int/float — a string "128" must NOT match filter
    128, and a string filter must not match a numeric actual. Spark
    (raw-JSON quote probe), DuckDB (json_type) and the reference
    algorithm must agree on every case."""
    import duckdb

    from sc_crawler_spark.workloads import _MATCH_DUCK, _MATCH_SPARK

    cases = [
        ('{"tokens": 128}', '{"tokens": 128}', True),
        ('{"tokens": 128}', '{"tokens": "128"}', False),
        ('{"tokens": 128}', '{"tokens": 128.9}', True),   # int truncation
        ('{"threads": 0.5}', '{"threads": 0.5000001}', True),
        ('{"threads": 0.5}', '{"threads": "0.5"}', False),
        ('{"op": "read"}', '{"op": "read"}', True),
        ('{"op": "read"}', '{"op": "write"}', False),
        ('{"op": "128"}', '{"op": 128}', False),
        ('{"multi": true}', '{"multi": true}', True),
        ('{"multi": true}', '{"multi": false}', False),
        (None, '{"anything": 1}', True),
        ('{"tokens": 128}', '{"other": 1}', False),
    ]

    def ref_match(flt, cfg):
        import json as _json
        if flt is None:
            return True
        f, c = _json.loads(flt), _json.loads(cfg)
        for k, expected in f.items():
            actual = c.get(k)
            if actual is None:
                return False
            if isinstance(expected, float) and isinstance(actual, (int, float)):
                if abs(float(actual) - expected) > 1e-6:
                    return False
            elif isinstance(expected, int) and isinstance(actual, (int, float)):
                if int(actual) != expected:
                    return False
            elif actual != expected:
                return False
        return True

    rows = [(i, flt, cfg) for i, (flt, cfg, _e) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, flt string, config string")
    got_spark = {r.i: bool(r.m) for r in
                 df.selectExpr("i", f"({_MATCH_SPARK}) AS m").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, flt VARCHAR, config VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    duck_expr = _MATCH_DUCK.replace("en.flt", "t.flt").replace(
        "sv.config", "t.config")
    got_duck = dict(con.execute(f"SELECT i, {duck_expr} FROM t").fetchall())
    con.close()
    for i, (flt, cfg, _e) in enumerate(cases):
        want = ref_match(flt, cfg)
        assert got_spark[i] == want, (i, flt, cfg, got_spark[i], want)
        assert got_duck[i] == want, (i, flt, cfg, got_duck[i], want)
