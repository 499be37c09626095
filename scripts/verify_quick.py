#!/usr/bin/env python
"""Session verify: driver-contract smoke + oracle compare for named
queries at sf0.01 (the round driver's exact gate shape).

Usage: python scripts/verify_quick.py [query ...]
With no args: entry() smoke + every registry query (full sweep).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["customer", "orders", "lineitem", "part", "partsupp", "supplier",
          "nation", "region", "events", "documents", "embeddings"]


def value_hash(rows, cols):
    import math
    out = []
    for r in sorted(tuple(str(_norm(r[c])) for c in cols) for r in rows):
        out.append("|".join(r))
    return hashlib.sha256("\n".join(out).encode()).hexdigest()


def _norm(v):
    import datetime
    import decimal
    # NULL-vs-NaN and int-vs-float parity: Spark .collect() yields
    # None / int for a nullable bigint while DuckDB .fetchdf() yields
    # numpy nan / float64 for the same column — normalize both sides
    # to one spelling or every nullable numeric column "mismatches"
    # (found on hybrid_rrf_retrieval's rank_b/rank_v, r17).
    if v is None:
        return "nan"
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return f"{v:.6f}" if v == v else "nan"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6f}"
    if isinstance(v, datetime.datetime):
        # pandas NaT subclasses datetime but raises on strftime — it is
        # DuckDB-pandas' spelling of a NULL timestamp (Spark: None,
        # already mapped to "nan" above)
        return "nan" if v != v else v.strftime("%Y-%m-%d %H:%M:%S")
    return v


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[16]")
             .appName("verify")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = entrymod.entry(spark).collect()
    assert len(n) > 0, "entry() returned 0 rows"
    print(f"entry() smoke: {len(n)} rows OK", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sdf.collect()
            orows = con.execute(oracles[name]).fetchdf()
            ocols = sorted(orows.columns.tolist())
            orecs = orows.to_dict("records")
            if scols != ocols:
                bad.append((name, f"cols {scols} vs {ocols}"))
                continue
            sh = value_hash([r.asDict() for r in srows], scols)
            oh = value_hash(orecs, ocols)
            if len(srows) != len(orecs) or sh != oh:
                bad.append((name, f"rows {len(srows)} vs {len(orecs)}, "
                                  f"hash {'==' if sh == oh else '!='}"))
            else:
                print(f"  OK {name}: {len(srows)} rows hash-equal", flush=True)
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"EXC {type(e).__name__}: {e}"))
    if bad:
        for name, why in bad:
            print(f"  FAIL {name}: {why}")
        sys.exit(1)
    print(f"verify: all {len(names)} queries hash-green vs oracle")


if __name__ == "__main__":
    main()
