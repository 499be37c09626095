"""SQL dialect layer for the publish sinks (reference insert.py:157-161:
the same chunked ``INSERT ... ON CONFLICT DO UPDATE`` cycle targets both
SQLite and PostgreSQL, switched on the engine's dialect).

One statement generator serves both writers; a ``Dialect`` carries only
what genuinely differs — identifier quoting is shared ANSI double-quote,
ON CONFLICT syntax is identical (PostgreSQL originated it, SQLite
adopted it verbatim), so the delta is the type map and the DB-API
paramstyle placeholder.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def quote_ident(ident: str) -> str:
    """ANSI identifier quoting — keyword-named or oddly-charactered
    columns must not break the generated DDL/DML."""
    return '"' + ident.replace('"', '""') + '"'


@dataclass(frozen=True)
class Dialect:
    name: str
    placeholder: str                      # DB-API paramstyle token
    type_map: dict[str, str] = field(default_factory=dict)
    default_type: str = "TEXT"            # nested/array/map -> JSON text
    native_upsert: bool = False           # UPSERT INTO (CockroachDB)

    def sql_type(self, spark_dtype: str) -> str:
        return self.type_map.get(spark_dtype, self.default_type)


SQLITE = Dialect(
    name="sqlite",
    placeholder="?",
    type_map={
        "string": "TEXT", "int": "INTEGER", "bigint": "INTEGER",
        "smallint": "INTEGER", "tinyint": "INTEGER", "boolean": "INTEGER",
        "double": "REAL", "float": "REAL", "date": "TEXT",
        "timestamp": "TEXT", "timestamp_ntz": "TEXT", "binary": "BLOB",
    },
)

POSTGRES = Dialect(
    name="postgres",
    placeholder="%s",
    type_map={
        "string": "TEXT", "int": "INTEGER", "bigint": "BIGINT",
        "smallint": "SMALLINT", "tinyint": "SMALLINT",
        "boolean": "BOOLEAN", "double": "DOUBLE PRECISION",
        "float": "REAL", "date": "DATE", "timestamp": "TIMESTAMPTZ",
        "timestamp_ntz": "TIMESTAMP", "binary": "BYTEA",
    },
    default_type="JSONB",
)

# The reference folds CockroachDB into the PostgreSQL path
# (utils.py:155 `dialect.name in ["postgresql", "cockroachdb"]`) — wire
# protocol and ON CONFLICT syntax are PG-compatible. First-class here so
# the delta is explicit: INTs are 64-bit (INT8) regardless of declared
# width, and CRDB's native `UPSERT INTO` replaces INSERT..ON CONFLICT —
# same semantics when the conflict target is the primary key (ours
# always is), but skips the conflict-arbiter read in CRDB's KV layer.
COCKROACH = Dialect(
    name="cockroachdb",
    placeholder="%s",
    type_map={
        "string": "TEXT", "int": "INT8", "bigint": "INT8",
        "smallint": "INT8", "tinyint": "INT8",
        "boolean": "BOOL", "double": "DOUBLE PRECISION",
        "float": "REAL", "date": "DATE", "timestamp": "TIMESTAMPTZ",
        "timestamp_ntz": "TIMESTAMP", "binary": "BYTES",
    },
    default_type="JSONB",
    native_upsert=True,
)

DIALECTS = {d.name: d for d in (SQLITE, POSTGRES, COCKROACH)}


def dialect_for(name: str) -> Dialect:
    """Resolve an engine/dialect name; PG-family aliases map like the
    reference's ``is_postgresql`` (utils.py:151-155)."""
    aliases = {"postgresql": "postgres", "pg": "postgres",
               "cockroach": "cockroachdb", "crdb": "cockroachdb",
               "sqlite3": "sqlite"}
    key = aliases.get(name.lower(), name.lower())
    if key not in DIALECTS:
        raise ValueError(f"unknown sink dialect: {name!r} "
                         f"(known: {sorted(DIALECTS)})")
    return DIALECTS[key]


def create_table_sql_from_fields(dialect: Dialect, name: str,
                                 fields: list[tuple[str, str]],
                                 pks: list[str]) -> str:
    """DDL from (column, spark simpleString type) pairs — usable
    straight from a StructType without a live DataFrame (the
    ``schemas create`` dry-run printer, reference cli.py:125-163)."""
    cols = ", ".join(
        f"{quote_ident(c)} {dialect.sql_type(t)}" for c, t in fields
    )
    pk = (f', PRIMARY KEY ({", ".join(quote_ident(c) for c in pks)})'
          if pks else "")
    return f"CREATE TABLE IF NOT EXISTS {quote_ident(name)} ({cols}{pk})"


def create_table_sql(dialect: Dialect, name: str, df: DataFrame,
                     pks: list[str]) -> str:
    return create_table_sql_from_fields(dialect, name, df.dtypes, pks)


def upsert_sql(dialect: Dialect, name: str, cols: list[str],
               pks: list[str]) -> str:
    """K1 statement shape (insert.py:151-161): INSERT .. ON CONFLICT(pks)
    DO UPDATE SET every non-PK column from ``excluded`` — or the
    dialect's native blind upsert (CockroachDB ``UPSERT INTO``) when the
    conflict target is the primary key, which is exactly this shape."""
    attrs = [c for c in cols if c not in pks]
    placeholders = ", ".join(dialect.placeholder for _ in cols)
    if dialect.native_upsert and pks:
        return (
            f'UPSERT INTO {quote_ident(name)} '
            f'({", ".join(quote_ident(c) for c in cols)}) '
            f"VALUES ({placeholders})"
        )
    if pks and attrs:
        conflict = (
            f' ON CONFLICT ({", ".join(quote_ident(c) for c in pks)})'
            " DO UPDATE SET "
            + ", ".join(f"{quote_ident(c)}=excluded.{quote_ident(c)}"
                        for c in attrs)
        )
    elif pks:
        conflict = (f' ON CONFLICT ({", ".join(quote_ident(c) for c in pks)})'
                    " DO NOTHING")
    else:
        conflict = ""
    return (
        f'INSERT INTO {quote_ident(name)} ({", ".join(quote_ident(c) for c in cols)}) '
        f"VALUES ({placeholders})" + conflict
    )
