#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ spark parquet result and compares it
against the DuckDB execution of <verifyOutDir>/oracle_sql.json[name] over
the <sfDir>/*.parquet tables: schema (column names sorted), row count,
and exact cell values after canonical sorting.

Round-10 hardening (round-9 postmortem): the driver saw 3 hash-reds
(q119/q122/q138) that this replica passed, because their outputs carried
128-bit numerics (Spark decimal128 vs DuckDB HUGEINT/DECIMAL) which the
driver's hasher normalizes differently per engine even when cell-equal
(a pandas round-trip renders HUGEINT as float64 -> "134.0" vs "134",
decimal128 as Decimal('199.4200000000') vs 199.42). Two new checks make
local green imply driver green:
  1. DTYPE GATE — fail any query whose Spark or DuckDB output type
     leaves the hasher-safe set {ints<=64bit, float64, string, date,
     timestamp, bool} (every round-9 driver-green query stayed inside
     it; every driver-red left it).
  2. PANDAS-MIRROR HASH — both sides round-trip through pandas (the
     driver's observable normalization path) and must hash equal after
     column-name sort + row sort.
"""
import datetime
import hashlib
import json
import math
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SAFE_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "DOUBLE", "VARCHAR", "DATE",
             "BOOLEAN"}


def arrow_unsafe_cols(schema):
    """Columns whose arrow type leaves the hasher-safe set."""
    def ok(t):
        return (pa.types.is_integer(t) and t.bit_width <= 64
                and not (pa.types.is_unsigned_integer(t)
                         and t.bit_width == 64)) \
            or pa.types.is_float64(t) or pa.types.is_string(t) \
            or pa.types.is_large_string(t) or pa.types.is_date32(t) \
            or pa.types.is_timestamp(t) or pa.types.is_boolean(t)
    return [f"{f.name}={f.type}" for f in schema if not ok(f.type)]


def duck_unsafe_cols(con, sql):
    return [f"{r[0]}={r[1]}" for r in con.execute(f"DESCRIBE {sql}")
            .fetchall()
            if not (r[1] in SAFE_DUCK or r[1].startswith("TIMESTAMP"))]


def pandas_hash(df):
    """Mirror of the driver's observable normalization: pandas frame,
    columns sorted by name, rows sorted by stringified tuple, sha256
    over the str() of every cell (so float64 134.0 -> '134.0' and
    Decimal('134') -> '134' hash DIFFERENTLY, as the driver sees)."""
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode() + b"\x1e")
    return h.hexdigest()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime.datetime):
        # Spark parquet timestamps come back tz-aware UTC; DuckDB returns
        # naive. Compare both as naive UTC.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pads.dataset(f"{out_dir}/{name}").to_table()
            s_cols = tbl.column_names
            s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            d_tbl = con.execute(sql).fetch_arrow_table()
            d_cols = d_tbl.column_names
            d_rows = [tuple(r[c] for c in d_cols)
                      for r in d_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        unsafe = ([f"spark:{c}" for c in arrow_unsafe_cols(tbl.schema)]
                  + [f"duck:{c}" for c in duck_unsafe_cols(con, sql)])
        if unsafe:
            print(f"FAIL {name}: unsafe output dtypes (driver hasher "
                  f"normalizes these differently per engine): "
                  f"{'; '.join(unsafe)}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]} cols={sc}")
            n_fail += 1
            continue
        s_pd, d_pd = tbl.to_pandas(), d_tbl.to_pandas()
        for frame in (s_pd, d_pd):
            for c in frame.columns:
                if str(frame[c].dtype).startswith("datetime64") \
                        and getattr(frame[c].dt, "tz", None) is not None:
                    frame[c] = frame[c].dt.tz_convert("UTC") \
                        .dt.tz_localize(None)
        if pandas_hash(s_pd) != pandas_hash(d_pd):
            print(f"FAIL {name}: pandas-mirror hash mismatch (cell "
                  f"compare passed — a normalization gap the driver "
                  f"will flag)")
            n_fail += 1
            continue
        print(f"OK   {name} ({len(sr)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
