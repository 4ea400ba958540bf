#!/usr/bin/env python3
"""Sweep every registered query's OUTPUT dtypes on both engines.

Usage: python3 tools/dtype_sweep.py <sfDir> <verifyOutDir>

Round-9 postmortem: q119/q122/q138 were cell-exact but driver-hash-red
because their outputs carried 128-bit numerics (Spark decimal128 vs
DuckDB HUGEINT/DECIMAL) that the driver's hasher normalizes differently
per engine (pandas renders HUGEINT as float64 -> "134.0" vs "134";
decimal128 as Decimal('199.4200000000') vs 199.42). Any query whose
output leaves the hasher-safe set is a latent red on the next testdata
regen, even if it passes the cell compare today.

Safe set (observed across all 171 driver-green round-9 queries):
integers up to int64, float64, utf8, date32, timestamp, bool.
Flags everything else on EITHER engine, with the offending columns.
"""
import json
import sys

import duckdb
import pyarrow as pa
import pyarrow.dataset as pads

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

SAFE_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "DOUBLE", "VARCHAR", "DATE",
             "BOOLEAN"}


def arrow_safe(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) and t.bit_width <= 64
            and not (pa.types.is_unsigned_integer(t) and t.bit_width == 64)
            ) or pa.types.is_float64(t) or pa.types.is_string(t) \
        or pa.types.is_large_string(t) or pa.types.is_date32(t) \
        or pa.types.is_timestamp(t) or pa.types.is_boolean(t)


def duck_safe(tname: str) -> bool:
    return tname in SAFE_DUCK or tname.startswith("TIMESTAMP")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        bad = []
        try:
            schema = pads.dataset(f"{out_dir}/{name}").schema
            for f in schema:
                if not arrow_safe(f.type):
                    bad.append(f"spark:{f.name}={f.type}")
        except Exception as e:
            bad.append(f"spark:unreadable:{e}")
        try:
            for row in con.execute(f"DESCRIBE {sql}").fetchall():
                cname, ctype = row[0], row[1]
                if not duck_safe(ctype):
                    bad.append(f"duck:{cname}={ctype}")
        except Exception as e:
            bad.append(f"duck:error:{e}")
        if bad:
            n_bad += 1
            print(f"UNSAFE {name}: {'; '.join(bad)}")
    print(f"== {len(oracle) - n_bad}/{len(oracle)} dtype-safe, "
          f"{n_bad} unsafe ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
