#!/usr/bin/env python3
"""Driver-gate postmortem harness (VERDICT r7 item 3).

The driver's correctness gate hashes a query's result set; a red row tells
you THAT the hashes differ, not WHY. Two rounds of red-row debugging showed
the divergence can live at either of two layers:

  1. VALUE layer — the cell values differ (float ulp wobble, libm drift).
     Visible under a stringified canonicalization.
  2. PHYSICAL-TYPE layer — values are equal but the carrying types differ
     (r7: DuckDB HUGEINT from an uncast sum() chain vs Spark BIGINT in
     `tdp_graph_rank`; DuckDB BIGINT from unnest(range(..)) vs Spark
     INTEGER in `tdp_psi_drift`). Invisible when stringified; fatal to a
     type-tagged hasher.

This tool canonicalizes a Verify output dir and its DuckDB oracle replay
BOTH ways and reports which layer (if any) diverges, per query:

  typed  : rows as (arrow_type, value) pairs, columns sorted by name
  string : rows as str(value) only, columns sorted by name

A query red in the driver gate but `string=OK typed=DIFF` here is a
physical-type mismatch — fix the cast, not the math. `string=DIFF` is a
value mismatch — look for transcendental/decimal drift (and pin it, per
the round-8 oracle policy in OracleParitySpec).

First test cases (reproduce the r7 finding against a pre-fix checkout):
  tdp_graph_rank  -> string=OK typed=DIFF (rank_fp int64 vs HUGEINT)
  tdp_psi_drift   -> string=OK typed=DIFF (bucket int32 vs int64)

Usage:
  python3 tools/hash_canon.py <sfDir> <verifyOutDir> [query ...]
With no query names, runs every entry in oracle_sql.json.
"""
import glob
import hashlib
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_string(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def canon(table, typed):
    """arrow Table -> (schema_desc, sorted row tuples) under one canon."""
    names = table.column_names
    order = sorted(range(len(names)), key=lambda i: names[i].lower())
    cols = [table.column(i).to_pylist() for i in order]
    types = [str(table.schema.field(i).type) for i in order]
    schema = [(names[i].lower(), types[j] if typed else "*")
              for j, i in enumerate(order)]
    rows = []
    for r in range(table.num_rows):
        if typed:
            rows.append(tuple((types[c], cell_string(cols[c][r]))
                              for c in range(len(cols))))
        else:
            rows.append(tuple(cell_string(cols[c][r])
                              for c in range(len(cols))))
    rows.sort()
    return schema, rows


def digest(schema, rows):
    h = hashlib.sha256()
    h.update(json.dumps(schema).encode())
    for r in rows:
        h.update("\x1f".join(x if isinstance(x, str) else "\x1e".join(x)
                             for x in r).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def first_diff(a_schema, a_rows, b_schema, b_rows, label_a, label_b):
    if a_schema != b_schema:
        print(f"    schema {label_a}={a_schema}")
        print(f"    schema {label_b}={b_schema}")
        return
    if len(a_rows) != len(b_rows):
        print(f"    row count {label_a}={len(a_rows)} {label_b}={len(b_rows)}")
        return
    for i, (x, y) in enumerate(zip(a_rows, b_rows)):
        if x != y:
            print(f"    first row diff at sorted index {i}:")
            print(f"      {label_a}={x}")
            print(f"      {label_b}={y}")
            return


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = sorted(oracle)
    any_diff = 0
    for name in names:
        if name not in oracle:
            print(f"{name}: not in oracle_sql.json")
            any_diff = 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"{name}: no Verify parquet output")
            any_diff = 1
            continue
        spark_tbl = pq.read_table(files[0]) if len(files) == 1 else \
            pq.ParquetDataset(files).read()
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"{name}: oracle error {e}")
            any_diff = 1
            continue
        verdicts = {}
        detail = []
        for mode, typed in (("typed", True), ("string", False)):
            ss, sr = canon(spark_tbl, typed)
            ds, dr = canon(duck_tbl, typed)
            same = digest(ss, sr) == digest(ds, dr)
            verdicts[mode] = "OK" if same else "DIFF"
            if not same:
                detail.append((mode, ss, sr, ds, dr))
        line = f"{name}: typed={verdicts['typed']} string={verdicts['string']}"
        if verdicts["typed"] == "DIFF" and verdicts["string"] == "OK":
            line += "  <- PHYSICAL-TYPE mismatch: fix a cast, values are equal"
        elif verdicts["string"] == "DIFF":
            line += "  <- VALUE mismatch: engine/libm drift or logic bug"
        print(line)
        for mode, ss, sr, ds, dr in detail:
            print(f"  [{mode}]")
            first_diff(ss, sr, ds, dr, "spark", "duck")
        if detail:
            any_diff = 1
    return any_diff


if __name__ == "__main__":
    sys.exit(main())
