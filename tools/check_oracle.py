#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), replays each oracle SQL in DuckDB
against the same testdata tables, and compares results.

Compare rule (mirrors the documented driver behavior): columns sorted by
name, then row-set hashed. Here we diff values exactly (floats must be
bit-identical) and print per-query verdicts with first differences.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Round-12: per-SF pin overlays closed the SF matrix — Verify writes the
# SF-matching pins (PinnedOraclesSf0001 / PinnedOraclesSf01) into
# oracle_sql.json when run at sf0.001 / sf0.1, so NOTHING skips anymore.
# Re-render the overlays after a testdata regeneration or any pinned-query
# change:  python3 tools/gen_pins.py <verifyOutAtThatSf> <names> --sf 0001


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(cols)), cols), key=lambda t: cols[t[0]])], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        import os
        marker = f"{out_dir}/{name}/_FAILED"
        if os.path.exists(marker):
            print(f"FAIL {name}: query CRASHED: {open(marker).read().strip()}")
            fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            fail += 1
            continue
        try:
            d_rel = con.sql(sql)
            d_cols, d_rows = canon(d_rel.fetchall(), d_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            fail += 1
            continue
        if s_rows == d_rows:
            print(f"ok   {name} ({len(s_rows)} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"  first diff at {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                n = min(len(s_rows), len(d_rows))
                print(f"  prefix equal; extra rows from {n}:")
                print(f"    spark extra: {s_rows[n:n+2]}")
                print(f"    duck  extra: {d_rows[n:n+2]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")

    # Local logic lint: replay the live re-derivations of the VALUES-pinned
    # oracles (rederive_sql.json). These run at EVERY SF — the pin proves
    # environment-independence at the gate SF, the re-derivation keeps
    # proving the logic everywhere. Exact compare, same canon as above.
    import os
    rpath = f"{out_dir}/rederive_sql.json"
    if os.path.exists(rpath):
        rederive = json.load(open(rpath))
        rok = rfail = 0
        print(f"\n-- rederive lint ({len(rederive)} pinned queries) --")
        for name, sql in sorted(rederive.items()):
            try:
                spark_rel = con.sql(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
                s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
                d_rel = con.sql(sql)
                d_cols, d_rows = canon(d_rel.fetchall(), d_rel.columns)
            except Exception as e:
                print(f"RFAIL {name}: {e}")
                rfail += 1
                continue
            if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
                print(f"RFAIL {name}: columns spark={s_cols} duck={d_cols}")
                rfail += 1
            elif s_rows == d_rows:
                print(f"rok  {name} ({len(s_rows)} rows)")
                rok += 1
            else:
                print(f"RFAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
                for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                    if a != b:
                        print(f"  first diff at {i}:\n    spark={a}\n    duck ={b}")
                        break
                rfail += 1
        print(f"rederive: {rok} ok, {rfail} fail")
        fail += rfail
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
