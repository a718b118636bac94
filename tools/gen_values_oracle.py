#!/usr/bin/env python3
"""Generate a DuckDB VALUES-table oracle from a Verify parquet output.

For deterministic fixture queries (DemoAssay pipelines, seeded IVF) the
oracle is a hand-pinned expected table; this tool renders the CURRENT
engine output as exact SQL literals so a human can review the values and
paste them into Queries.oracleSql. Floats are rendered with repr()
(shortest round-trip — DuckDB's strtod parse restores the identical
binary64), so the comparison stays bit-exact.

Usage: python3 tools/gen_values_oracle.py <verifyOutDir> <query> <orderByCols>
"""
import glob
import math
import sys

import pandas as pd
import pyarrow.parquet as pq


def sql_literal(v, typ):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        # Spark NaN doubles are real values; missing values arrive as None
        return "'NaN'::DOUBLE" if typ == "DOUBLE" else "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ in ("BIGINT", "INTEGER"):
        return str(int(v))
    if typ == "DOUBLE":
        if math.isnan(v):
            return "'NaN'::DOUBLE"
        if math.isinf(v):
            return ("'Infinity'" if v > 0 else "'-Infinity'") + "::DOUBLE"
        # string literal + cast: DuckDB parses bare numeric literals as
        # DECIMAL, which truncates sub-ULP digits; strtod on the quoted
        # repr() restores the exact binary64
        return f"'{repr(float(v))}'::DOUBLE"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def duck_type(arrow_type):
    t = str(arrow_type)
    if t in ("int64", "uint32"):
        return "BIGINT"
    if t in ("int32", "int16", "int8"):
        return "INTEGER"
    if t in ("double", "float64"):
        return "DOUBLE"
    if t in ("float", "float32"):
        return "FLOAT"
    if t == "bool":
        return "BOOLEAN"
    if t in ("string", "large_string", "utf8"):
        return "VARCHAR"
    if t == "null":  # Spark NullType column (all-NULL literal)
        return "VARCHAR"
    raise SystemExit(f"unhandled arrow type {t} — extend duck_type")


def main():
    out_dir, query, order_by = sys.argv[1], sys.argv[2], sys.argv[3]
    files = sorted(glob.glob(f"{out_dir}/{query}/*.parquet"))
    schema = pq.read_schema(files[0])
    # pyarrow to_pylist preserves NULL (None) vs NaN — pandas would fold
    # both to NaN and the oracle would mislabel true nulls
    import pyarrow as pa
    table = pa.concat_tables([pq.read_table(f) for f in files])
    cols = table.column_names
    types = {f.name: duck_type(f.type) for f in schema}
    order_cols = [c.strip() for c in order_by.split(",")]
    data = table.to_pylist()
    data.sort(key=lambda r: tuple(r[c] for c in order_cols))

    rows = []
    for r in data:
        vals = ", ".join(sql_literal(r[c], types[c]) for c in cols)
        rows.append(f"({vals})")
    select = ", ".join(f'c{i}::{types[c]} AS "{c}"' for i, c in enumerate(cols))
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    order = ", ".join(f'"{c}"' for c in order_cols)
    sql = (f"SELECT {select} FROM (VALUES {', '.join(rows)}) AS t({names}) "
           f"ORDER BY {order}")
    print(sql)


if __name__ == "__main__":
    main()
