#!/usr/bin/env python3
"""Render reviewed VALUES-pin oracles into src/main/scala/graft/PinnedOracles.scala.

Pin rationale (round-8 policy): an oracle whose per-row values are
re-derived transcendentals (ln/log2) in the gate's DuckDB can flip the
last rounded digit under a different libm — round-then-decimal at 9 dp
went driver-red two rounds in a row. A VALUES pin rendered from the
engine's own verified output is the only oracle class with a perfect
driver record. The live SQL re-derivations stay in Queries.rederiveSql
and are replayed locally by tools/check_oracle.py, so the pin proves
environment-independence while the re-derivation keeps proving logic.

Literal rules match gen_values_oracle.py: doubles render via repr()
('<repr>'::DOUBLE — strtod restores the identical binary64), decimals
render exact digit strings at their declared scale, NULL vs NaN is
preserved through pyarrow (pandas would fold both to NaN).

Usage: python3 tools/gen_pins.py <verifyOutDir> [query1,query2,...]
Rewrites src/main/scala/graft/PinnedOracles.scala with EXACTLY the named
pins. The special name "all" (and the no-names default) expands to every
pin currently in PinnedOracles.scala — use `all,new_name` to ADD a pin
without dropping the rest; <verifyOutDir> must contain outputs for every
rendered name.
"""
import glob
import math
import sys
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

REPO = "/root/repo"


def duck_type(t):
    s = str(t)
    if s in ("int64", "uint32"):
        return "BIGINT"
    if s in ("int32", "int16", "int8"):
        return "INTEGER"
    if s in ("double", "float64"):
        return "DOUBLE"
    if s in ("float", "float32"):
        return "FLOAT"
    if s == "bool":
        return "BOOLEAN"
    if s in ("string", "large_string", "utf8"):
        return "VARCHAR"
    if s.startswith("decimal128("):
        p, sc = s[len("decimal128("):-1].split(",")
        return f"DECIMAL({p.strip()},{sc.strip()})"
    raise SystemExit(f"unhandled arrow type {s} — extend duck_type")


def sql_literal(v, typ):
    if v is None:
        return "NULL"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ in ("BIGINT", "INTEGER"):
        return str(int(v))
    if typ in ("DOUBLE", "FLOAT"):
        f = float(v)
        if math.isnan(f):
            return f"'NaN'::{typ}"
        if math.isinf(f):
            return ("'Infinity'" if f > 0 else "'-Infinity'") + f"::{typ}"
        # quoted repr + cast: a bare literal would parse as DECIMAL and
        # truncate sub-ULP digits; strtod on the repr restores the bits
        return f"'{repr(f)}'::{typ}"
    if typ.startswith("DECIMAL"):
        assert isinstance(v, Decimal), f"expected Decimal, got {type(v)}"
        return f"'{v}'::{typ}"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def scala_str(s):
    """ASCII-only double-quoted Scala literal — survives any encoding."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif 32 <= ord(ch) < 127:
            out.append(ch)
        else:
            out.append(f"\\u{ord(ch):04x}")
    return '"' + "".join(out) + '"'


def render_pin(out_dir, query):
    files = sorted(glob.glob(f"{out_dir}/{query}/*.parquet"))
    if not files:
        raise SystemExit(f"no parquet for {query} under {out_dir}")
    table = pa.concat_tables([pq.read_table(f) for f in files])
    cols = table.column_names
    types = [duck_type(f.type) for f in table.schema]
    data = table.to_pylist()
    # total order on the stringified tuple: the gate comparator sorts rows
    # itself, this just keeps the rendered pin diff-stable across runs
    data.sort(key=lambda r: tuple(str(r[c]) for c in cols))
    rows = ["(" + ", ".join(sql_literal(r[c], t) for c, t in zip(cols, types)) + ")"
            for r in data]
    select = ", ".join(f'c{i}::{t} AS "{c}"' for i, (c, t) in enumerate(zip(cols, types)))
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    prefix = f"SELECT {select} FROM (VALUES "
    suffix = f") AS t({names}) ORDER BY ALL"
    return prefix, rows, suffix, len(data)


def existing_pin_names():
    """Pin names already in PinnedOracles.scala (the `v_<name>` vals)."""
    import re
    path = f"{REPO}/src/main/scala/graft/PinnedOracles.scala"
    try:
        src = open(path).read()
    except FileNotFoundError:
        return []
    return re.findall(r"private val v_(\w+): Seq\[String\]", src)


def main():
    out_dir = sys.argv[1]
    # This tool REWRITES PinnedOracles.scala with exactly the named pins —
    # a subset would silently DROP every other pin (it bit us in round 8:
    # a 1-name call wiped 13 pins; the OracleParitySpec closure test is the
    # backstop). Default (no names) re-renders every EXISTING pin from the
    # given Verify dir, so adding one pin is:
    #   python3 tools/gen_pins.py <dirWithAllPinOutputs> all,new_name
    # where "all" expands to the current pin set.
    #
    # Per-SF overlay mode (round-12, closes the SF matrix): a trailing
    #   --sf 0001   (or 01)
    # writes object PinnedOraclesSf0001 / PinnedOraclesSf01 instead —
    # Verify overlays these maps onto oracle_sql.json when its sfDir ends
    # with sf0.001 / sf0.1, so every SF sweep checks pins rendered from
    # ITS OWN tables (the driver's sf0.01 run is untouched). Render from a
    # Verify output dir produced at THAT SF, naming exactly the
    # SF-dependent pinned queries:
    #   python3 tools/gen_pins.py /tmp/v_sf0001 <names> --sf 0001
    argv = list(sys.argv[1:])
    sf_tag = None
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_tag = argv[i + 1]
        del argv[i:i + 2]
    raw = argv[1].split(",") if len(argv) > 1 else ["all"]
    queries = []
    for q in raw:
        queries.extend(existing_pin_names() if q == "all" else [q])
    queries = sorted(set(queries))
    print(f"rendering {len(queries)} pins from {out_dir}")
    entries = []
    for q in sorted(queries):
        prefix, rows, suffix, n = render_pin(out_dir, q)
        # chunk the VALUES body so no single Scala literal nears the JVM's
        # 64 KiB string-constant limit
        chunks, cur, cur_len = [], [], 0
        for r in rows:
            cur.append(r)
            cur_len += len(r) + 2
            if cur_len > 20000:
                chunks.append(", ".join(cur))
                cur, cur_len = [], 0
        if cur:
            chunks.append(", ".join(cur))
        entries.append((q, prefix, chunks, suffix, n))
        print(f"pinned {q}: {n} rows, {len(chunks)} chunk(s)")

    obj = "PinnedOracles" if sf_tag is None else f"PinnedOraclesSf{sf_tag}"
    lines = []
    lines.append("package graft")
    lines.append("")
    lines.append("/** Machine-rendered VALUES-pin oracles — regenerate with")
    lines.append("  *   python3 tools/gen_pins.py <verifyOutDir> <names>" +
                 ("" if sf_tag is None else f" --sf {sf_tag}"))
    lines.append("  * after ANY change to a pinned query's logic or to the " +
                 ("sf0.01" if sf_tag is None else f"sf{sf_tag[0]}.{sf_tag[1:]}"))
    lines.append("  * testdata (see tools/gen_pins.py header for the pin policy;")
    lines.append("  * the live re-derivations live in Queries.rederiveSql).")
    lines.append("  * DO NOT EDIT BY HAND.")
    lines.append("  */")
    lines.append(f"object {obj} {{")
    for q, prefix, chunks, suffix, n in entries:
        safe = q.replace("-", "_")
        lines.append(f"  // {q}: {n} rows")
        lines.append(f"  private val v_{safe}: Seq[String] = Seq(")
        for c in chunks:
            lines.append(f"    {scala_str(c)},")
        lines.append("  )")
        lines.append(f"  private val q_{safe}: String =")
        lines.append(f"    {scala_str(prefix)} + v_{safe}.mkString(\", \") + {scala_str(suffix)}")
        lines.append("")
    lines.append("  val sql: Map[String, String] = Map(")
    for q, _, _, _, _ in entries:
        safe = q.replace("-", "_")
        lines.append(f'    "{q}" -> q_{safe},')
    lines.append("  )")
    lines.append("}")
    path = f"{REPO}/src/main/scala/graft/{obj}.scala"
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({len(entries)} pins)")


if __name__ == "__main__":
    main()
