#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (sorted columns, sorted
rows, exact values). Usage:
    python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb


def norm_val(v):
    """Normalize value types BEFORE sorting/comparing so a benign type
    difference between engines (int 1 vs float 1.0, numpy scalars,
    bool-as-int) neither reorders rows nor reports spurious
    mismatches — only genuine value diffs fail. Decimal is NOT
    normalized: the driver's hasher cannot digest DECIMAL, so a
    Decimal reaching the value lane is itself a defect (the type ban
    in banned_type catches it first)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return float(v)  # also normalizes numpy floats
    if isinstance(v, int):
        return float(v) if abs(v) < 2**53 else int(v)
    return v


def banned_type(t):
    """The driver's hasher digests scalar BIGINT/DOUBLE/VARCHAR/BOOL/
    DATE/TIMESTAMP only. DECIMAL hashes differently from the equal
    BIGINT value, and ARRAY/LIST/MAP/STRUCT cells crash its pandas
    row-sort (unhashable numpy.ndarray). Gate outputs must project
    such columns to hashable scalars (cast, md5-digest, or explode) —
    this check makes that class fail LOCALLY, before the driver."""
    u = str(t).upper()
    return (u.startswith("DECIMAL") or u.startswith("HUGEINT")
            or u.endswith("[]") or u.startswith("STRUCT")
            or u.startswith("MAP(") or u.startswith("LIST")
            or u.startswith("UNION"))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def canon_types(cols, types):
    """Column types sorted by column name, as strings. Compared PRE-
    normalization: the driver's hash is type-sensitive (DuckDB
    sum(BIGINT) -> HUGEINT vs Spark BIGINT hash-fails even when every
    value is equal), so an oracle/engine type drift must fail here too."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [str(types[i]) for i in order]


def exact_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_types = canon_types(got_rel.columns, got_rel.types)
        got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        try:
            exp_rel = con.sql(sql)
            exp_types = canon_types(exp_rel.columns, exp_rel.types)
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            continue
        hazard = [f"{c} ({t})" for c, t in zip(got_cols, got_types)
                  if banned_type(t)] + \
                 [f"oracle {c} ({t})" for c, t in zip(exp_cols, exp_types)
                  if banned_type(t)]
        if hazard:
            print(f"FAIL {name}: driver-unhashable output type(s): "
                  f"{'; '.join(hazard)}")
            continue
        if got_types != exp_types:
            diffs = [f"{c}: spark={g} oracle={e}"
                     for c, g, e in zip(got_cols, got_types, exp_types)
                     if g != e]
            print(f"FAIL {name}: column types differ ({'; '.join(diffs)})")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        bad = [(g, e) for g, e in zip(got, exp)
               if not all(exact_eq(a, b) for a, b in zip(g, e))]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            continue
        print(f"OK   {name}: {len(got)} rows x {len(got_cols)} cols")
        n_ok += 1
    print(f"== {n_ok}/{len(oracles)} queries match ==")
    return 0 if n_ok == len(oracles) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
