#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle and diff them. Usage:

    python3 tools/check.py [sfDir] [outDir]

(This is a dev tool only — the shipped library is pure Scala/Spark.)
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    rows_only = []
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(exp, got)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    for name, n in rows_only:
        tag = "ok" if n > 0 else "EMPTY"
        print(f"ROWS-ONLY {name}: {n} rows [{tag}]")
    print(f"== {n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


def compare(exp, got):
    ecols, gcols = sorted(exp.columns), sorted(got.columns)
    if ecols != gcols:
        return False, f"columns differ: oracle={ecols} got={gcols}"
    exp, got = exp[ecols], got[gcols]
    if len(exp) != len(got):
        return False, f"row count differs: oracle={len(exp)} got={len(got)}"
    # Type strictness: the driver hashes TYPED values, so a DuckDB HUGEINT
    # (surfaced as float64/object here) vs a Spark BIGINT (int64) fails
    # its hash even when every value prints identically — e.g. one uncast
    # sum() in a UNION ALL branch unifying the whole column to HUGEINT
    # (q116, r4). Compare dtype KIND (int-vs-int is fine: int32 vs int64
    # queries are green in the driver series; int-vs-float/object is the
    # hash-breaking class) so this gate catches it before the driver does.
    for c in ecols:
        ek = getattr(exp[c].dtype, "kind", "O")
        gk = getattr(got[c].dtype, "kind", "O")
        if ek != gk:
            return False, (f"col {c} dtype kind differs: "
                           f"oracle={exp[c].dtype} got={got[c].dtype}")
    # The driver's pandas comparison lexsorts result cells and raises
    # "unhashable type: numpy.ndarray" on array/list/dict cells (q169,
    # r8) — this gate must fail the same class locally first. Any
    # nested cell in either frame is a harness-compat defect: oracled
    # queries must string-join lists (the q70 convention).
    # Scan EVERY value (a first-row None/str with a later-row ndarray
    # must still fail here, not in the driver), and whitelist the
    # scalar object types DuckDB legitimately emits in object-dtype
    # frames (date/datetime/Decimal/numpy scalars hash fine).
    import datetime
    import decimal
    import numpy as np
    scalar_ok = (str, bytes, bool, int, float, datetime.date,
                 datetime.datetime, datetime.time, decimal.Decimal,
                 np.generic)
    for c in ecols:
        for frame, side in ((exp, "oracle"), (got, "got")):
            if len(frame) and frame[c].dtype.kind == "O":
                for v in frame[c]:
                    if v is not None and not isinstance(v, scalar_ok):
                        return False, (
                            f"col {c} ({side}) has nested cell type "
                            f"{type(v).__name__}: the driver harness "
                            f"cannot hash array/map cells — string-join "
                            f"it (q70 convention)")
    for c in ecols:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if not eq(a, b):
                return False, (f"col {c} row {i}: oracle={a!r} got={b!r}")
    return True, ""


def eq(a, b):
    if a is None or b is None:
        return (a is None or (isinstance(a, float) and math.isnan(a))) and \
               (b is None or (isinstance(b, float) and math.isnan(b)))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


if __name__ == "__main__":
    main()
