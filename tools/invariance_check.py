#!/usr/bin/env python3
"""Compare two Verify dump trees (e.g. shuffle-partitions 3 vs 8) for
bit-identical per-query results — the full-registry partition-count
invariance proof. Usage:

    python3 tools/invariance_check.py /tmp/v11_p3 /tmp/v11_p8

(Dev tool only — the shipped library is pure Scala/Spark.)
"""
import glob
import os
import sys

import duckdb


def vals_equal(x, y):
    # NaN-aware: a bit-identical dump pair containing NaN must compare
    # equal (Python tuple equality would report NaN != NaN)
    if isinstance(x, float) and isinstance(y, float):
        import math
        if math.isnan(x) and math.isnan(y):
            return True
    return x == y


def rows_equal(ra, rb):
    return len(ra) == len(rb) and all(
        len(x) == len(y) and all(map(vals_equal, x, y))
        for x, y in zip(ra, rb))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    qa = {os.path.basename(p) for p in glob.glob(f"{a}/q*")}
    qb = {os.path.basename(p) for p in glob.glob(f"{b}/q*")}
    shared = sorted(qa & qb)
    only = sorted(qa ^ qb)
    if only:
        print(f"NOTE: {len(only)} queries present on one side only "
              f"(skipped): {', '.join(only)}")
    n_pass = n_fail = 0
    for q in shared:
        try:
            # ORDER BY every column by name => layout-independent compare
            cols = [d[0] for d in con.execute(
                f"DESCRIBE SELECT * FROM '{a}/{q}/*.parquet'").fetchall()]
            order = ", ".join(f'"{c}"' for c in sorted(cols))
            ra = con.execute(
                f"SELECT * FROM '{a}/{q}/*.parquet' ORDER BY {order}"
            ).fetchall()
            rb = con.execute(
                f"SELECT * FROM '{b}/{q}/*.parquet' ORDER BY {order}"
            ).fetchall()
        except Exception as e:
            print(f"ERROR {q}: {e}")
            n_fail += 1
            continue
        if rows_equal(ra, rb):
            n_pass += 1
        else:
            n_fail += 1
            # NaN-aware (vals_equal), or the reported index can point
            # at a bit-identical NaN row instead of the real divergence
            diff = [i for i, (x, y) in enumerate(zip(ra, rb))
                    if not (len(x) == len(y)
                            and all(map(vals_equal, x, y)))]
            print(f"MISMATCH {q}: rows {len(ra)} vs {len(rb)}, "
                  f"first differing row idx "
                  f"{diff[0] if diff else 'len-only'}")
    print(f"== {n_pass} identical, {n_fail} mismatched, "
          f"{len(shared)} compared")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
