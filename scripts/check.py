#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: reads each query's
parquet result, runs its DuckDB oracle SQL against the same testdata tables,
and compares row count, column set, and exact values (columns sorted by
name, rows compared in result order and as sorted multisets).

Replicates the driver's comparison discipline exactly (r5 post-mortem):
the driver converts both arrow tables to pandas, selects columns sorted by
name, lexsorts rows with `DataFrame.sort_values(by=<all columns>)`, then
hashes the sorted cell values. Two consequences this script must reproduce:
  1. pandas sort_values CRASHES on list/array cells (`unhashable type:
     numpy.ndarray`) — a query whose output schema has a top-level
     array/map column fails driver-side even when values match (r5
     q_token_encode).
  2. the hash sees dtype: DuckDB HUGEINT materializes as float64 in
     pandas, so an oracle SUM() without a BIGINT cast mismatches a Spark
     int64 on dtype alone (4568.0 vs 4568 — r5 q_bpe_merges).

Usage: python3 scripts/check.py /root/testdata/sf0.01 target/verify_out
"""
import hashlib
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def driver_hash(tbl, cols):
    """Driver-faithful hash: pandas lexsort over ALL columns, then md5 of
    the str()-rendered cells. Raises (like the driver) on unsortable
    list/array cells; distinguishes 4568 from 4568.0 (dtype-sensitive)."""
    df = tbl.to_pandas()[cols]
    df = df.sort_values(by=cols).reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update("|".join(str(norm(v)) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleUp tier dirs are
        # directory tables — glob the parts in that case
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        g_cols, w_cols = sorted(got.column_names), sorted(want.column_names)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            failures += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {want.num_rows}")
            failures += 1
            continue
        g = got.select(g_cols).to_pylist()
        w = want.select(w_cols).to_pylist()
        bad = None
        for i, (gr, wr) in enumerate(zip(g, w)):
            grn = {k: norm(v) for k, v in gr.items()}
            wrn = {k: norm(v) for k, v in wr.items()}
            if grn != wrn:
                bad = (i, grn, wrn)
                break
        if bad:
            i, gr, wr = bad
            diff = {k: (gr[k], wr[k]) for k in gr if gr[k] != wr[k]}
            print(f"FAIL {name}: row {i} differs: {diff}")
            failures += 1
            continue
        # Driver-faithful gate: pandas lexsort + dtype-sensitive hash.
        try:
            gh = driver_hash(got, g_cols)
            wh = driver_hash(want, w_cols)
        except Exception as e:
            print(f"FAIL {name}: driver-sort/hash error (unsortable column?): {e}")
            failures += 1
            continue
        if gh != wh:
            print(f"FAIL {name}: driver hash mismatch (dtype difference?) {gh} != {wh}")
            failures += 1
        else:
            print(f"OK   {name}: {got.num_rows} rows, {len(g_cols)} cols")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
