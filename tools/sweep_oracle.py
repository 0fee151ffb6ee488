"""Full driver-style correctness sweep: run EVERY ``queries()`` entry and
compare each oracle-backed one against its ``oracle_sql()`` DuckDB result
(sorted-column, value-tolerant frame equality — the same normalization the
driver's CORRECTNESS gate applies).

``tests/test_oracle.py`` runs this logic at sf0.001 inside the pytest
suite; this standalone tool is for the sf0.01 (or any) full sweep used in
the round evidence records:

    python tools/sweep_oracle.py --sf-dir /root/testdata/sf0.01 --num-cpus 16

Owns its Ray session (guarded) — do not import from library code.
"""

import argparse
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    ap.add_argument("--slow-sec", type=float, default=15.0)
    args = ap.parse_args()

    # bench.py's Ray Data log silencing (schema-hash / empty-RefBundle
    # warnings) — must run BEFORE ray.init so workers inherit the env
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import _quiet_ray_data_logs

    _quiet_ray_data_logs()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, osql = entry.queries(), entry.oracle_sql()
    names = sorted(qs) if args.only is None else [n for n in sorted(qs)
                                                  if n in set(args.only)]
    fails, slow, oracle_ok = [], [], 0
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            got = qs[name](args.sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            if isinstance(got, pa.Table):
                got = got.to_pandas()
            status = f"rows={len(got)}"
            if name in osql:
                exp = con.execute(osql[name]).fetchdf()
                g = (got.reindex(sorted(got.columns), axis=1)
                        .sort_values(sorted(got.columns))
                        .reset_index(drop=True))
                x = (exp.reindex(sorted(exp.columns), axis=1)
                        .sort_values(sorted(exp.columns))
                        .reset_index(drop=True))
                try:
                    pd.testing.assert_frame_equal(
                        g, x, check_dtype=False, atol=1e-9,
                        check_exact=False)
                    status += " ORACLE-OK"
                    oracle_ok += 1
                except AssertionError as ex:
                    status += " ORACLE-MISMATCH"
                    fails.append((name, str(ex)[:150]))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            status = f"ERROR {type(ex).__name__}: {str(ex)[:120]}"
            fails.append((name, status))
        dt = time.perf_counter() - t0
        if dt > args.slow_sec:
            slow.append((name, round(dt, 1)))
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)",
              flush=True)

    print("\n==== SUMMARY ====")
    print(f"queries run: {len(names)}  oracle-ok: {oracle_ok}  "
          f"fails: {len(fails)}")
    for n, m in fails:
        print(" FAIL", n, m)
    print(f"slow (>{args.slow_sec:.0f}s):", slow)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
