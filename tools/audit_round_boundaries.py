"""Rounding-boundary flake audit for the oracle suite.

A query whose oracle (and Ray side) applies ``ROUND(expr, k)`` to an
ORDER-DEPENDENT float aggregate can flake: Ray combines block partials
in scheduler order, DuckDB sums in scan order, and when a group's
unrounded value sits within the summation drift of a half boundary the
rounded values differ between runs (observed once for
``events_user_stats`` in a round-4 sweep; measured within one ulp for
``q9_profit_by_nation_year``).  Both were fixed by exact integer-unit
summation on BOTH sides (cents / 10^-4 units — the money-like columns
are 2-decimal data).

This tool re-runs every ``oracle_sql()`` query with each ``ROUND(expr,
k)`` occurrence replaced by the raw ``expr`` (paren-balanced rewrite)
and reports rows whose distance to the nearest half boundary is inside
a drift-proportional margin (pairwise-summation bound ~64·eps·|x|,
×10 safety).  DuckDB-only — no Ray session.

Interpreting hits:
- ``dist=0`` + exact-integer arithmetic (ratios of counts/lengths,
  integer-cents sums): BOTH engines compute bit-identical floats from
  identical integers → deterministic, safe.
- MIN/MAX aggregates: order-independent → deterministic, safe.
- float SUM/AVG over non-integer-valued data with small ``dist``:
  REAL flake risk → convert the query to exact integer units on both
  sides (see events_user_stats / q9 in relational.py).

Run: python tools/audit_round_boundaries.py [--sf-dir DIR]
"""

import argparse
import re
import sys
from pathlib import Path

import duckdb
import numpy as np

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def round_spans(sql: str):
    """(start, end, inner_expr, ndigits) for each ROUND(expr, k) call,
    paren-balanced, top-level comma split from the right."""
    spans = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.IGNORECASE):
        start = m.end()
        depth, i = 1, start
        while depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        body = sql[start:i - 1]
        depth, cut = 0, None
        for j in range(len(body) - 1, -1, -1):
            c = body[j]
            if c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
            elif c == "," and depth == 0:
                cut = j
                break
        if cut is None:
            continue
        expr, nd = body[:cut], body[cut + 1:].strip()
        try:
            nd = int(nd)
        except ValueError:
            continue
        spans.append((m.start(), i, expr.strip(), nd))
    return spans


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    n_hits = 0
    for name, sql in entry.oracle_sql().items():
        for k, (s0, s1, expr, nd) in enumerate(round_spans(sql)):
            mod = sql[:s0] + "(" + expr + ")" + sql[s1:]
            try:
                df = con.execute(mod).df()
            except Exception as ex:  # rewrite outside a SELECT list etc.
                print(f"{name}[{k}] AUDIT-SKIP {str(ex)[:80]}")
                continue
            scale = 10 ** nd
            for col in df.columns:
                v = df[col].to_numpy()
                if v.dtype.kind != "f":
                    continue
                x = v.astype(float) * scale
                frac = np.abs(x - np.floor(x) - 0.5)
                if not len(frac) or np.all(np.isnan(frac)):
                    continue
                idx = int(np.nanargmin(frac))
                d, mag = frac[idx], abs(x[idx])
                drift = 64 * 2.2e-16 * max(mag, 1.0)
                if d < max(10 * drift, 1e-6):
                    n_hits += 1
                    print(f"{name}[{k}] col={col} dist={d:.3e} "
                          f"mag={mag:.3e} driftbound={drift:.3e}"
                          f"{'  (exact half)' if d == 0 else ''}")
    print(f"boundary-margin hits: {n_hits} "
          "(see module docstring for which are safe)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
