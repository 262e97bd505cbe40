"""Local mimic of the driver's correctness gate: run every queries() entry
and compare row-count / schema / order-insensitive values against
oracle_sql() via DuckDB. Usage: python scripts/check_oracle.py [sf_dir]."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_df(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        exp = con.execute(oracles[name]).df()
        try:
            g, x = canon(got), canon(exp)
            assert list(g.columns) == list(x.columns), f"cols {list(g.columns)} != {list(x.columns)}"
            assert len(g) == len(x), f"rows {len(g)} != {len(x)}"
            for c in g.columns:
                gc, xc = g[c], x[c]
                # the driver hashes VALUES: float64 12345.0 != int64 12345.
                # Compare dtype kinds strictly so local green predicts the
                # driver (int-vs-float drift is a FAIL, not a tolerance).
                assert gc.dtype.kind == xc.dtype.kind, \
                    f"column {c} dtype {gc.dtype} != oracle {xc.dtype}"
                if gc.dtype.kind == "f" or xc.dtype.kind == "f":
                    # the driver hashes exact VALUES, so floats must be
                    # bit-identical — an allclose tolerance here hid the
                    # profile_lineitem ULP straddle for four rounds
                    # (round-4 verdict item 2). Exact-after-round is the
                    # contract: engine and oracle must compute the SAME
                    # double before any round().
                    gv = gc.astype(float).fillna(-1e30).to_numpy()
                    xv = xc.astype(float).fillna(-1e30).to_numpy()
                    ok = bool(np.array_equal(gv, xv))
                    if not ok:
                        bad = np.flatnonzero(gv != xv)
                        detail = ", ".join(
                            f"[{i}] {gv[i]!r} != {xv[i]!r}"
                            for i in bad[:5])
                        assert ok, (f"column {c}: {len(bad)} float values "
                                    f"not bit-identical: {detail}")
                else:
                    ok = (gc.astype(str).fillna("") == xc.astype(str).fillna("")).all()
                assert ok, f"column {c} mismatch\n{gc.head()}\nvs\n{xc.head()}"
            print(f"PASS {name}: {len(g)} rows, {dt:.1f}s")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
