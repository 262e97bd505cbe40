"""Incremental materialized-view maintenance (state/matview.py): the
view must equal a full recompute after EVERY commit — across inserts,
updates, deletes, purge/truncate maintenance, and refresh resume."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedAgg


def mk(op, seq, url, ts, grp, val):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "grp": grp, "val": val}


def _contrib_impl(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"grp": df["grp"],
                         "val": df["val"].fillna(0).astype("int64")})


def make_view(lake, root):
    # nested def: pickled by VALUE into Ray workers (a module-level
    # function in a test file would pickle by reference and fail import)
    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"grp": df["grp"],
                             "val": df["val"].fillna(0).astype("int64")})

    return MaterializedAgg(lake, root, contrib, group_cols=["grp"],
                           value_cols=["val"],
                           read_columns=["grp", "val"])


def recompute(lake) -> pd.DataFrame:
    live = lake.read_pandas()
    if not len(live):
        return pd.DataFrame(columns=["grp", "n_live", "sum_val"])
    out = _contrib_impl(live)
    g = out.groupby("grp", sort=True)
    return pd.DataFrame({"grp": g.size().index,
                         "n_live": g.size().to_numpy().astype("int64"),
                         "sum_val": g["val"].sum().to_numpy()
                         .astype("int64")})


def assert_view_equals_recompute(view_df, lake):
    want = recompute(lake)
    got = view_df.sort_values("grp").reset_index(drop=True)[
        ["grp", "n_live", "sum_val"]]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)


def test_matview_tracks_every_commit(tmp_path):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    view = make_view(lake, tmp_path / "mv")

    e0 = [mk("insert", 0, "u1", 10, "a", 5),
          mk("insert", 1, "u2", 10, "a", 7),
          mk("insert", 2, "u3", 10, "b", 1)]
    # e1: update moves u2 to group b and changes val; delete u3
    e1 = [mk("update", 3, "u2", 20, "b", 9),
          mk("delete", 4, "u3", 20, None, None)]
    # e2: reinsert u3 in c, touch u1 with same values (no-op update)
    e2 = [mk("insert", 5, "u3", 30, "c", 4),
          mk("update", 6, "u1", 30, "a", 5)]
    for i, ev in enumerate([e0, e1, e2]):
        lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(ev)), i)
        assert_view_equals_recompute(view.refresh(), lake)

    # purge maintenance: live rows unchanged -> delta must be zero
    lake.purge_tombstones(watermark_ts_us=10**18)
    assert_view_equals_recompute(view.refresh(), lake)

    # refresh is idempotent (pure read when nothing new)
    before = view.applied_commits()
    assert_view_equals_recompute(view.refresh(), lake)
    assert view.applied_commits() == before


def test_matview_truncate_empties_view(tmp_path):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 0, "u1", 10, "a", 5)])), 0)
    view = make_view(lake, tmp_path / "mv")
    assert len(view.refresh()) == 1
    lake.truncate()
    assert len(view.refresh()) == 0


def test_matview_resume_from_partial(tmp_path):
    # maintain through commit 0, then commits 1-2 land while the view
    # is offline; refresh folds only the missing deltas
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
    view = make_view(lake, tmp_path / "mv")
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 0, "u1", 10, "a", 5)])), 0)
    view.refresh()
    assert len(view.applied_commits()) == 1
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 1, "u2", 20, "b", 3)])), 1)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 2, "u2", 30, "b", 8)])), 2)
    out = view.refresh()
    assert len(view.applied_commits()) == 3
    assert_view_equals_recompute(out, lake)


def test_matview_full_recompute_after_compaction(tmp_path):
    # compact removes the historical files a later delta would need as
    # its "old" side -> refresh must fall back to a full recompute
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
    for i, ev in enumerate([
        [mk("insert", 0, "u1", 10, "a", 5),
         mk("insert", 1, "u2", 10, "b", 2)],
        [mk("update", 2, "u1", 20, "a", 6)],
        [mk("update", 3, "u2", 30, "b", 4)],
    ]):
        lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(ev)), i)
    lake.compact(keep_epochs=1)
    view = make_view(lake, tmp_path / "mv")
    assert_view_equals_recompute(view.refresh(), lake)


def test_cli_matview_refresh_idempotent(tmp_path):
    import json
    import subprocess
    import sys

    log, lake, mv = (str(tmp_path / d) for d in ("log", "lake", "mv"))

    def cli(*args, timeout=300):
        out = subprocess.run(
            [sys.executable, "-m", "chomper_ray.cli", *args],
            capture_output=True, text=True, timeout=timeout)
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    cli("generate", "--out-dir", log, "--n-events", "400",
        "--n-urls", "80", "--n-epochs", "2")
    cli("run-cdc", "--log-dir", log, "--lake-root", lake,
        "--num-partitions", "2", "--drain")
    first = cli("matview-refresh", "--lake-root", lake, "--view-root", mv)
    assert first["commits_applied"] == [0, 1]
    assert first["n_pages"] > 0
    again = cli("matview-refresh", "--lake-root", lake, "--view-root", mv)
    assert again["commits_applied"] == []
    assert again["n_pages"] == first["n_pages"]


def test_matview_tumbling_windows_late_data(tmp_path):
    """Windows are a derived grouping column: a page contributes to the
    hour of its LIVE LWW version's warc_ts, so a late update that moves
    a page between hours folds as a group move (-1 old window / +1 new)
    — and an out-of-order update that LOSES the LWW race changes
    nothing. Maintained view == full windowed recompute per commit."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "w": df["warc_ts"].dt.floor("h"),
            "val": df["val"].fillna(0).astype("int64")})

    view = MaterializedAgg(lake, tmp_path / "mvw", contrib,
                           group_cols=["w"], value_cols=["val"],
                           read_columns=["warc_ts", "val"])

    def windowed(lake) -> dict:
        live = lake.read_pandas()
        if not len(live):
            return {}
        g = live.assign(w=live["warc_ts"].dt.floor("h")) \
            .groupby("w", sort=True)
        return {(str(k)): (int(n), int(s)) for k, n, s in zip(
            g.size().index, g.size(), g["val"].sum())}

    def got(v) -> dict:
        return {str(r.w): (int(r.n_live), int(r.sum_val))
                for r in v.itertuples(index=False)}

    H = 3600
    e0 = [mk("insert", 0, "u1", 10, "a", 5),
          mk("insert", 1, "u2", 20, "a", 7),        # hour 0
          mk("insert", 2, "u3", H + 30, "a", 11)]   # hour 1
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e0)), 0)
    assert got(view.refresh()) == windowed(lake)
    assert len(windowed(lake)) == 2

    # late window-crossing update: u1 moves hour 0 -> hour 2
    e1 = [mk("update", 3, "u1", 2 * H + 5, "a", 6)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e1)), 1)
    v = view.refresh()
    assert got(v) == windowed(lake)
    assert len(v) == 3 and v["n_live"].sum() == 3

    # out-of-order update that LOSES LWW (older warc_ts): no change
    before = got(v)
    e2 = [mk("update", 4, "u3", 40, "a", 99)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e2)), 2)
    assert got(view.refresh()) == before == windowed(lake)

    # delete empties its window group entirely
    e3 = [mk("delete", 5, "u2", 3 * H, "a", None)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e3)), 3)
    v = view.refresh()
    assert got(v) == windowed(lake)
    assert v["n_live"].sum() == 2


def test_matview_hopping_windows_exploding_contrib(tmp_path):
    """A contrib may EXPLODE each row into several window groups
    (hopping windows: size 2h / hop 1h => 2 windows per row); the
    signed fold cancels ALL of an old version's exploded rows and adds
    all of the new version's, so updates/deletes stay exact."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    H = 3600

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        s = df["warc_ts"].astype("int64") // 1_000_000
        base = pd.DataFrame({
            "w0": (s // H) * H,
            "val": df["val"].fillna(0).astype("int64")})
        return pd.concat([base.assign(w=base["w0"] - i * H)
                          for i in range(2)], ignore_index=True)[
            ["w", "val"]]

    view = MaterializedAgg(lake, tmp_path / "mvh", contrib,
                           group_cols=["w"], value_cols=["val"],
                           read_columns=["warc_ts", "val"])

    def expect(lake) -> dict:
        live = lake.read_pandas()
        out: dict = {}
        for _, r in live.iterrows():
            w0 = (int(pd.Timestamp(r["warc_ts"]).value // 10**9) //
                  H) * H
            for i in range(2):
                k = w0 - i * H
                n, s = out.get(k, (0, 0))
                out[k] = (n + 1, s + int(r["val"]))
        return out

    def got(v) -> dict:
        return {int(r.w): (int(r.n_live), int(r.sum_val))
                for r in v.itertuples(index=False)}

    e0 = [mk("insert", 0, "u1", 10, "a", 5),
          mk("insert", 1, "u2", H + 20, "a", 7)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e0)), 0)
    v = view.refresh()
    assert got(v) == expect(lake)
    assert v["n_live"].sum() == 4  # 2 rows x 2 windows each

    # update moves u1 two hours later: BOTH old window rows cancel,
    # BOTH new window rows appear
    e1 = [mk("update", 2, "u1", 2 * H + 10, "a", 6)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e1)), 1)
    v = view.refresh()
    assert got(v) == expect(lake)

    # delete removes both of u2's window contributions
    e2 = [mk("delete", 3, "u2", 3 * H, "a", None)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e2)), 2)
    v = view.refresh()
    assert got(v) == expect(lake)
    assert v["n_live"].sum() == 2
