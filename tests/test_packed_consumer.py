"""PackedStreamConsumer (state/clustered.py): durable checkpointed
consumption of the packed training stream — shard-at-a-time delivery in
exact stream order, at-least-once resume from the cursor file, drift
detection when the lake commits under a mid-epoch resume, and epoch
close/re-pin semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.clustered import (LakeShuffledExport,
                                         PackedStreamConsumer,
                                         StreamDrift, _md5_32)
from chomper_ray.state.lake import LakeTable

NSH = 6
L = 8


def mk(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def shard_of(url):
    return int(_md5_32(np.array([url], dtype=object))[0] % NSH)


def seed(tmp_path):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=3,
                     collect_changes=False)
    rows = [mk("insert", i, f"u{i:03d}", 100 + i,
               " ".join(f"w{j}" for j in range(1 + (i * 5) % 13)))
            for i in range(60)]
    commit(lake, rows, 0)
    exp = LakeShuffledExport(lake, tmp_path / "shuf",
                             columns=["text"], n_shards=NSH)
    exp.refresh()
    return lake, exp


def full_stream(exp):
    return (exp.read_packed(L).to_pandas()
            .sort_values(["shard", "example_id", "ex_off"], kind="stable")
            .reset_index(drop=True))


def test_consumes_everything_in_order(tmp_path, ray_session):
    _, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    got = []
    for s, frame in c.batches():
        assert (frame["shard"] == s).all()
        # in-stream order: example_id asc, ex_off asc within example
        assert (frame[["example_id", "ex_off"]].values ==
                frame[["example_id", "ex_off"]]
                .sort_values(["example_id", "ex_off"]).values).all()
        got.append(frame)
    got = pd.concat(got, ignore_index=True)
    pd.testing.assert_frame_equal(got, full_stream(exp))
    st = c.finish_epoch()
    assert st["data_epochs_done"] == 1 and st["next_shard"] == 0
    # second epoch replays the same (unchanged) content from shard 0
    again = pd.concat([f for _, f in c.batches()], ignore_index=True)
    pd.testing.assert_frame_equal(again, got)


def test_resume_is_at_least_once(tmp_path, ray_session):
    _, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    it = c.batches()
    seen = [next(it)[0] for _ in range(3)]     # delivered 0,1,2
    del it                                      # crash mid-shard 2
    assert seen == [0, 1, 2]
    assert c.state()["next_shard"] == 2         # 2 not yet acked
    c2 = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    rest = [s for s, _ in c2.batches()]
    assert rest == [2, 3, 4, 5]                 # shard 2 re-delivered


def test_drift_detection(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    it = c.batches()
    consumed = [next(it)[0] for _ in range(2)]  # 0, 1 delivered
    next(it)                                    # acks shard 1 → next 2
    del it
    # a commit touching an UNREAD shard (pick a url routed >= 2)
    url = next(f"u{i:03d}" for i in range(60) if shard_of(f"u{i:03d}") >= 3)
    commit(lake, [mk("update", 900, url, 900, "fresh text body")], 1)
    exp.refresh()
    c2 = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    with pytest.raises(StreamDrift):
        next(c2.batches())
    # allow_drift accepts the newer content and finishes the epoch
    rest = [s for s, _ in c2.batches(allow_drift=True)]
    assert rest[0] == 2 and rest[-1] == NSH - 1
    assert consumed == [0, 1]


def test_consumed_shard_commit_is_harmless(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    it = c.batches()
    first, _ = next(it)                         # delivered shard 0
    next(it)                                    # acks 0, delivers 1
    next(it)                                    # acks 1, delivers 2
    del it
    # commit touching ONLY an already-consumed shard (0 or 1)
    url = next(f"u{i:03d}" for i in range(60)
               if shard_of(f"u{i:03d}") in (0, 1))
    commit(lake, [mk("update", 901, url, 901, "already consumed")], 1)
    exp.refresh()
    rest = [s for s, _ in
            PackedStreamConsumer(exp, tmp_path / "cur.json", L).batches()]
    assert rest == [2, 3, 4, 5] and first == 0


def test_compaction_never_drifts(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    commit(lake, [mk("update", 950, "u001", 950, "one more version")], 1)
    exp.refresh()
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    it = c.batches()
    next(it), next(it)
    del it
    exp.compact()
    rest = [s for s, _ in
            PackedStreamConsumer(exp, tmp_path / "cur.json", L).batches()]
    assert rest and rest[0] == 1


def test_cursor_guards(tmp_path, ray_session):
    _, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    with pytest.raises(ValueError, match="no cursor yet"):
        c.finish_epoch()
    it = c.batches()
    next(it)
    del it
    with pytest.raises(ValueError, match="not finished"):
        c.finish_epoch()
    list(c.batches())
    c.finish_epoch()
    with pytest.raises(ValueError, match="would not line up"):
        next(PackedStreamConsumer(exp, tmp_path / "cur.json",
                                  L + 1).batches())


def test_examples_materialize_exact_token_stream(tmp_path, ray_session):
    _, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    live = (exp.read_live(columns=["text"])
            .to_pandas()
            .sort_values(["shard", "pos"], kind="stable"))
    for s, ex in c.examples():
        # every example is exactly L tokens except the shard's last
        assert (ex["n_tokens"].iloc[:-1] == L).all()
        assert 0 < ex["n_tokens"].iloc[-1] <= L
        assert (ex["text"].str.split(" ").str.len()
                == ex["n_tokens"]).all()
        # concatenating the examples reproduces the shard's live
        # token stream in shuffled (shard, pos) order
        stream = " ".join(t for t in live[live["shard"] == s]["text"]
                          if t)
        assert " ".join(ex["text"]) == stream
    assert c.state()["next_shard"] == NSH  # same cursor as batches()


def test_bpe_budgeted_stream(tmp_path, ray_session):
    # read_packed(model=...) budgets in REAL BPE tokens; the consumer
    # pins the merge table in its cursor and materializes encoded
    # streams that concatenate back to the shard's encoded corpus
    from chomper_ray.stages.bpe import BpeModel, bpe_train

    lake, exp = seed(tmp_path)
    ds = lake.read()
    model = bpe_train(ds, col="text", n_merges=6)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L, model=model)
    total = 0
    for s, ex in c.examples():
        assert (ex["n_tokens"].iloc[:-1] == L).all()
        # encoded-stream identity per shard
        live = (exp.read_live(columns=["url", "text"], shards=[s])
                .to_pandas().sort_values("pos"))
        stream = [tok for t in live["text"]
                  for tok in c._doc_tokens(t)]
        assert " ".join(ex["text"]).split(" ") == stream
        total += int(ex["n_tokens"].sum())
    assert total > 0
    # a consumer with a DIFFERENT merge table refuses the cursor
    other = BpeModel(merges=model.merges[:-1])
    with pytest.raises(ValueError, match="would not line up"):
        next(PackedStreamConsumer(exp, tmp_path / "cur.json", L,
                                  model=other).batches())
    # and a whitespace consumer refuses it too
    with pytest.raises(ValueError, match="would not line up"):
        next(PackedStreamConsumer(exp, tmp_path / "cur.json",
                                  L).batches())


def test_mid_generator_drift_detected(tmp_path, ray_session):
    # a refresh landing while the generator is LIVE must be caught at
    # the next shard pull, not only at generator entry
    lake, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    it = c.batches()
    next(it)                                     # delivered shard 0
    url = next(f"u{i:03d}" for i in range(60)
               if shard_of(f"u{i:03d}") >= 3)
    commit(lake, [mk("update", 970, url, 970, "live drift body")], 1)
    exp.refresh()
    with pytest.raises(StreamDrift):
        next(it)                                 # detected mid-stream
    # allow_drift generator sails through the same situation
    c2 = PackedStreamConsumer(exp, tmp_path / "cur2.json", L)
    it2 = c2.batches(allow_drift=True)
    next(it2)
    commit(lake, [mk("update", 980, url, 980, "more drift")], 2)
    exp.refresh()
    assert [s for s, _ in it2] == list(range(1, NSH))


def test_whitespace_tokens_match_budget(tmp_path, ray_session):
    # newline/tab/multi-space text: examples() must slice the same
    # \S+ tokens read_packed budgeted (a plain split(' ') miscounts)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    rows = [mk("insert", 0, "u0", 10, "hello\nworld and\tmore  here"),
            mk("insert", 1, "u1", 10, " lead trail "),
            mk("insert", 2, "u2", 10, "a\nb  c")]
    commit(lake, rows, 0)
    exp = LakeShuffledExport(lake, tmp_path / "shuf",
                             columns=["text"], n_shards=NSH)
    exp.refresh()
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", 4)
    toks = []
    for _, ex in c.examples():
        assert (ex["text"].str.split(" ").str.len()
                == ex["n_tokens"]).all()
        toks += [t for x in ex["text"] for t in x.split(" ")]
    assert sorted(toks) == sorted(
        "hello world and more here lead trail a b c".split())


def test_same_count_rewrite_between_span_and_text_reads(tmp_path,
                                                        ray_session):
    """A commit that rewrites a doc's text WITHOUT changing its token
    count, landing between examples()'s span read and its text read,
    must raise StreamDrift — the per-doc count guard alone would slice
    a silently mixed corpus state (round-4 ADVICE item 3)."""
    lake, exp = seed(tmp_path)
    c = PackedStreamConsumer(exp, tmp_path / "cur.json", L)
    # pick a doc in shard 0 and build a SAME-token-count replacement
    url = next(f"u{i:03d}" for i in range(60)
               if shard_of(f"u{i:03d}") == 0)
    i = int(url[1:])
    n_tok = 1 + (i * 5) % 13
    swap = " ".join(f"X{j}" for j in range(n_tok))

    # inject the racing commit at the guard's own head re-check — the
    # first _head_cid() call made AFTER a span read pinned _span_head
    # is examples()'s post-text-read check, i.e. inside the hazard
    # window. (Patching exp.read_live would attach a test-module
    # closure to the export, which Ray pickles to workers.)
    orig_head = c._head_cid
    fired = {"done": False}

    def head_hook():
        if getattr(c, "_span_head", None) is not None \
                and not fired["done"]:
            fired["done"] = True
            commit(lake, [mk("update", 970, url, 970, swap)], 1)
            exp.refresh()
        return orig_head()

    c._head_cid = head_hook
    with pytest.raises(StreamDrift, match="between the span read"):
        next(c.examples())
    # allow_drift consumes the newer same-count content without raising
    c2 = PackedStreamConsumer(exp, tmp_path / "cur2.json", L)
    assert sum(len(ex) for _, ex in c2.examples(allow_drift=True)) > 0
