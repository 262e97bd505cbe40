"""CLI entry points — the surface a ``ray job submit`` deployment drives.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m chomper_ray.cli run-cdc \
        --log-dir s3://bucket/binlog --lake-root s3://bucket/lake \
        --num-partitions 4096

In this sandbox the same commands run against local paths. The CLI owns
its Ray session (guarded init) — library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="chomper_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="deterministic synthetic change log")
    g.add_argument("--out-dir", required=True)
    g.add_argument("--n-events", type=int, default=10_000)
    g.add_argument("--n-urls", type=int, default=2_000)
    g.add_argument("--n-epochs", type=int, default=4)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--evolution-epoch", type=int, default=None)
    g.add_argument("--format",
                   choices=["parquet", "envelope", "multi",
                            "multi-envelope"],
                   default="parquet",
                   help="parquet binlog segments (default), "
                        "Debezium-style JSONL envelopes, or the "
                        "two-table WAL variants")
    g.add_argument("--n-links", type=int, default=1_500,
                   help="links keyspace (multi formats only)")

    r = sub.add_parser("run-cdc", help="binlog-tail → lake-upsert from checkpoint")
    r.add_argument("--log-dir", required=True)
    r.add_argument("--lake-root", required=True)
    r.add_argument("--num-partitions", type=int, default=None,
                   help="partition count for a NEW lake; an existing "
                        "lake's committed count is adopted (a conflicting "
                        "explicit value fails loudly)")
    r.add_argument("--max-epochs", type=int, default=None)
    r.add_argument("--staging-root", default=None,
                   help="fast transient storage for shuffle staging files "
                        "(e.g. local NVMe / tmpfs); default: under lake root")
    r.add_argument("--source", choices=["parquet", "envelope"],
                   default="parquet",
                   help="log format: parquet binlog (default) or "
                        "Debezium-style JSONL envelopes")
    r.add_argument("--drain", action="store_true",
                   help="stage all pending epochs in one parallel pass "
                        "(backlog catch-up mode)")
    r.add_argument("--merge-on-read", action="store_true",
                   help="commit per-partition LWW delta files instead of "
                        "rewriting base snapshots (write amplification ~1; "
                        "reads resolve base+deltas; compact-deltas folds)")
    r.add_argument("--compact-min-chain", type=int, default=None,
                   metavar="N",
                   help="after the run, fold merge-on-read partitions "
                        "whose pending delta chain is >= N deep (the "
                        "read-amplification cadence; requires "
                        "--merge-on-read)")
    r.add_argument("--tail", action="store_true",
                   help="continuous: poll for new epochs (Ctrl-C to stop)")
    r.add_argument("--near-dup-index", default=None, metavar="DIR",
                   help="dedup-at-ingest: maintain a MinHash near-dup "
                        "index at DIR and drop events whose text "
                        "near-duplicates a live doc under a different "
                        "key (forces the sequential per-epoch path; "
                        "composes with --tail)")
    r.add_argument("--near-dup-threshold", type=float, default=0.8,
                   help="signature-Jaccard admission threshold "
                        "(with --near-dup-index; default 0.8)")
    r.add_argument("--near-dup-rejects", default=None, metavar="DIR",
                   help="write rejected events' provenance (key, "
                        "dup_of, sim, epoch) under DIR/epoch=N/ "
                        "(with --near-dup-index)")
    r.add_argument("--refresh", action="append", default=None,
                   metavar="KIND:DIR",
                   help="maintain a derived structure per commit from "
                        "inside the ingest loop (repeatable): "
                        "text-index:DIR | ann-index:DIR | "
                        "domain-matview:DIR | sorted-layout:DIR | "
                        "shuffled-export:DIR | minhash-index:DIR "
                        "(canned configs matching the standalone "
                        "refresh commands)")
    r.add_argument("--auto-maintain", action="store_true",
                   help="opt-in maintenance policy loop "
                        "(state/policy.py): per commit, fold MOR delta "
                        "chains at --auto-max-chain, compact --refresh "
                        "structures at --auto-max-segments live "
                        "segments, record partition-skew advisories. "
                        "NOTE: an index compact folds its per-commit "
                        "segments, so the 'refreshed' report then "
                        "lists only the still-live segment commits")
    r.add_argument("--auto-max-chain", type=int, default=8, metavar="N",
                   help="policy: fold partitions whose pending MOR "
                        "chain reaches N (default 8; 0 disables)")
    r.add_argument("--auto-max-segments", type=int, default=12,
                   metavar="N",
                   help="policy: compact a maintained structure at N "
                        "live segments (default 12; 0 disables)")
    r.add_argument("--decontaminate", default=None, metavar="BENCH",
                   help="parquet file/dir of benchmark texts: drop "
                        "events sharing any token n-gram with it "
                        "(eval-set leakage rejected at the lake door)")
    r.add_argument("--decontaminate-ngram", type=int, default=5,
                   metavar="N", help="n-gram width for --decontaminate "
                                     "(default 5)")
    r.add_argument("--export-bus", default=None, metavar="DIR",
                   help="streaming outbound CDC: export each committed "
                        "epoch as Debezium envelopes under DIR from the "
                        "ingest loop (after_commit hook; composes with "
                        "--tail)")

    rm = sub.add_parser(
        "run-cdc-multi",
        help="multi-table log → one exactly-once lake per table "
             "(one stream read per epoch; tables from _tables.json)")
    rm.add_argument("--log-dir", required=True)
    rm.add_argument("--root", required=True,
                    help="parent dir; each table lands at <root>/<name>")
    rm.add_argument("--num-partitions", type=int, default=None)
    rm.add_argument("--max-epochs", type=int, default=None)
    rm.add_argument("--source", choices=["parquet", "envelope"],
                    default="parquet")

    s = sub.add_parser("status", help="lake checkpoint + lineage summary")
    s.add_argument("--lake-root", required=True)

    t = sub.add_parser("truncate", help="full-refresh commit")
    t.add_argument("--lake-root", required=True)
    t.add_argument("--epoch", type=int, default=None,
                   help="chain id for the commit; default: next free id")

    c = sub.add_parser("compact", help="garbage-collect unreferenced snapshots")
    c.add_argument("--lake-root", required=True)
    c.add_argument("--keep-epochs", type=int, default=1,
                   help="time-travel window: how many manifests stay readable")

    cd = sub.add_parser(
        "compact-deltas",
        help="fold pending merge-on-read delta chains into fresh base "
             "snapshots (the read-amplification lever; derived "
             "structures never need this — they fold MOR commits "
             "directly)")
    cd.add_argument("--lake-root", required=True)
    cd.add_argument("--min-chain", type=int, default=0,
                    help="minor compaction: fold only partitions whose "
                         "pending chain is at least this deep "
                         "(default 0 = fold everything pending)")

    mv = sub.add_parser(
        "matview-refresh",
        help="fold unapplied lake commits into the per-domain "
             "materialized rollup (incremental view maintenance)")
    mv.add_argument("--lake-root", required=True)
    mv.add_argument("--view-root", required=True,
                    help="view storage; one parquet per applied manifest")

    lr = sub.add_parser(
        "layout-refresh",
        help="fold unapplied lake commits into a maintained sorted "
             "data-skipping layout on warc_ts (LSM signed segments)")
    lr.add_argument("--lake-root", required=True)
    lr.add_argument("--layout-root", required=True,
                    help="layout storage; seg-<cid>/ per applied commit")
    lr.add_argument("--compact", action="store_true",
                    help="fold all live segments into one full segment "
                         "after applying (restores the no-resolve scan)")

    hi = sub.add_parser(
        "history",
        help="manifest-chain summary: one JSON line per commit (kind, "
             "log epoch, partitions touched, events in, rows, wall)")
    hi.add_argument("--lake-root", required=True)
    hi.add_argument("--last", type=int, default=None,
                    help="only the newest N commits")

    obm = sub.add_parser(
        "export-changes-multi",
        help="outbound CDC for several lakes ingested from a SHARED "
             "log: one envelope WAL per log epoch, source.table "
             "discriminated (run-cdc-multi --source envelope replays)")
    obm.add_argument("--root", required=True,
                     help="directory holding one lake per table "
                          "(run-cdc-multi layout: <root>/<name>)")
    obm.add_argument("--tables", required=True,
                     help="comma list of name:key pairs, e.g. "
                          "pages:url,links:link_id")
    obm.add_argument("--out-dir", required=True)

    bp = sub.add_parser(
        "branch",
        help="zero-copy fork: an independent lake at --dest with this "
             "lake's state at --as-of-epoch (default head); data files "
             "are hardlinked, O(metadata)")
    bp.add_argument("--lake-root", required=True)
    bp.add_argument("--dest", required=True)
    bp.add_argument("--as-of-epoch", type=int, default=None)

    ob = sub.add_parser(
        "export-changes",
        help="outbound CDC: export every unexported lake commit as "
             "Debezium-style envelope epochs (the same wire format "
             "run-cdc --source envelope ingests)")
    ob.add_argument("--lake-root", required=True)
    ob.add_argument("--out-dir", required=True,
                    help="envelope bus directory (epoch=N/*.jsonl + "
                         "_schema.json; plus the exporter cursor)")
    ob.add_argument("--table", default="pages",
                    help="source.table discriminator on the wire")
    ob.add_argument("--prune-before", type=int, default=None,
                    help="after exporting, delete bus epochs below N "
                         "and plant the retention horizon (lagging "
                         "consumers then refuse loudly)")

    dv = sub.add_parser(
        "derive",
        help="maintain a downstream derived lake (filter+project of the "
             "upstream lake), one exactly-once downstream commit per "
             "unapplied upstream commit")
    dv.add_argument("--lake-root", required=True, help="upstream lake")
    dv.add_argument("--derived-root", required=True,
                    help="downstream lake storage (plus cursor file)")
    dv.add_argument("--transform", choices=["clean-docs"],
                    default="clean-docs",
                    help="clean-docs: keep fetch_status==200 rows, "
                         "project url/lang/n_chars")
    dv.add_argument("--num-partitions", type=int, default=None,
                    help="downstream partition count (first run only)")

    bf = sub.add_parser(
        "backfill",
        help="chunked in-place reprocess of lake history through a "
             "registered transform; resumable by --id")
    bf.add_argument("--lake-root", required=True)
    bf.add_argument("--id", required=True, dest="backfill_id",
                    help="backfill version id (resume key)")
    bf.add_argument("--transform", choices=["token-count"],
                    default="token-count")
    bf.add_argument("--max-partitions", type=int, default=None,
                    help="partitions per chunk commit (default: all)")
    bf.add_argument("--max-chunks", type=int, default=None,
                    help="chunk commits this invocation (resume later)")

    rp = sub.add_parser(
        "repartition",
        help="re-bucket the live table to a new partition count "
             "(one exactly-once maintenance commit)")
    rp.add_argument("--lake-root", required=True)
    g = rp.add_mutually_exclusive_group(required=True)
    g.add_argument("--num-partitions", type=int, default=None)
    g.add_argument("--auto", action="store_true",
                   help="act on suggest_num_partitions (recent ingest "
                        "lineage volumes); no-op when nothing is hot")
    rp.add_argument("--window", type=int, default=5,
                    help="ingest commits to consider for --auto")

    fs = sub.add_parser("fsck", help="verify snapshot files against "
                                     "their manifest hashes/counts")
    fs.add_argument("--lake-root", required=True)

    pc_ = sub.add_parser("prune-changes",
                         help="retention for the change-event log")
    pc_.add_argument("--lake-root", required=True)
    pc_.add_argument("--before-epoch", type=int, required=True,
                     help="delete change files of LOG epochs < this "
                          "(every subscriber must have passed it)")

    pg = sub.add_parser("purge", help="drop tombstones older than a watermark")
    pg.add_argument("--lake-root", required=True)
    pg.add_argument("--epoch", type=int, default=None,
                    help="chain id for the commit; default: next free id")
    pg.add_argument("--watermark-ts-us", type=int, required=True,
                    help="producer guarantee: no future event carries "
                         "warc_ts <= this")

    args = p.parse_args(argv)

    if args.cmd == "generate":
        params = dict(n_events=args.n_events, n_urls=args.n_urls,
                      n_epochs=args.n_epochs, seed=args.seed,
                      evolution_epoch=args.evolution_epoch)
        if args.format == "envelope":
            from chomper_ray.sources.envelopes import generate_envelope_log

            out = generate_envelope_log(args.out_dir, **params)
        elif args.format in ("multi", "multi-envelope"):
            mp = dict(n_events=args.n_events, n_urls=args.n_urls,
                      n_links=args.n_links, n_epochs=args.n_epochs,
                      seed=args.seed)
            if args.format == "multi":
                from chomper_ray.sources.events import \
                    generate_multi_stream

                out = generate_multi_stream(args.out_dir, **mp)
            else:
                from chomper_ray.sources.envelopes import \
                    generate_multi_envelope_log

                out = generate_multi_envelope_log(args.out_dir, **mp)
        else:
            from chomper_ray.sources.events import generate_change_stream

            out = generate_change_stream(args.out_dir, **params)
        print(json.dumps({"log_dir": str(out), "format": args.format}))
        return 0

    if args.cmd == "run-cdc":
        _ray_init()
        from chomper_ray.pipelines.cdc import run_cdc, tail_cdc

        lake_kwargs = {}
        if args.staging_root:
            lake_kwargs["staging_root"] = args.staging_root
        if args.merge_on_read:
            lake_kwargs["merge_on_read"] = True
            lake_kwargs["collect_changes"] = False
        fn = tail_cdc if args.tail else run_cdc
        extra = {} if args.tail else {"max_epochs": args.max_epochs,
                                      "drain": args.drain}
        if args.source == "envelope":
            from chomper_ray.sources import envelopes

            extra["source"] = envelopes
        if args.compact_min_chain is not None and not args.merge_on_read:
            p.error("--compact-min-chain requires --merge-on-read")
        if args.near_dup_rejects and not args.near_dup_index:
            p.error("--near-dup-rejects requires --near-dup-index")
        if args.decontaminate:
            if args.near_dup_index:
                p.error("--decontaminate and --near-dup-index both own "
                        "the epoch gate; compose them in Python")
            import ray.data as rd

            from chomper_ray.stages.dedup import decontamination_gate

            gate = decontamination_gate(
                rd.read_parquet(args.decontaminate),
                n=args.decontaminate_ngram)
            extra["epoch_transform"] = lambda _e: gate
        if args.export_bus:
            if args.near_dup_index:
                p.error("--export-bus and --near-dup-index both own the "
                        "after_commit hook; compose them in Python")
            from chomper_ray.state.lake import LakeTable
            from chomper_ray.state.outbound import LakeChangeExporter

            exporter = LakeChangeExporter(
                LakeTable(args.lake_root, **lake_kwargs), args.export_bus)
            extra["after_commit"] = lambda _c: exporter.export()
        refresh_targets: list[tuple[str, object]] = []
        if args.refresh:
            from chomper_ray.state.lake import LakeTable

            rlake = LakeTable(args.lake_root, **lake_kwargs)
            # dedupe up front: a repeated KIND:DIR would refresh the
            # same structure twice per commit while collapsing into one
            # refresh_before key / one 'refreshed' output entry —
            # harmless (refresh is idempotent) but silently misreported
            seen_specs: set[str] = set()
            for spec in args.refresh:
                if spec in seen_specs:
                    p.error(f"--refresh: duplicate spec {spec!r}")
                seen_specs.add(spec)
                kind, _, dest = spec.partition(":")
                if not dest:
                    p.error(f"--refresh wants KIND:DIR, got {spec!r}")
                if kind == "text-index":
                    from chomper_ray.state.index import LakeTextIndex

                    tgt = LakeTextIndex(rlake, dest, num_partitions=16)
                elif kind == "ann-index":
                    from chomper_ray.state.annindex import LakeANNIndex

                    tgt = LakeANNIndex(rlake, dest)
                elif kind == "domain-matview":
                    import pandas as pd

                    from chomper_ray.stages.text import url_parts
                    from chomper_ray.state.matview import MaterializedAgg

                    def contrib(df: "pd.DataFrame") -> "pd.DataFrame":
                        d = url_parts(df)
                        return pd.DataFrame({
                            "domain": d["domain"],
                            "n_chars": d["text"].fillna("").str.len()
                            .astype("int64")})

                    tgt = MaterializedAgg(rlake, dest, contrib,
                                          group_cols=["domain"],
                                          value_cols=["n_chars"],
                                          read_columns=["url", "text"])
                elif kind == "sorted-layout":
                    from chomper_ray.state.clustered import \
                        LakeSortedLayout

                    tgt = LakeSortedLayout(rlake, dest,
                                           order_col="warc_ts",
                                           columns=["lang"])
                elif kind == "shuffled-export":
                    from chomper_ray.state.clustered import \
                        LakeShuffledExport

                    tgt = LakeShuffledExport(rlake, dest,
                                             columns=["text"],
                                             n_shards=16)
                elif kind == "minhash-index":
                    from chomper_ray.state.dupindex import \
                        LakeMinHashIndex

                    tgt = LakeMinHashIndex(rlake, dest)
                else:
                    p.error(f"--refresh: unknown kind {kind!r} (want "
                            "text-index | ann-index | domain-matview "
                            "| sorted-layout | shuffled-export "
                            "| minhash-index)")
                refresh_targets.append((spec, tgt))
            prev_hook = extra.get("after_commit")

            def refresh_hook(commit, _prev=prev_hook):
                if _prev is not None:
                    _prev(commit)
                for _, t in refresh_targets:
                    t.refresh()

            extra["after_commit"] = refresh_hook
        refresh_before = {spec: set(t.applied_commits())
                          for spec, t in refresh_targets}
        policy = None
        if args.auto_maintain:
            from chomper_ray.state.lake import LakeTable
            from chomper_ray.state.policy import MaintenancePolicy

            plake = LakeTable(args.lake_root, **lake_kwargs)
            policy = MaintenancePolicy(
                plake, targets=tuple(t for _, t in refresh_targets),
                max_chain=args.auto_max_chain,
                max_segments=args.auto_max_segments)
            prev_hook2 = extra.get("after_commit")

            def policy_hook(commit, _prev=prev_hook2):
                if _prev is not None:
                    _prev(commit)
                policy.after_commit(commit)

            extra["after_commit"] = policy_hook
        if args.near_dup_index:
            from chomper_ray.state.dupindex import run_cdc_admitted

            res, _ = run_cdc_admitted(
                args.log_dir, args.lake_root, args.near_dup_index,
                num_partitions=args.num_partitions,
                lake_kwargs=lake_kwargs,
                index_kwargs={"threshold": args.near_dup_threshold},
                rejects_root=args.near_dup_rejects,
                tail=args.tail,
                **extra)
        else:
            res = fn(args.log_dir, args.lake_root,
                     num_partitions=args.num_partitions,
                     lake_kwargs=lake_kwargs, **extra)
        out = {
            "epochs_run": res.epochs_run,
            "epochs_skipped": res.epochs_skipped,
            "events_applied": res.events_applied,
            "wall_s": round(res.wall_s, 2),
        }
        if refresh_targets:
            out["refreshed"] = {
                spec: sorted(set(t.applied_commits())
                             - refresh_before[spec])
                for spec, t in refresh_targets}
        if policy is not None:
            out["maintenance"] = policy.summary()
            out["maintenance_log"] = policy.log
        if args.compact_min_chain is not None:
            from chomper_ray.state.lake import LakeTable

            lake = LakeTable(args.lake_root, **lake_kwargs)
            c = lake.compact_deltas(min_chain=args.compact_min_chain)
            out["compacted_partitions"] = (0 if c.skipped
                                           else c.partitions_touched)
            out["pending_chains"] = {
                str(k): v
                for k, v in sorted(lake.delta_chain_lengths().items())}
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "run-cdc-multi":
        _ray_init()
        from chomper_ray.pipelines.multi import run_cdc_multi

        kw = {}
        if args.source == "envelope":
            from chomper_ray.sources import envelopes

            kw["source"] = envelopes
        res = run_cdc_multi(args.log_dir, args.root,
                            num_partitions=args.num_partitions,
                            max_epochs=args.max_epochs, **kw)
        print(json.dumps({
            name: {"epochs_run": r.epochs_run,
                   "epochs_skipped": r.epochs_skipped,
                   "events_applied": r.events_applied}
            for name, r in sorted(res.items())}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "status":
        from chomper_ray.state.lake import (LakeTable, load_manifest,
                                            manifest_has_deltas)

        lake = LakeTable(args.lake_root)
        m = load_manifest(args.lake_root)
        # per-partition live counts are unknown while merge-on-read
        # deltas are pending (resolution happens at read time) — report
        # null plus the pending-chain picture instead of a stale sum
        pending = manifest_has_deltas(m)
        out = {
            "last_committed_epoch": lake.last_committed_epoch(),
            "last_applied_log_epoch": lake.last_applied_log_epoch(),
            "snapshot_hash": lake.snapshot_hash(),
            "num_partitions": (m or {}).get("num_partitions"),
            "live_rows": (None if pending else
                          sum(v.get("live_rows", 0)
                              for v in (m or {}).get("partitions",
                                                     {}).values())),
            "schema": (m or {}).get("schema"),
        }
        if pending:
            out["pending_delta_chains"] = {
                str(k): v
                for k, v in sorted(lake.delta_chain_lengths().items())}
        print(json.dumps(out))
        return 0

    if args.cmd == "truncate":
        from chomper_ray.state.lake import LakeTable

        res = LakeTable(args.lake_root).truncate(args.epoch)
        print(json.dumps({"epoch": res.epoch, "skipped": res.skipped}))
        return 0

    if args.cmd == "compact":
        from chomper_ray.state.lake import LakeTable

        out = LakeTable(args.lake_root).compact(keep_epochs=args.keep_epochs)
        print(json.dumps(out))
        return 0

    if args.cmd == "compact-deltas":
        _ray_init()
        from chomper_ray.state.lake import LakeTable

        lake = LakeTable(args.lake_root)
        before = lake.delta_chain_lengths()
        res = lake.compact_deltas(min_chain=args.min_chain)
        print(json.dumps({
            "epoch": res.epoch, "skipped": res.skipped,
            "partitions_folded": res.partitions_touched,
            "chains_before": {str(k): v for k, v in sorted(before.items())},
            "chains_after": {str(k): v for k, v in
                             sorted(lake.delta_chain_lengths().items())},
        }))
        return 0

    if args.cmd == "matview-refresh":
        _ray_init()
        import pandas as pd

        from chomper_ray.stages.text import url_parts
        from chomper_ray.state.lake import LakeTable
        from chomper_ray.state.matview import MaterializedAgg

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            d = url_parts(df)
            return pd.DataFrame({
                "domain": d["domain"],
                "n_chars": d["text"].fillna("").str.len().astype("int64"),
            })

        view = MaterializedAgg(
            LakeTable(args.lake_root), args.view_root, contrib,
            group_cols=["domain"], value_cols=["n_chars"],
            read_columns=["url", "text"])
        before = view.applied_commits()
        out = view.refresh()
        after = view.applied_commits()
        print(json.dumps({
            "commits_applied": sorted(set(after) - set(before)),
            "view_commits": len(after),
            "n_domains": int(len(out)),
            "n_pages": int(out["n_live"].sum()) if len(out) else 0,
        }))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "layout-refresh":
        _ray_init()
        from chomper_ray.state.clustered import LakeSortedLayout
        from chomper_ray.state.lake import LakeTable

        lay = LakeSortedLayout(LakeTable(args.lake_root),
                               args.layout_root, order_col="warc_ts",
                               columns=["lang"])
        before = lay.applied_commits()
        res = lay.refresh()
        compacted = lay.compact()["compacted"] if args.compact else False
        st = lay.stats()
        print(json.dumps({
            "commits_applied": sorted(set(lay.applied_commits())
                                      - set(before)),
            "segments_live": st["segments"],
            "rows": st["rows"], "files": st["files"],
            "skipped": res["skipped"], "compacted": compacted,
        }))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "repartition":
        _ray_init()
        from chomper_ray.state.lake import LakeTable

        lake = LakeTable(args.lake_root)
        if args.auto:
            target = lake.suggest_num_partitions(window=args.window)
            lake._sync_partitions()
            if target == lake.num_partitions:
                print(json.dumps({"skipped": True, "auto": True,
                                  "num_partitions": target,
                                  "reason": "no hot partitions in the "
                                            "lineage window"}))
                import ray

                ray.shutdown()
                return 0
        else:
            target = args.num_partitions
        res = lake.repartition_table(target)
        print(json.dumps({"epoch": res.epoch, "skipped": res.skipped,
                          "auto": bool(args.auto),
                          "num_partitions": target,
                          "partitions_touched": res.partitions_touched,
                          "live_rows": res.total_rows}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "fsck":
        _ray_init()
        from chomper_ray.state.lake import LakeTable

        res = LakeTable(args.lake_root).fsck()
        print(json.dumps(res))
        import ray

        ray.shutdown()
        return 0 if res["ok"] else 2

    if args.cmd == "prune-changes":
        from chomper_ray.state.lake import LakeTable

        res = LakeTable(args.lake_root).prune_change_events(
            args.before_epoch)
        print(json.dumps(res))
        return 0

    if args.cmd == "history":
        from chomper_ray.state.lake import committed_epochs, load_manifest

        eps = committed_epochs(args.lake_root)
        if args.last:
            eps = eps[-args.last:]
        for e in eps:
            m = load_manifest(args.lake_root, e)
            if m.get("truncated"):
                kind = "truncate"
            elif "repartitioned_from" in m:
                kind = f"repartition<-{m['repartitioned_from']}"
            elif "purged_tombstones" in m:
                kind = "purge"
            elif "compacted_delta_partitions" in m:
                kind = "compact-deltas"
            elif "backfill" in m:
                kind = f"backfill:{m['backfill']['id']}"
            else:
                kind = "ingest"
            lin = m.get("lineage", [])
            print(json.dumps({
                "commit": int(m["epoch"]),
                "prev": m.get("prev_epoch"),
                "log_epoch": m.get("log_epoch"),
                "kind": kind,
                "partitions_touched": len(lin),
                "events_in": sum(int(r.get("events_in", 0) or 0)
                                 for r in lin),
                "rows": sum(int(r.get("rows", 0) or 0) for r in lin),
                "mor_deltas": bool(m.get("delta_commits")),
                "wall_s": m.get("wall_s"),
            }))
        return 0

    if args.cmd == "export-changes-multi":
        _ray_init()
        from pathlib import Path as _P

        from chomper_ray.state.lake import LakeTable
        from chomper_ray.state.outbound import export_changes_multi

        lakes = {}
        for pair in args.tables.split(","):
            name, key = pair.split(":")
            lakes[name] = LakeTable(_P(args.root) / name, key=key)
        print(json.dumps(export_changes_multi(lakes, args.out_dir)))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "branch":
        from chomper_ray.state.lake import LakeTable, load_manifest

        br = LakeTable(args.lake_root).branch(args.dest,
                                              as_of_epoch=args.as_of_epoch)
        m = load_manifest(br.root)
        print(json.dumps({
            "dest": str(br.root), "fork_epoch": int(m["epoch"]),
            "log_cursor": m.get("log_epoch"),
            "partitions": len(m.get("partitions", {})),
        }))
        return 0

    if args.cmd == "export-changes":
        _ray_init()
        from chomper_ray.state.lake import LakeTable
        from chomper_ray.state.outbound import LakeChangeExporter

        ex = LakeChangeExporter(LakeTable(args.lake_root), args.out_dir,
                                table_name=args.table)
        out = ex.export()
        if args.prune_before is not None:
            out["prune"] = ex.prune(args.prune_before)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "derive":
        _ray_init()
        import pandas as pd
        import pyarrow as pa

        from chomper_ray.state.derivedtable import DerivedLakeTable
        from chomper_ray.state.lake import LakeTable, committed_epochs

        def clean_docs(df: pd.DataFrame) -> pd.DataFrame:
            keep = df[df["fetch_status"] == 200]
            return pd.DataFrame({
                "url": keep["url"],
                "lang": keep["lang"],
                "n_chars": keep["text"].fillna("")
                .str.len().astype("int64"),
            })

        out_schema = pa.schema([("url", pa.string()),
                                ("lang", pa.string()),
                                ("n_chars", pa.int64())])
        kw = {"num_partitions": args.num_partitions} \
            if args.num_partitions else {}
        dt = DerivedLakeTable(LakeTable(args.lake_root),
                              args.derived_root, clean_docs, out_schema,
                              lake_kwargs=kw)
        before = set(committed_epochs(dt.table.root))
        dt.refresh()
        after = committed_epochs(dt.table.root)
        live = dt.table.read_pandas(columns=["url"])
        print(json.dumps({
            "commits_applied": sorted(set(after) - before),
            "derived_commits": len(after),
            "upstream_cursor": dt._applied(),
            "live_rows": int(len(live)),
        }))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "backfill":
        _ray_init()
        from chomper_ray.state.backfill import LakeBackfill
        from chomper_ray.state.lake import LakeTable

        def _token_count():
            import pyarrow as pa
            import pyarrow.compute as pc

            def enrich(t):
                txt = pc.fill_null(t["text"], "")
                n = pc.list_value_length(
                    pc.split_pattern(txt, " ")).cast(pa.int64())
                if "n_tokens" in t.column_names:
                    return t.set_column(
                        t.schema.get_field_index("n_tokens"),
                        "n_tokens", n)
                return t.append_column("n_tokens", n)
            return enrich

        transforms = {"token-count": _token_count}
        bf = LakeBackfill(LakeTable(args.lake_root), args.backfill_id,
                          transforms[args.transform]())
        chunks = []
        while args.max_chunks is None or len(chunks) < args.max_chunks:
            res = bf.run_chunk(args.max_partitions)
            if res.skipped:
                break
            chunks.append({"epoch": res.epoch,
                           "partitions": res.partitions_touched})
        print(json.dumps({"id": args.backfill_id, "chunks": chunks,
                          "pending_after": bf.pending()}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "purge":
        _ray_init()
        from chomper_ray.state.lake import LakeTable

        res = LakeTable(args.lake_root).purge_tombstones(
            args.epoch, args.watermark_ts_us)
        print(json.dumps({"epoch": res.epoch, "skipped": res.skipped,
                          "rows_purged": res.rows_deleted,
                          "live_rows": res.total_rows}))
        import ray

        ray.shutdown()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
