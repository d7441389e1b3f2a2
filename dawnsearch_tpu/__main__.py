"""CLI: `python -m dawnsearch_tpu` runs a node; `... track` runs the tracker.

The reference ships two binaries — `dawnsearch` (src/bin/dawnsearch.rs)
and `dawntrack` (src/bin/dawntrack.rs). Here they are subcommands of one
entry point. Config comes from DawnSearch.toml + DAWNSEARCH_* env vars
(config.rs:42-73), with a few direct CLI overrides for convenience.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="dawnsearch_tpu",
        description="TPU-native distributed semantic search engine")
    parser.add_argument("--config", default="DawnSearch.toml",
                        help="TOML config path (default: DawnSearch.toml)")
    parser.add_argument("--web", action="store_true",
                        help="serve the search UI (overrides config)")
    parser.add_argument("--udp", action="store_true",
                        help="join the P2P network (overrides config)")
    parser.add_argument("--index-cc", action="store_true",
                        help="ingest Common Crawl (overrides config)")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--listen", default=None,
                        help="web listen address host:port")
    sub = parser.add_subparsers(dest="command")
    # NOTE: subparser options reuse of a parent dest CLOBBERS the
    # parent-parsed value with the subparser default (argparse copies
    # the subcommand's namespace over; verified on 3.12) — so shared
    # flags get their own sub_* dest here and merge after parsing,
    # keeping both `--config X migrate` and `migrate --config X` honest.
    track = sub.add_parser("track", help="run the rendezvous tracker "
                                         "(reference: dawntrack)")
    track.add_argument("--listen", dest="sub_listen", default=None,
                       help="tracker bind address (default 0.0.0.0:7230)")
    track.add_argument("--external-address", default=None,
                       help="advertise this address for loopback "
                            "announcers (dawntrack.rs:77-82)")
    sidecar = sub.add_parser(
        "sidecar", help="offline WARC -> embedding sidecar files, or bulk "
                        "index load (reference: src/index/warc.rs)")
    sidecar.add_argument("warcs", nargs="+",
                         help="WARC files, URLs, or Common Crawl "
                              "crawl-data/... keys to embed "
                              "(examples_old/index_url.rs), or .npz "
                              "sidecars with --load")
    sidecar.add_argument("--load", action="store_true",
                         help="bulk-load .npz sidecars into the data dir "
                              "instead of embedding WARCs")
    sidecar.add_argument("--config", dest="sub_config", default=None)
    mig = sub.add_parser(
        "migrate",
        help="compact a reference dawnsearch.sqlite (or a gappy "
             "pages.sqlite) into a fresh pages.sqlite with contiguous "
             "ids (doc/migration.md)")
    mig.add_argument("--data-dir", dest="sub_data_dir", default=None,
                     help="defaults to the config's data_dir")
    mig.add_argument("--config", dest="sub_config", default=None)
    evalq = sub.add_parser(
        "eval-quality", aliases=["evalq"],
        help="weights-drop quality gate: HF parity + separation + "
             "retrieval gates against model_dir, any of the three "
             "model families (examples/eval_quality.py); exits nonzero "
             "on a FAIL")
    evalq.add_argument("model_dir")
    evalq.add_argument("--allow-random", action="store_true")
    args = parser.parse_args(argv)
    config_path = getattr(args, "sub_config", None) or args.config

    def _apply_jax_config(cfg) -> None:
        """Before the FIRST jax device use, for EVERY subcommand that
        touches jax — sidecar once initialized on the default (axon)
        platform while the config said cpu."""
        if cfg.jax_platform:
            import jax
            jax.config.update("jax_platforms", cfg.jax_platform)
            if cfg.jax_cpu_devices > 0:
                jax.config.update("jax_num_cpu_devices",
                                  cfg.jax_cpu_devices)

    if args.command in ("eval-quality", "evalq"):
        import importlib.util
        import os as _os
        spec = importlib.util.spec_from_file_location(
            "eval_quality",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), "examples",
                "eval_quality.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        import sys as _sys
        _sys.argv = ["eval_quality.py", args.model_dir] + (
            ["--allow-random"] if args.allow_random else [])
        return mod.main()

    if args.command == "migrate":
        import json as _json

        from dawnsearch_tpu.config import Config as _Config
        from dawnsearch_tpu.index.migrate import migrate_data_dir
        data_dir = (args.sub_data_dir or args.data_dir
                    or _Config.load(config_path).data_dir)
        print(_json.dumps(migrate_data_dir(data_dir)))
        return 0

    if args.command == "sidecar":
        from dawnsearch_tpu.config import Config as _Config
        cfg = _Config.load(config_path)
        _apply_jax_config(cfg)
        if args.load:
            from dawnsearch_tpu.index.provider import SearchProvider
            from dawnsearch_tpu.ingest.sidecar import index_sidecars, load_sidecar
            from dawnsearch_tpu.node import make_index_factory
            # dim comes from the sidecars themselves — a 768-dim
            # (MPNet) sidecar against the 384 default would reject
            # every batch (round-3 review)
            dim = int(load_sidecar(args.warcs[0])[0].shape[1])
            provider = SearchProvider(
                data_dir=cfg.data_dir, dim=dim,
                index_dtype=cfg.index_dtype,
                max_pages=cfg.index_capacity,
                index_factory=make_index_factory(cfg, dim=dim))
            n = index_sidecars(provider, args.warcs)
            provider.shutdown()
            print(f"indexed {n} pages into {cfg.data_dir}")
        else:
            import os as _os

            from dawnsearch_tpu.ingest.sidecar import open_warc, write_sidecar
            from dawnsearch_tpu.node import make_encoder
            enc = make_encoder(cfg)
            for w in args.warcs:
                name, src = open_warc(w)
                # local files keep their directory (dir1/x.warc.gz and
                # dir2/x.warc.gz must not collide in the CWD); remote
                # specs land in the CWD under their basename
                base = w if _os.path.exists(w) else name
                out = base.rsplit(".warc", 1)[0] + ".sidecar.npz"
                n = write_sidecar(src, enc.encode, out)
                print(f"{w}: {n} pages -> {out}")
        return 0

    if args.command == "track":
        from dawnsearch_tpu.net.tracker import Tracker
        Tracker(args.sub_listen or "0.0.0.0:7230",
                external_address=args.external_address).run_forever()
        return 0

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.node import DawnNode

    cfg = Config.load(config_path)
    # Must run before the first jax device use; lets a node run on
    # CPU (dev boxes, co-located test clusters) or pin a platform.
    _apply_jax_config(cfg)
    if args.web:
        cfg.web = True
    if args.udp:
        cfg.udp = True
    if args.index_cc:
        cfg.index_cc = True
    if args.data_dir:
        cfg.data_dir = args.data_dir
    if args.listen:
        cfg.web_listen_address = args.listen
    print(cfg.summary())
    if cfg.dist_num_processes > 1:
        # multi-host crew: join the cluster before first device use;
        # non-leader processes run the SPMD follower loop instead of a
        # node (parallel/multihost.py)
        from dawnsearch_tpu.parallel import multihost
        multihost.init_distributed(cfg.dist_coordinator,
                                   cfg.dist_num_processes,
                                   cfg.dist_process_id)
        if cfg.dist_process_id > 0:
            multihost.follower_main(cfg)
            return 0
    node = DawnNode(cfg).start()
    node.run_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
