"""CLI entrypoint (reference: /root/reference/cmd/main.go).

Modes: --serve (load config, run the REST server), --dump FILE,
--export FILE (JSON to stdout), --import FILE --output FILE.  Serve mode
starts a jax.profiler trace server on localhost:6060 — the TPU-native
equivalent of the reference's always-on pprof listener (cmd/main.go:15-19).
Config flags mirror cmd/config.go (dash/underscore normalized).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="syzgy-tpu",
        description="TPU-native SyzgyDB-compatible vector database")
    p.add_argument("--serve", action="store_true", help="run the REST server")
    p.add_argument("--dump", metavar="FILE", help="dump a collection file")
    p.add_argument("--export", metavar="FILE",
                   help="export a collection file as JSON to stdout")
    p.add_argument("--import", dest="import_file", metavar="FILE",
                   help="import a JSON export")
    p.add_argument("--import-ref", dest="import_ref", metavar="FILE",
                   help="import a reference SyzgyDB .dat span file "
                        "(read-only migration; tools/refimport.py)")
    p.add_argument("--output", metavar="FILE",
                   help="output collection file for --import/--import-ref")
    p.add_argument("--compact", action="store_true",
                   help="with --export: write vectors as base64 of the "
                        "packed storage bytes instead of float arrays — "
                        "~5x smaller and restores ~15x faster, "
                        "bit-identical storage (import auto-detects)")
    p.add_argument("--config", metavar="FILE", help="config file path")
    # config flags (cmd/config.go:15-22)
    for flag in ("ollama-server", "text-model", "image-model", "data-folder",
                 "syzgy-host", "html-root", "random-seed"):
        p.add_argument(f"--{flag}", dest=flag.replace("-", "_"), default=None)
    p.add_argument("--no-profiler", action="store_true",
                   help="disable the jax.profiler trace server")
    p.add_argument("--platform", default=None,
                   help="force the jax backend (e.g. cpu, tpu) — overrides "
                        "JAX_PLATFORMS even when a site hook pins it")
    return p


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    else:
        # a stale JAX_PLATFORMS=axon pin aborts backend init on containers
        # whose tunnel plugin registers as "tpu" (utils/platform.py)
        from ..utils.platform import normalize_jax_platforms
        normalize_jax_platforms()

    # persistent XLA compile cache: server restarts skip the seconds-per-
    # shape (re)compiles of the search/scatter programs
    from ..utils import xla_cache
    xla_cache.enable()

    from ..server import config as cfg_mod
    flag_argv = []
    for key in cfg_mod.DEFAULTS:
        val = getattr(args, key, None)
        if val is not None:
            flag_argv += [f"--{key}", str(val)]
    cfg = cfg_mod.load_config(flag_argv, config_file=args.config)
    cfg_mod.configure(cfg)

    if args.dump:
        from .dump import dump_index
        dump_index(args.dump)
        return 0

    if args.export:
        from ..core.collection import Collection, CollectionOptions
        from .dump import export_json
        coll = Collection(CollectionOptions(name=args.export,
                                            dimension_count=1))
        export_json(coll, sys.stdout, compact=args.compact)
        coll.close()
        return 0

    if args.import_file:
        if not args.output:
            print("--import requires --output", file=sys.stderr)
            return 2
        from .dump import import_json
        with open(args.import_file) as f:
            coll = import_json(args.output, f)
        coll.close()
        print(f"Imported into {args.output}")
        return 0

    if args.import_ref:
        if not args.output:
            print("--import-ref requires --output", file=sys.stderr)
            return 2
        from .refimport import import_ref_file
        coll = import_ref_file(args.import_ref, args.output)
        n = coll.get_document_count()
        coll.close()
        print(f"Imported {n} records from reference file into {args.output}")
        return 0

    if args.serve:
        from ..utils.hostmem import tune_host_allocator
        tune_host_allocator()
        if not args.no_profiler:
            try:
                import jax
                jax.profiler.start_server(6060)
                logging.info("jax.profiler trace server on localhost:6060")
            except Exception as exc:  # profiling is best-effort
                logging.warning("profiler server unavailable: %s", exc)
        from ..server.rest import run_server
        run_server()
        return 0

    build_parser().print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
