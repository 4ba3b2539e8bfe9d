"""Job CLI — the ``ray job submit`` entry point.

Usage (cluster)::

    ray job submit --working-dir . -- \
        python -m gumbo_pp_ray.cli extract \
        --input /data/interleaved --output /data/extracted \
        --files-per-wave 32 --batch-size 96

Local::

    python -m gumbo_pp_ray.cli extract --input IN --output OUT
    python -m gumbo_pp_ray.cli gen-corpus --output /tmp/corpus --docs 5000
    python -m gumbo_pp_ray.cli stats --output OUT          # lineage summary

The CLI owns the Ray session (guarded init — inside ``ray job
submit`` the session already exists). Library code never calls
ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR",
                 ignore_reinit_error=True)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_extract(args) -> int:
    ray = _ensure_ray()
    from .pipelines.extract_pipeline import run_extraction

    try:
        summary = run_extraction(
            args.input, args.output,
            split_threshold=args.split_threshold,
            batch_size=args.batch_size,
            files_per_wave=args.files_per_wave,
            resume=not args.no_resume,
            max_doc_bytes=int(args.max_doc_mb * 1024 * 1024),
        )
    except FileNotFoundError as ex:
        print(json.dumps({"error": str(ex)}), file=sys.stderr)
        ray.shutdown()
        return 2
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if summary["errors"] == 0 else 2


def cmd_gen_corpus(args) -> int:
    from .pipelines.corpus import CorpusSpec, write_corpus

    write_corpus(args.output,
                 CorpusSpec(num_docs=args.docs, seed=args.seed,
                            mega_every=args.mega_every),
                 files=args.files)
    print(json.dumps({"output": args.output, "docs": args.docs}))
    return 0


def cmd_stats(args) -> int:
    lineage = os.path.join(args.output, "_lineage")
    if not os.path.isdir(lineage):
        print(json.dumps({"error": f"no lineage under {args.output}"}))
        return 2
    waves = []
    for f in sorted(os.listdir(lineage)):
        if f.endswith(".json"):
            with open(os.path.join(lineage, f)) as fh:
                waves.append(json.load(fh))
    total = {
        "waves": len(waves),
        "docs": sum(w.get("docs", 0) for w in waves),
        "spans": sum(w.get("spans", 0) for w in waves),
        "errors": sum(w.get("errors", 0) for w in waves),
        "parse_errors": sum(w.get("parse_errors", 0) for w in waves),
        "wall_sec": round(sum(w.get("wall_sec", 0) for w in waves), 3),
    }
    print(json.dumps(total))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gumbo_pp_ray",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction job")
    pe.add_argument("--input", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--split-threshold", type=int, default=256)
    pe.add_argument("--batch-size", type=int, default=96)
    pe.add_argument("--files-per-wave", type=int, default=32)
    pe.add_argument("--max-doc-mb", type=float, default=256.0,
                    help="quarantine documents above this payload size")
    pe.add_argument("--no-resume", action="store_true")
    pe.set_defaults(fn=cmd_extract)

    pg = sub.add_parser("gen-corpus", help="write a synthetic corpus")
    pg.add_argument("--output", required=True)
    pg.add_argument("--docs", type=int, default=1000)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--mega-every", type=int, default=97)
    pg.add_argument("--files", type=int, default=8)
    pg.set_defaults(fn=cmd_gen_corpus)

    ps = sub.add_parser("stats", help="summarize a run's lineage")
    ps.add_argument("--output", required=True)
    ps.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
