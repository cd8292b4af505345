"""`ray job submit` entrypoint for the flagship rollup pipeline.

On a cluster:

    ray job submit --working-dir . -- python -m signalsharp_ray \
        --input /data/pages --out /data/tiers --buckets 1024

Locally (owns its Ray session, like bench.py — library code never inits):

    python -m signalsharp_ray --synth-rows 1000000 --out /tmp/flagship

The job is RESUMABLE: re-submitting with the same --out skips every stage
whose manifest fingerprint matches (state/manifest.py); delete a stage dir
to recompute just that stage. Exit code 0 iff every stage completed; the
final line on stdout is one JSON object with per-stage seconds, rows and
output paths — the metrics record the north rule asks each run to emit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m signalsharp_ray",
        description="Flagship web-pages -> retention-tier rollup pipeline",
    )
    src = ap.add_mutually_exclusive_group()
    src.add_argument(
        "--input",
        help="Parquet directory/file with the input_hint page schema "
        "(url, warc_ts, html, text, lang); omit for synthetic input",
    )
    src.add_argument(
        "--synth-rows",
        type=int,
        default=1_000_000,
        help="rows of deterministic synthetic pages when --input is absent",
    )
    ap.add_argument("--out", required=True, help="output root (tier parquet + manifest)")
    ap.add_argument(
        "--buckets",
        type=int,
        default=None,
        help="hash-partition count fixed at write time; size to >= 4x the "
        "LARGEST cluster that will consume this output",
    )
    ap.add_argument("--gapfill", choices=["locf", "linear"], default="locf")
    ap.add_argument(
        "--address",
        default=os.environ.get("RAY_ADDRESS", "auto"),
        help='Ray address ("auto" inside ray job submit; "local" standalone)',
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address=args.address, include_dashboard=False)
        except ConnectionError:
            # fall back to a local session only for the implicit default —
            # an explicit --address that cannot be reached is a
            # misconfiguration the user must see, not a silent local run
            if args.address != "auto":
                raise
            ray.init(address="local", include_dashboard=False)

    from signalsharp_ray.pipelines.flagship import (
        FlagshipConfig,
        run_flagship,
        run_flagship_synthetic,
    )

    cfg = FlagshipConfig(
        out_root=args.out, n_buckets=args.buckets, gapfill_method=args.gapfill
    )
    if args.input:
        import ray.data as rd

        path = args.input
        # fingerprint the contained files, not the directory: overwriting
        # a parquet file in place does not touch the parent dir's mtime,
        # and a stale fingerprint would silently resume over old outputs
        parts = []
        if os.path.isdir(path):
            for root, _, files in sorted(os.walk(path)):
                rel = os.path.relpath(root, path)
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    # relpath included: moving a file between partition
                    # dirs must change the fingerprint even when
                    # name/size/mtime survive the move
                    parts.append(f"{rel}/{f}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(path)
            parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
        import hashlib

        digest = hashlib.md5("|".join(parts).encode()).hexdigest()
        fingerprint = f"parquet:{os.path.abspath(path)}:{digest}"
        res = run_flagship(lambda: rd.read_parquet(path), fingerprint, cfg)
    else:
        from signalsharp_ray.sources.synth import WebPagesSpec

        res = run_flagship_synthetic(WebPagesSpec(n_rows=args.synth_rows), cfg)

    print(json.dumps(res, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
