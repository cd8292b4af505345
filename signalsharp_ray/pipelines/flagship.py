"""Flagship pipeline: web pages -> extract -> rollup tiers -> gap-fill ->
Gorilla/DoD encode -> changepoint analysis, with per-stage checkpointing.

Stage graph (each box is a streamed Ray Data job; -> is a parquet handoff
recorded in the manifest so a killed run resumes at the first incomplete
stage):

    [pages] -> extract+dedup -> points.parquet
    points  -> rollup 1m     -> tier=1m.parquet
    tier=1m -> cascade 1h    -> tier=1h.parquet
    tier=1h -> cascade 1d    -> tier=1d.parquet
    tier=T  -> gapfill+encode-> blocks tier=T.parquet     (actor pool)
    tier=T  -> PELT/CUSUM    -> changepoints tier=T.parquet

Writing each tier to parquet before cascading is deliberate: it puts a
durable, resumable boundary after every shuffle, and the cascade re-reads the
(tiny) aggregate rows rather than re-shuffling raw points.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ..sources.synth import WebPagesSpec, generate_webpages_dataset
from ..common.raytools import map_partition_tables, pool_size
from ..stages.analysis import ChangepointConfig, ForecastConfig, SmoothingConfig
from ..stages.extract import build_url_dict, extract_dedup_exchange
from ..stages.rollup import TIERS_US, cascade_partition_pandas, rollup_partition_pandas
from ..state.manifest import PipelineManifest


@dataclass
class FlagshipConfig:
    out_root: str = "/tmp/signalsharp_ray/flagship"
    tiers: tuple = ("1m", "1h", "1d")
    # partition count is fixed at WRITE time and caps downstream
    # parallelism for every partition-aligned stage; size it to >= 4x the
    # LARGEST cluster this output will be consumed on, not the writer's
    # CPU count (None -> max(128, 4 x current CPUs))
    n_buckets: int | None = None
    gapfill_method: str = "locf"
    # bound the synthesized buckets per gap so sparse series never explode
    # into dense fine-tier grids (long gaps stay gaps)
    max_gap_buckets: int = 60
    encode_concurrency: int = 4
    analysis_tier: str = "1d"
    analysis_value_col: str = "count"  # crawl-rate series: real regime shifts
    changepoints: ChangepointConfig = field(
        default_factory=lambda: ChangepointConfig(
            method="pelt", cost="l2", penalty=10.0, min_size=1
        )
    )
    smoothing: SmoothingConfig = field(
        default_factory=lambda: SmoothingConfig(op="ema", alpha=0.3)
    )
    forecast: ForecastConfig = field(
        default_factory=lambda: ForecastConfig(method="linear", horizon=3)
    )
    analyze: bool = True
    smooth: bool = True
    do_forecast: bool = True
    encode: bool = True


def run_flagship(pages_ds_factory, fingerprint: str, config: FlagshipConfig | None = None):
    """Run (or resume) the flagship pipeline.

    pages_ds_factory: () -> Dataset with the input_hint schema. A factory,
    not a Dataset, so skipped stages never even build the upstream graph.
    fingerprint: identifies the input (e.g. spec params or source path+mtime).
    Returns {stage_name: parquet_dir} plus timing metrics.
    """
    cfg = config or FlagshipConfig()
    manifest = PipelineManifest(cfg.out_root)
    outputs: dict[str, str] = {}
    metrics: dict[str, float] = {}

    def timed(stage, lineage, write_fn):
        t0 = time.time()
        out, skipped = manifest.run_stage(stage, fingerprint, lineage, write_fn)
        metrics[stage] = time.time() - t0
        outputs[stage] = out
        return out, skipped

    # 1. extract (+ exact dedup on url_hash, warc_ts) — dictionary-encoded:
    # the points table carries int64 url_hash only; url/host strings live in
    # a small side dictionary written once and joined back onto final outputs
    import ray as _ray

    n_buckets = cfg.n_buckets or max(
        128, int(_ray.cluster_resources().get("CPU", 8)) * 4
    )

    def write_points(out_dir):
        # the ONE all-to-all of the whole pipeline (manual hash exchange —
        # no Ray sort): points land hash-partitioned by series key; every
        # later stage is partition-aligned and shuffle-free. The url
        # dictionary (url column only — projection pushdown, html/text
        # bytes never read; hive-partitioned on the SAME series_bucket
        # hash for co-partitioned downstream attaches) builds CONCURRENTLY
        # in a second thread: its light url-column pass hides entirely
        # under the exchange instead of serializing after it.
        def run_points():
            pts = extract_dedup_exchange(pages_ds_factory(), n_buckets=n_buckets)
            pts.write_parquet(out_dir + "/data", partition_cols=["series_bucket"])

        def run_dict():
            build_url_dict(pages_ds_factory(), n_buckets=n_buckets).write_parquet(
                out_dir + "/dict", partition_cols=["series_bucket"]
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [pool.submit(run_points), pool.submit(run_dict)]
            for f in futures:
                f.result()

    points_stage, _ = timed("points", ["pages"], write_points)
    points_dir = points_stage + "/data"
    outputs["points"] = points_dir
    outputs["url_dict"] = points_stage + "/dict"

    # 2. rollup 1m from points; cascade coarser tiers from the finer one
    prev = None
    for tier in cfg.tiers:
        tier_stage = f"tier_{tier}"
        src_dir = points_dir if prev is None else outputs[f"tier_{prev}"]
        is_first = prev is None

        def write_tier(out_dir, src_dir=src_dir, tier=tier, is_first=is_first):
            tier_us = TIERS_US[tier]
            fn = rollup_partition_pandas if is_first else cascade_partition_pandas
            out = map_partition_tables(src_dir, lambda df: fn(df, tier_us))
            out.write_parquet(out_dir, partition_cols=["series_bucket"])

        timed(tier_stage, [("points" if is_first else f"tier_{prev}")], write_tier)
        prev = tier

    # 3-5. everything downstream of the tiers is independent: run the
    # per-tier encode jobs and the analysis jobs CONCURRENTLY (each thread
    # drives its own Dataset execution; the streaming executor interleaves
    # them, overlapping per-stage fixed costs and filling idle CPUs)
    deferred = []

    if cfg.encode:
        for tier in cfg.tiers:
            def write_blocks(out_dir, tier=tier):
                from ..stages.encode import encode_partition_pandas
                from ..stages.rollup import TIERS_US

                tier_us = TIERS_US[tier]
                # fused WHOLE-PARTITION gapfill+encode: one sort + numpy
                # group slicing per partition; no per-series pandas frames
                # (the per-series path's fixed frame costs dominated this
                # stage); elastic tasks, codec is stateless — the
                # actor-pool encoder remains available as encode_tier()
                blocks = map_partition_tables(
                    outputs[f"tier_{tier}"],
                    lambda df: encode_partition_pandas(
                        df, tier, tier_us, cfg.gapfill_method, cfg.max_gap_buckets
                    ),
                )
                blocks.write_parquet(out_dir, partition_cols=["series_bucket"])

            deferred.append((f"blocks_{tier}", [f"tier_{tier}"], write_blocks))

    # 4. changepoint analysis on the configured tier
    tier_available = f"tier_{cfg.analysis_tier}" in outputs
    if cfg.analyze and tier_available:
        tier = cfg.analysis_tier

        def write_changepoints(out_dir, tier=tier):
            from ..stages.analysis import changepoints_partition_pandas

            # fused whole-partition kernel; url/host strings attach via the
            # co-partitioned dictionary (same series_bucket hash; each task
            # merges only its own partition's dict slice — no driver
            # broadcast, dict may be arbitrarily large)
            cps = map_partition_tables(
                outputs[f"tier_{tier}"],
                lambda df: changepoints_partition_pandas(
                    df, cfg.changepoints, cfg.analysis_value_col, "url_hash"
                ),
                attach_root=outputs["url_dict"],
            )
            cps.write_parquet(out_dir, partition_cols=["series_bucket"])

        deferred.append((f"changepoints_{tier}", [f"tier_{tier}"], write_changepoints))

    # 5. smoothing + forecast tables on the same tier (same aligned path)
    if cfg.smooth and tier_available:
        tier = cfg.analysis_tier

        def write_smoothed(out_dir, tier=tier):
            from ..stages.analysis import smooth_partition_pandas

            sm = map_partition_tables(
                outputs[f"tier_{tier}"],
                lambda df: smooth_partition_pandas(
                    df, cfg.smoothing, cfg.analysis_value_col, "url_hash"
                ),
            )
            sm.write_parquet(out_dir, partition_cols=["series_bucket"])

        deferred.append((f"smoothed_{tier}", [f"tier_{tier}"], write_smoothed))

    if cfg.do_forecast and tier_available:
        tier = cfg.analysis_tier
        from ..stages.rollup import TIERS_US as _T

        def write_forecast(out_dir, tier=tier):
            from ..stages.analysis import forecast_partition_pandas

            fc = map_partition_tables(
                outputs[f"tier_{tier}"],
                lambda df: forecast_partition_pandas(
                    df, cfg.forecast, _T[tier], cfg.analysis_value_col, "url_hash"
                ),
            )
            fc.write_parquet(out_dir, partition_cols=["series_bucket"])

        deferred.append((f"forecast_{tier}", [f"tier_{tier}"], write_forecast))

    if deferred:
        # pre-import modules the threads would otherwise import concurrently
        # (a mid-import module seen from a second thread loses names)
        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            pass
        with ThreadPoolExecutor(max_workers=min(6, len(deferred))) as pool:
            futures = [
                pool.submit(timed, stage, lineage, fn)
                for stage, lineage, fn in deferred
            ]
            for f in futures:
                f.result()

    return {"outputs": outputs, "metrics": metrics, "manifest": manifest.records()}


def run_flagship_synthetic(spec: WebPagesSpec | None = None, config: FlagshipConfig | None = None):
    spec = spec or WebPagesSpec()
    fingerprint = f"synth:{spec.seed}:{spec.n_rows}:{spec.n_hosts}:{spec.urls_per_host}"
    return run_flagship(lambda: generate_webpages_dataset(spec), fingerprint, config)
