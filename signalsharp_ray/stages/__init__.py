"""Ray Data stages: vectorized map_batches / groupby transforms.

Contract notes shared by all stages:
- batches are Arrow (`batch_format="pyarrow"`) unless a kernel needs pandas
- per-series state (DP arrays, smoothing recurrences) never crosses a kernel
  call: series are co-partitioned by (host, url) via groupby before any
  sequential kernel runs
- wide operations (groupby) are preceded by in-batch partial aggregation
  wherever the aggregate is commutative
"""
