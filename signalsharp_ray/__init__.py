"""signalsharp_ray — a Ray-Data-native time-series rollup + downsample +
retention engine with the numerical capabilities of emmorts/SignalSharp.

Layout:
  common/    constants + exceptions (epsilon values mirror reference
             /root/reference/SignalSharp/Common/Constants.cs:20-48)
  kernels/   pure numpy per-series kernels (stats, smoothing, resampling,
             PELT/CUSUM, cost functions, penalty selection, extrapolation,
             optimizers, Kalman) — the conformance corpus
  codecs/    Gorilla XOR value codec + delta-of-delta timestamp codec
  sources/   synthetic Common-Crawl-style web-page table generator + readers
  stages/    Ray Data map_batches / groupby stages (extract, rollup, gap-fill,
             encode, analysis, text, dedup, similarity, multimodal)
  pipelines/ end-to-end pipelines and the queries()/oracle_sql() registry
  state/     per-partition checkpoint manifest + lineage
"""

__version__ = "0.1.0"
