"""Extract stage: raw web-page rows -> (url, host, ts, value) points.

Vectorized Arrow kernel (zero-copy batches):
- host parsed from the url with a pyarrow regex extract
- value = extracted-text length in UTF-8 bytes (deterministic per-row metric;
  combined with text_hash it makes the "byte-identical extracted text per
  url" invariant checkable downstream)
- html is dropped immediately (wide binary never travels past this stage)

Dedup: duplicate (url, warc_ts) crawl rows collapse to one point via
hash-partitioned groupby + first (exact dedup; aggregates are computed after
dedup so re-crawled pages don't double count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

POINT_COLUMNS = ["url", "host", "ts", "value", "text_hash", "url_hash"]


def extract_points_batch(batch: pa.Table) -> pa.Table:
    url = batch["url"]
    host = pc.extract_regex(url, r"^[a-z]+://(?P<host>[^/]+)")
    host = pc.struct_field(host, "host")
    value = pc.cast(pc.binary_length(pc.cast(batch["text"], pa.binary())), pa.float64())
    # 64-bit vectorized content hashes: text_hash for the byte-identity
    # invariant, url_hash as the cheap integer partition key every later
    # shuffle buckets on (strings never get re-hashed downstream)
    text_hash = _hash_strings(batch["text"])
    url_hash = _hash_strings(url)
    return pa.table(
        {
            "url": url,
            "host": host,
            "ts": batch["warc_ts"],
            "value": value,
            "text_hash": text_hash,
            "url_hash": url_hash,
        }
    )


def _hash_strings(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Stable 64-bit content hash per string — pandas' vectorized (C-level)
    siphash with a fixed key, deterministic across processes and runs."""
    import pandas as pd

    values = arr.to_numpy(zero_copy_only=False)
    hashed = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
    return pa.array(hashed.view(np.int64), pa.int64())


def extract_points(pages_ds, drop_duplicates: bool = True):
    """pages Dataset (input_hint schema) -> points Dataset.

    The html column is pruned before the first batch function runs; dedup is
    an exact hash-partitioned first-row-per-(url, warc_ts).
    """
    ds = pages_ds.select_columns(["url", "warc_ts", "text"])
    pts = ds.map_batches(extract_points_batch, batch_format="pyarrow")
    if drop_duplicates:
        pts = dedup_points(pts)
    return pts


def _first_per_key(batch: pa.Table) -> pa.Table:
    """Keep the first row of each (url, ts) key inside a batch (pure-numpy
    in-batch pre-dedup on the integer (url_hash, ts) pair)."""
    uh = batch["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
    key = uh * np.uint64(1000003) ^ ts
    _, first_idx = np.unique(key, return_index=True)
    if first_idx.size == len(batch):
        return batch
    return batch.take(pa.array(np.sort(first_idx)))


def _restore_host(batch: pa.Table) -> pa.Table:
    host = pc.struct_field(
        pc.extract_regex(batch["url"], r"^[a-z]+://(?P<host>[^/]+)"), "host"
    )
    return batch.append_column("host", host).select(POINT_COLUMNS)


def dedup_points(points_ds):
    """Exact dedup on (url, ts) as a pure hash-AGGREGATION, never a
    per-group python call (one pandas group per row is pathological at
    scale): duplicate crawl rows carry identical payloads (same url =>
    byte-identical text => same value/hash; host is a function of url), so
    `min` over each duplicate set reproduces the row exactly. In-batch
    pre-dedup first, so the shuffle moves mostly-unique rows. The final
    merge is a bucketed C++ aggregation (see hash_bucket_aggregate) because
    (url, ts) is per-row cardinality."""
    from ..common.raytools import hash_bucket_aggregate

    pre = points_ds.map_batches(_first_per_key, batch_format="pyarrow")
    agg = hash_bucket_aggregate(
        pre,
        ["url", "ts"],
        [("value", "min"), ("text_hash", "min"), ("url_hash", "min")],
        bucket_cols=["url_hash"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "ts": batch["ts"],
                "value": batch["value_min"],
                "text_hash": batch["text_hash_min"],
                "url_hash": batch["url_hash_min"],
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").map_batches(
        _restore_host, batch_format="pyarrow"
    )


def check_text_byte_identity(points_ds) -> int:
    """Return the number of urls violating the byte-identical-text-per-url
    invariant (0 expected). Aggregates nunique(text_hash) per url with an
    in-batch partial (url, hash) distinct first, so the shuffle only moves
    distinct pairs."""
    import pandas as pd

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[["url", "text_hash"]].drop_duplicates()

    pairs = points_ds.map_batches(distinct_pairs, batch_format="pandas")
    per_url = pairs.groupby("url").map_groups(
        lambda df: pd.DataFrame(
            {"url": [df["url"].iloc[0]], "n_variants": [df["text_hash"].nunique()]}
        ),
        batch_format="pandas",
    )
    bad = per_url.filter(expr="n_variants > 1")
    return bad.count()


def extract_points_compact(pages_ds, drop_duplicates: bool = True, keep_bucket: bool = False):
    """Dictionary-encoded extract: returns (points_ds, url_dict_ds).

    points:   (url_hash:int64, ts, value, text_hash) — every downstream
              shuffle (dedup, rollup, series assembly) moves int64 keys
              instead of url/host strings (~4x fewer shuffle bytes; at
              10^12 rows this is the difference between a sort that fits
              and one that does not).
    url_dict: (url_hash, url, host) — one row per distinct url; joined back
              onto final outputs (broadcast at this scale; co-partitioned
              dictionary join on a cluster).
    """
    from ..common.raytools import hash_bucket_aggregate

    pts_full = pages_ds.select_columns(["url", "warc_ts", "text"]).map_batches(
        extract_points_batch, batch_format="pyarrow"
    )

    def compact(batch: pa.Table) -> pa.Table:
        return batch.select(["url_hash", "ts", "value", "text_hash"])

    def batch_dict(batch: pa.Table) -> pa.Table:
        t = batch.select(["url_hash", "url", "host"])
        g = t.group_by(["url_hash"], use_threads=False).aggregate(
            [("url", "min"), ("host", "min")]
        )
        return g.rename_columns(["url_hash", "url", "host"])

    points = pts_full.map_batches(compact, batch_format="pyarrow")
    if drop_duplicates:
        points = dedup_points_compact(points, keep_bucket=keep_bucket)

    dict_partial = pts_full.map_batches(batch_dict, batch_format="pyarrow")
    agg = hash_bucket_aggregate(
        dict_partial, ["url_hash"], [("url", "min"), ("host", "min")]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url_hash": batch["url_hash"],
                "url": batch["url_min"],
                "host": batch["host_min"],
            }
        )

    url_dict = agg.map_batches(rename, batch_format="pyarrow")
    return points, url_dict


def _first_per_key_compact(batch: pa.Table) -> pa.Table:
    uh = batch["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
    key = uh * np.uint64(1000003) ^ ts
    _, first_idx = np.unique(key, return_index=True)
    if first_idx.size == len(batch):
        return batch
    return batch.take(pa.array(np.sort(first_idx)))


def dedup_points_compact(points_ds, keep_bucket: bool = False):
    """Exact (url_hash, ts) dedup over the compact schema — int-only shuffle.

    With keep_bucket=True the series-hash bucket column survives as
    `series_bucket`: the points parquet is then hive-partitioned by it and
    THIS is the pipeline's only shuffle — rollup, cascade, gap-fill, encode
    and analysis all consume partitions aligned on the same key.
    """
    from ..common.raytools import hash_bucket_aggregate

    pre = points_ds.map_batches(_first_per_key_compact, batch_format="pyarrow")
    agg = hash_bucket_aggregate(
        pre,
        ["url_hash", "ts"],
        [("value", "min"), ("text_hash", "min")],
        bucket_cols=["url_hash"],
        keep_bucket=keep_bucket,
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {
            "url_hash": batch["url_hash"],
            "ts": batch["ts"],
            "value": batch["value_min"],
            "text_hash": batch["text_hash_min"],
        }
        if keep_bucket:
            cols["series_bucket"] = batch["__bucket"]
        return pa.table(cols)

    return agg.map_batches(rename, batch_format="pyarrow")


def attach_url_dict(ds, url_dict_df, key: str = "url_hash"):
    """Join url/host strings back onto url_hash-keyed rows via a broadcast
    dictionary: ray.put ONCE on the driver, ray.get per task (plasma reads
    of the same object are shared on a node). Stateless tasks scale
    elastically; an actor pool here was measured 4x slower (startup +
    capped concurrency dominate for small outputs)."""
    import pandas as pd
    import ray

    ref = ray.put(url_dict_df)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        return batch.merge(lookup, on=key, how="left")

    return ds.map_batches(attach, batch_format="pandas")


def build_url_dict(pages_ds, n_buckets: int | None = None):
    """(url_hash, url, host) dictionary from the url column alone — the
    projection pushes down to the parquet read, so this never touches
    html/text bytes (unlike re-running the full extract).

    With n_buckets set, the output carries `series_bucket` = url_hash %
    n_buckets — the SAME bucketing as extract_dedup_exchange — so the dict
    can be written hive-partitioned and joined co-partitioned downstream
    (map_partition_dirs attach_root) with no shuffle and no broadcast."""
    from ..common.raytools import hash_bucket_aggregate

    def batch_dict(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        host = pc.struct_field(
            pc.extract_regex(url, r"^[a-z]+://(?P<host>[^/]+)"), "host"
        )
        t = pa.table({"url_hash": _hash_strings(url), "url": url, "host": host})
        g = t.group_by(["url_hash"], use_threads=False).aggregate(
            [("url", "min"), ("host", "min")]
        )
        return g.rename_columns(["url_hash", "url", "host"])

    partial = pages_ds.select_columns(["url"]).map_batches(
        batch_dict, batch_format="pyarrow"
    )
    agg = hash_bucket_aggregate(
        partial, ["url_hash"], [("url", "min"), ("host", "min")]
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {
            "url_hash": batch["url_hash"],
            "url": batch["url_min"],
            "host": batch["host_min"],
        }
        if n_buckets is not None:
            uh = batch["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
            cols["series_bucket"] = pa.array(
                (uh % np.uint64(n_buckets)).astype(np.int64)
            )
        return pa.table(cols)

    return agg.map_batches(rename, batch_format="pyarrow")


def extract_dedup_exchange(pages_ds, n_buckets: int | None = None):
    """Extract + exact dedup via the manual hash exchange (single all-to-all,
    no Ray sort): returns a Dataset of deduplicated compact points carrying
    `series_bucket` — ready to be written hive-partitioned."""
    from ..common.raytools import default_buckets, hash_exchange

    if n_buckets is None:
        n_buckets = default_buckets()

    def extract_compact_bucket(batch: pa.Table) -> pa.Table:
        # LEAN extract for the exchange path: no host regex, no url/host
        # string columns — only the int64-keyed compact row ever exists
        # (url/host strings live in the separately-built dictionary)
        value = pc.cast(
            pc.binary_length(pc.cast(batch["text"], pa.binary())), pa.float64()
        )
        t = pa.table(
            {
                "url_hash": _hash_strings(batch["url"]),
                "ts": batch["warc_ts"],
                "value": value,
                "text_hash": _hash_strings(batch["text"]),
            }
        )
        t = _first_per_key_compact(t)
        uh = t["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bucket = (uh % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(bucket))

    bucketed = pages_ds.select_columns(["url", "warc_ts", "text"]).map_batches(
        extract_compact_bucket, batch_format="pyarrow"
    )

    def reduce_dedup(t: pa.Table) -> pa.Table:
        bucket_val = t["__bucket"][0].as_py()
        t = t.drop_columns(["__bucket"])
        g = t.group_by(["url_hash", "ts"], use_threads=False).aggregate(
            [("value", "min"), ("text_hash", "min")]
        )
        g = g.rename_columns(["url_hash", "ts", "value", "text_hash"])
        return g.append_column(
            "series_bucket",
            pa.array(np.full(g.num_rows, bucket_val, dtype=np.int64)),
        )

    def partial_dedup(t: pa.Table) -> pa.Table:
        # associative, schema-preserving combiner for the overlapped
        # exchange: min-of-min per (url_hash, ts) == one min over the
        # concatenation, and __bucket (constant within a bucket's slices)
        # rides through so reduce_dedup's contract is unchanged
        g = t.group_by(["url_hash", "ts", "__bucket"], use_threads=False).aggregate(
            [("value", "min"), ("text_hash", "min")]
        )
        g = g.rename_columns(["url_hash", "ts", "__bucket", "value", "text_hash"])
        return g.select(["url_hash", "ts", "value", "text_hash", "__bucket"])

    return hash_exchange(bucketed, n_buckets, reduce_dedup, partial_fn=partial_dedup)
