"""Deterministic synthetic Common-Crawl-style web-page table.

Schema (BASELINE.json input_hint):
    url:     string      https://{host}/{path}
    warc_ts: timestamp[us]
    html:    binary
    text:    string      deterministic function of url ONLY, so the
                         "byte-identical extracted text per url" invariant is
                         checkable (same url -> same text on every crawl row)
    lang:    string

Hosts follow a Zipf-like power law (hot-host skew is intentional; the rollup
stage must handle it). Every row is a pure function of (seed, row_index), so
any shard can be regenerated independently — the generator scales by fanning
shards out as Ray tasks with no driver-side materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_WORDS = np.array(
    "the of and a to in is was he for it with as his on be at by i this had not are but from or have an they which one you were her all she there would their we him been has when who will more no if out so said what up its about into than them can only other new some could time these two may then do first any my now such like our over man me even most made after also did many before must through back years where much your way well down should because each just those people mr how too little state good very make world still own see men work long get here between both life being under never day same another know while last might us great old year off come since against go came right used take three".split()
)  # 100 common English words — deterministic filler corpus


@dataclass
class WebPagesSpec:
    n_rows: int = 100_000
    n_hosts: int = 1_000
    urls_per_host: int = 20
    seed: int = 42
    # crawl window: 2024-01-01 .. 2024-01-31 (us precision)
    t0_us: int = 1_704_067_200_000_000
    span_us: int = 30 * 24 * 3600 * 1_000_000
    zipf_exponent: float = 1.2
    rows_per_shard: int = 100_000

    @property
    def n_shards(self) -> int:
        return max(1, -(-self.n_rows // self.rows_per_shard))


_LANGS = np.array(["en", "en", "en", "en", "de", "fr", "es", "zh", "ru", "pt"])


def _host_probabilities(spec: WebPagesSpec) -> np.ndarray:
    ranks = np.arange(1, spec.n_hosts + 1, dtype=np.float64)
    p = ranks ** (-spec.zipf_exponent)
    return p / p.sum()


def _text_one(h: int, u: int, seed: int) -> str:
    key = (h * 131_071 + u * 8_191 + seed) & 0x7FFFFFFF
    rng = np.random.default_rng(key)
    n_words = 20 + int(rng.integers(0, 180))
    words = _WORDS[rng.integers(0, _WORDS.size, n_words)]
    return " ".join(words.tolist())


def _text_for(host_id: np.ndarray, url_id: np.ndarray, seed: int) -> list[str]:
    """Deterministic per-url text: a word sequence keyed by (host_id, url_id).

    Independent of warc_ts by construction -> byte-identical per url.
    Generated once per UNIQUE (host, url) pair, then gathered — rows share
    urls heavily so this is orders of magnitude cheaper than per-row RNG.
    """
    pair = host_id.astype(np.int64) * 1_000_003 + url_id.astype(np.int64)
    uniq, inverse = np.unique(pair, return_inverse=True)
    texts = np.empty(uniq.size, dtype=object)
    for i, p in enumerate(uniq.tolist()):
        h, u = divmod(p, 1_000_003)
        texts[i] = _text_one(h, u, seed)
    return texts[inverse].tolist()


def generate_webpages_shard(shard: int, spec: WebPagesSpec) -> pa.Table:
    """Rows [shard*rows_per_shard, ...) as one Arrow table. Pure function of
    (spec.seed, shard)."""
    start = shard * spec.rows_per_shard
    stop = min(start + spec.rows_per_shard, spec.n_rows)
    n = stop - start
    if n <= 0:
        return _empty_table()
    rng = np.random.default_rng((spec.seed << 20) ^ shard)
    probs = _host_probabilities(spec)
    host_id = rng.choice(spec.n_hosts, size=n, p=probs)
    url_id = rng.integers(0, spec.urls_per_host, size=n)
    ts = spec.t0_us + rng.integers(0, spec.span_us, size=n)
    # every 5th host is "bursty": crawl intensity jumps after the window
    # midpoint (a real changepoint in the per-bucket count series, while the
    # per-url text — and so the value series — stays byte-identical)
    bursty = host_id % 5 == 0
    late = rng.random(n) < 0.75
    half = spec.span_us // 2
    ts = np.where(
        bursty,
        spec.t0_us + np.where(late, half + rng.integers(0, half, size=n), rng.integers(0, half, size=n)),
        ts,
    )

    hosts = np.char.add(
        np.char.add("host", host_id.astype("U8")), ".example.com"
    )
    urls = [
        f"https://{h}/page/{u}" for h, u in zip(hosts.tolist(), url_id.tolist())
    ]
    texts = _text_for(host_id, url_id, spec.seed)
    htmls = [
        b"<html><body><p>" + t.encode("utf-8") + b"</p></body></html>" for t in texts
    ]
    langs = _LANGS[(host_id * 7 + url_id) % _LANGS.size]

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )


def _empty_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }
    )


def generate_webpages_dataset(spec: WebPagesSpec):
    """Lazy ray.data.Dataset over all shards; each shard is generated inside
    a Ray task (no driver materialization)."""
    import ray.data as rd

    def make(batch: pa.Table) -> pa.Table:
        tables = [
            generate_webpages_shard(s, spec)
            for s in batch["id"].to_numpy(zero_copy_only=False).tolist()
        ]
        return pa.concat_tables(tables)

    return (
        rd.range(spec.n_shards)
        .repartition(spec.n_shards)
        .map_batches(make, batch_format="pyarrow")
    )


def write_webpages_parquet(out_dir: str, spec: WebPagesSpec) -> str:
    """Materialize the synthetic table as parquet (bench caching helper).

    Must run inside an active Ray session.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    generate_webpages_dataset(spec).write_parquet(out_dir)
    return out_dir
