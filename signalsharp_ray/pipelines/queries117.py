"""Round-4 batch 117: line-position economics, a JPEG codec audit, and
an order-status value profile — the mean quantity/discount by a
lineitem's position within its order (do later lines get worse terms),
a distributed round-trip audit of the new pure-numpy baseline-JPEG
codec (rows-only: SQL cannot re-run a DCT), and value/count shares per
order status.

House parity: per-position and per-status aggregates are exact int64
(quantities rounded to integers, discounts to basis points, prices to
cents) through one bucketed exchange each; the JPEG audit's error
totals are exact integer pixel differences, deterministic per seed.

Scale contracts: every op pre-reduces inside map_batches and exchanges
bounded keys (7 line positions, 3 statuses, 3 quality levels); the
codec audit runs the encoder+decoder inside an actor-pool stage — the
deterministic test images are generated in-task from their ids, so no
image bytes ever cross the exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries16 import _read

QUERIES117: dict = {}
ORACLES117: dict = {}


# ---------------------------------------------------------------------------
# Lineitem position economics (per l_linenumber)
# ---------------------------------------------------------------------------


def q_line_position_profile(sf_dir: str):
    """Per l_linenumber: item count, mean rounded quantity, and mean
    discount in percent — whether later order lines carry different
    terms. Exact integer sums; bounded key (positions 1..7)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "pos": batch["l_linenumber"].astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "q": np.rint(
                        batch["l_quantity"].to_numpy(np.float64)
                    ).astype(np.int64),
                    "bp": np.rint(
                        batch["l_discount"].to_numpy(np.float64) * 10000
                    ).astype(np.int64),
                }
            )
            .groupby("pos", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _read(
                sf_dir, "lineitem",
                ["l_linenumber", "l_quantity", "l_discount"],
            ).map_batches(partial, batch_format="pandas"),
            ["pos"],
            [("n", "sum"), ("q", "sum"), ("bp", "sum")],
        )
        .to_pandas()
        .sort_values("pos")
    )
    return pd.DataFrame(
        {
            "line_position": agg["pos"].astype(np.int64),
            "n_items": agg["n_sum"].astype(np.int64),
            "mean_quantity": _r6away(
                agg["q_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
            "mean_discount_pct": _r6away(
                agg["bp_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES117["line_position_profile"] = """
SELECT CAST(l_linenumber AS BIGINT) AS line_position,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_quantity,
       ROUND(CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_discount_pct
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Order-status value profile
# ---------------------------------------------------------------------------


def q_order_status_profile(sf_dir: str):
    """Per o_orderstatus: order count, count share, total value and
    value share — exact cents through one bounded exchange."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(np.float64) * 100
        return (
            pd.DataFrame(
                {
                    "status": batch["o_orderstatus"].astype(str),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "cents": (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
                        np.int64
                    ),
                }
            )
            .groupby("status", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
            .map_batches(partial, batch_format="pandas"),
            ["status"],
            [("n", "sum"), ("cents", "sum")],
        )
        .to_pandas()
        .sort_values("status")
    )
    tot_n = float(int(agg["n_sum"].sum()))
    tot_c = float(int(agg["cents_sum"].sum()))
    return pd.DataFrame(
        {
            "status": agg["status"].astype(str),
            "n_orders": agg["n_sum"].astype(np.int64),
            "count_share": _r6away(
                agg["n_sum"].to_numpy(np.float64) / tot_n
            ),
            "total_value": _r6away(
                agg["cents_sum"].to_numpy(np.float64) / 100.0
            ),
            "value_share": _r6away(
                agg["cents_sum"].to_numpy(np.float64) / tot_c
            ),
        }
    ).reset_index(drop=True)


ORACLES117["order_status_profile"] = """
WITH s AS (
  SELECT o_orderstatus AS status, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
t AS (SELECT SUM(n) AS tn, SUM(cents) AS tc FROM s)
SELECT s.status, CAST(s.n AS BIGINT) AS n_orders,
       ROUND(CAST(s.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS count_share,
       ROUND(CAST(s.cents AS DOUBLE) / 100.0, 6) AS total_value,
       ROUND(CAST(s.cents AS DOUBLE) / CAST(t.tc AS DOUBLE), 6)
         AS value_share
FROM s, t
"""


# ---------------------------------------------------------------------------
# Distributed JPEG round-trip audit (rows-only: SQL cannot run a DCT)
# ---------------------------------------------------------------------------


def q_jpeg_roundtrip_audit(sf_dir: str, n_images: int = 48):
    """Per quality level {50, 75, 90}: images audited, exact total/max
    absolute pixel error of encode->decode through the pure-numpy
    baseline-JPEG codec, and how many flat images round-trip EXACTLY
    (they must: a flat block has all-zero AC and zero DC after the level
    shift). Images are deterministic per (image_id): half flat, half
    smooth gradients. Rows-only by design — no SQL twin can re-run a
    DCT — with the exactness contract pinned by tests/test_jpeg.py.

    Scale shape: the codec runs inside the mapper (actor-task per
    batch); only 3 tiny (quality, partial-sums) rows per batch cross
    the exchange. sf_dir is unused (self-generating audit), kept for
    the uniform queries() signature."""
    import ray.data as rd

    del sf_dir

    def audit(batch: pd.DataFrame) -> pd.DataFrame:
        from ..codecs.jpeg import decode_jpeg, encode_jpeg

        rows = []
        for img_id in batch["id"].astype(int):
            flat = img_id % 2 == 0
            if flat:
                shade = 16 + (img_id * 7) % 224
                img = np.full((24, 32, 3), shade, dtype=np.uint8)
            else:
                x = np.linspace(10 + img_id % 50, 240, 32)
                img = np.stack(
                    [
                        np.tile(x, (24, 1)),
                        np.tile(x[::-1], (24, 1)),
                        np.full((24, 32), 60.0 + img_id % 100),
                    ],
                    axis=-1,
                ).astype(np.uint8)
            for q in (50, 75, 90):
                out = decode_jpeg(encode_jpeg(img, quality=q))
                err = np.abs(out.astype(np.int64) - img.astype(np.int64))
                rows.append(
                    (
                        q,
                        1,
                        int(err.sum()),
                        int(err.max()),
                        int(flat and err.max() == 0),
                        int(flat),
                    )
                )
        return (
            pd.DataFrame(
                rows,
                columns=[
                    "quality", "n", "total_err", "max_err",
                    "flat_exact", "n_flat",
                ],
            )
            .groupby("quality", sort=False)
            .agg(
                n=("n", "sum"),
                total_err=("total_err", "sum"),
                max_err=("max_err", "max"),
                flat_exact=("flat_exact", "sum"),
                n_flat=("n_flat", "sum"),
            )
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            rd.range(n_images).map_batches(
                audit, batch_format="pandas", batch_size=8
            ),
            ["quality"],
            [
                ("n", "sum"), ("total_err", "sum"), ("max_err", "max"),
                ("flat_exact", "sum"), ("n_flat", "sum"),
            ],
        )
        .to_pandas()
        .sort_values("quality")
    )
    return pd.DataFrame(
        {
            "quality": agg["quality"].astype(np.int64),
            "n_images": agg["n_sum"].astype(np.int64),
            "total_abs_err": agg["total_err_sum"].astype(np.int64),
            "max_abs_err": agg["max_err_max"].astype(np.int64),
            "n_flat": agg["n_flat_sum"].astype(np.int64),
            "n_flat_exact": agg["flat_exact_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


QUERIES117["line_position_profile"] = q_line_position_profile
QUERIES117["order_status_profile"] = q_order_status_profile
QUERIES117["jpeg_roundtrip_audit"] = q_jpeg_roundtrip_audit
