"""Round-4 batch 131: the remaining multimodal actor-pool stages exposed
as registry queries — frame sampling over synthetic frame-stream video
payloads (every-Nth-frame selection with per-frame checksums) and image
resize (nearest-neighbor box resize with exact integer mean-pixel
accounting). Both rows-only by design: the payloads are deterministic
synthetic binaries with no parquet-table equivalent, and the stages'
byte-level behavior is pinned by the multimodal pytest goldens
(tests/test_queries131.py adds query-level invariants: sample-count
arithmetic, checksum determinism, resize dimensions).

Scale contracts: both stages are callable-class actor pools
(init-once), decode inside __call__ per batch, and emit only scalar
audit columns — payload bytes never re-cross the exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _r6

QUERIES131: dict = {}
ORACLES131: dict = {}


def q_frame_sample_audit(sf_dir: str, every_n: int = 2):
    """Per synthetic frame-stream item: frames in, frames kept by the
    every-Nth FrameSampler actor pool, and the int64 checksum of the
    first and last KEPT frames — the audit table a video-pipeline owner
    checks before committing to a sampling rate. Rows-only: payloads
    are deterministic synthetic binaries."""
    import ray.data as rd

    from ..stages.multimodal import sample_frames, synth_media_table

    media = synth_media_table(64, real_payloads=True)
    media = media[media["kind"] == "video"].reset_index(drop=True)
    out = sample_frames(
        rd.from_pandas(media), every_n=every_n, mode="native"
    ).to_pandas()
    rows = []
    for mid, g in out.groupby("media_id", sort=True):
        g = g.sort_values("frame_index")
        frames = [
            np.frombuffer(p, dtype=np.uint8) for p in g["payload"]
        ]
        first = int(frames[0].astype(np.int64).sum())
        last = int(frames[-1].astype(np.int64).sum())
        rows.append((int(mid), len(frames), first, last))
    return pd.DataFrame(
        rows,
        columns=["media_id", "n_kept", "first_checksum", "last_checksum"],
    ).astype(
        {
            "media_id": np.int64,
            "n_kept": np.int64,
            "first_checksum": np.int64,
            "last_checksum": np.int64,
        }
    )


def q_image_resize_audit(sf_dir: str, out_w: int = 8, out_h: int = 8):
    """Per synthetic image item: input dimensions, output dimensions
    after the ImageResizer actor pool, and the exact integer pixel sums
    before/after — resize must preserve shape contracts and keep the
    mean in the input's dynamic range. Rows-only: deterministic
    synthetic payloads (PNM and real baseline JPEG alternating)."""
    import ray.data as rd

    from ..stages.multimodal import (
        MediaDecoder,
        resize_images,
        synth_media_table,
    )

    media = synth_media_table(64, real_payloads=True)
    media = media[media["kind"] == "image"].reset_index(drop=True)
    dec = MediaDecoder(mode="native")
    in_dims = {}
    for _, r in media.iterrows():
        arr = dec.decode(r["payload"], r["kind"])
        in_dims[int(r["media_id"])] = (
            arr.shape[1],
            arr.shape[0],
            int(arr.astype(np.int64).sum()),
        )
    out = resize_images(rd.from_pandas(media), out_w, out_h).to_pandas()
    rows = []
    for _, r in out.iterrows():
        from ..stages.multimodal import _parse_pnm

        mid = int(r["media_id"])
        arr, _maxval = _parse_pnm(bytes(r["payload"]))
        iw, ih, isum = in_dims[mid]
        rows.append(
            (
                mid,
                iw,
                ih,
                int(arr.shape[1]),
                int(arr.shape[0]),
                isum,
                int(arr.astype(np.int64).sum()),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "media_id",
            "in_w",
            "in_h",
            "out_w",
            "out_h",
            "in_pixel_sum",
            "out_pixel_sum",
        ],
    ).astype({c: np.int64 for c in [
        "media_id", "in_w", "in_h", "out_w", "out_h",
        "in_pixel_sum", "out_pixel_sum",
    ]})


QUERIES131["frame_sample_audit"] = q_frame_sample_audit
QUERIES131["image_resize_audit"] = q_image_resize_audit
