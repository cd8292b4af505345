"""Multimodal (image/audio/video) stages.

Media travels as opaque `binary` columns with typed metadata columns
alongside. The Ray-side plumbing — schemas, actor-pool signatures, small
batch sizes for wide binary rows, output layout — is real and tested; the
actual media DECODE is stubbed because no image/audio library ships in this
container:

- decode="strict"  -> NotImplementedError (clearly marked stub)
- decode="fake"    -> deterministic fake decode (seeded from the payload
  bytes) so downstream plumbing (feature extract, resize metadata, frame
  sampling) can be exercised end-to-end.

Schemas:
  media rows:    (media_id:int64, kind:string, payload:binary,
                  width:int32, height:int32, duration_ms:int32)
  features out:  (media_id, kind, feature:list<float>[16])
  resize out:    (media_id, new_width, new_height, payload:binary)
  frames out:    (media_id, frame_index:int32, frame_ts_ms:int32,
                  payload:binary)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import pool_size


def _payload_rng(payload: bytes) -> np.random.Generator:
    seed = int(pd.util.hash_array(np.array([payload], dtype=object))[0])
    return np.random.default_rng(seed & 0x7FFFFFFF)


class MediaDecoder:
    """Actor-pool decode stage. A real deployment would load the codec
    library here (once per actor); this container has none, so the stub
    either raises (strict) or emits a deterministic fake pixel/PCM array."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("strict", "fake"):
            raise ValueError("mode must be 'strict' or 'fake'")
        self.mode = mode

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                "Media decoding is stubbed: no image/audio codec library is "
                "available in this environment. Use mode='fake' for plumbing "
                "tests, or plug a real decoder here (loaded in __init__)."
            )
        rng = _payload_rng(payload)
        if kind == "image":
            return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        if kind == "audio":
            return (rng.normal(0, 0.2, size=1600)).astype(np.float32)
        if kind == "video":
            return rng.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
        raise ValueError(f"Unknown media kind {kind!r}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for payload, kind in zip(batch["payload"], batch["kind"]):
            arr = self.decode(payload, kind).astype(np.float64)
            flat = arr.ravel()
            # 16-dim feature: global stats + 13-bin histogram sketch
            hist, _ = np.histogram(flat, bins=13)
            f = np.concatenate(
                [[flat.mean(), flat.std(), flat.size], hist.astype(np.float64)]
            )
            feats.append(f.astype(np.float32))
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": feats,
            }
        )


def extract_features(media_ds, mode: str = "fake", concurrency: int = 2,
                     batch_size: int = 16):
    """Small batch_size: payload rows are wide; batch x concurrency must fit
    a worker heap."""
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class FrameSampler:
    """Video -> every-nth-frame rows (fake frames derived from the payload;
    the slicing/plumbing layout is the real contract)."""

    def __init__(self, every_n: int = 2, mode: str = "fake"):
        self.every_n = every_n
        self.decoder = MediaDecoder(mode)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, tss, payloads = [], [], [], []
        for media_id, payload, kind, duration in zip(
            batch["media_id"], batch["payload"], batch["kind"], batch["duration_ms"]
        ):
            if kind != "video":
                continue
            frames = self.decoder.decode(payload, "video")
            n = frames.shape[0]
            step_ms = int(duration) // max(1, n)
            for i in range(0, n, self.every_n):
                ids.append(media_id)
                idxs.append(i)
                tss.append(i * step_ms)
                payloads.append(frames[i].tobytes())
        return pd.DataFrame(
            {
                "media_id": pd.array(ids, dtype="int64"),
                "frame_index": pd.array(idxs, dtype="int32"),
                "frame_ts_ms": pd.array(tss, dtype="int32"),
                "payload": pd.array(payloads, dtype=object),
            }
        )


def sample_frames(media_ds, every_n: int = 2, mode: str = "fake",
                  concurrency: int = 2, batch_size: int = 8):
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "mode": mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def synth_media_table(n: int = 64, seed: int = 0) -> pd.DataFrame:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": [rng.bytes(256) for _ in range(n)],
            "width": np.where(kinds == "audio", 0, 16).astype(np.int32),
            "height": np.where(kinds == "audio", 0, 16).astype(np.int32),
            "duration_ms": np.where(kinds == "image", 0, 1000).astype(np.int32),
        }
    )
