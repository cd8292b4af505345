"""Multimodal (image/audio/video) stages.

Media travels as opaque `binary` columns with typed metadata columns
alongside. The Ray-side plumbing — schemas, actor-pool signatures, small
batch sizes for wide binary rows, output layout — is real and tested.
Decode modes:

- decode="native"  -> REAL decoding of library-free formats: binary PNM
  images (P5 gray / P6 rgb — pure byte parsing), WAV audio (stdlib
  `wave`), and video as a stream of concatenated P6 frames. No external
  codec needed; synth_media_table(real_payloads=True) generates valid
  payloads for it.
- decode="strict"  -> NotImplementedError (the stub for compressed
  formats — JPEG/MP3/H.264 need codec libraries this container lacks;
  a real deployment loads them once per actor in __init__).
- decode="fake"    -> deterministic fake decode (seeded from the payload
  bytes) for plumbing tests with arbitrary bytes.

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


# -- native, library-free codecs -------------------------------------------


def _parse_pnm(payload: bytes) -> tuple[np.ndarray, int]:
    """Binary PNM parser (P5 grayscale / P6 rgb, maxval <= 255): returns
    (array (h, w) or (h, w, 3), bytes consumed). Pure byte parsing — the
    on-disk format is a whitespace-delimited header + raw samples."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    channels = 1 if payload[:2] == b"P5" else 3
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    n = w * h * channels
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    shape = (h, w) if channels == 1 else (h, w, 3)
    return arr.reshape(shape), pos + n


def encode_pnm(arr: np.ndarray) -> bytes:
    """Inverse of _parse_pnm for uint8 arrays (used by resize/synthesis)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    magic = b"P5" if arr.ndim == 2 else b"P6"
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _parse_wav(payload: bytes) -> np.ndarray:
    """WAV (PCM int16/int8) -> float32 in [-1, 1], via the stdlib."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        n = f.getnframes()
        raw = f.readframes(n)
        width = f.getsampwidth()
    if width == 2:
        return (np.frombuffer(raw, dtype="<i2").astype(np.float32)) / 32768.0
    if width == 1:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    raise ValueError(f"unsupported WAV sample width {width}")


def _parse_pnm_stream(payload: bytes) -> np.ndarray:
    """Video-as-concatenated-P6-frames -> (frames, h, w, 3)."""
    frames = []
    pos = 0
    while pos < len(payload):
        frame, used = _parse_pnm(payload[pos:])
        frames.append(frame)
        pos += used
    return np.stack(frames)


class MediaDecoder:
    """Actor-pool decode stage. native mode decodes library-free formats
    for real (PNM + baseline-JPEG images via the pure-numpy codec in
    codecs/jpeg.py, WAV audio, concatenated-PNM video); strict decodes
    baseline JPEG and raises the honest stub for formats that need a
    codec library (MP3/H.264/progressive JPEG); fake generates
    deterministic arrays from arbitrary bytes for plumbing tests."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("strict", "fake", "native"):
            raise ValueError("mode must be 'strict', 'fake' or 'native'")
        self.mode = mode

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.mode == "strict":
            payload = bytes(payload)
            if kind == "image" and payload[:3] == b"\xff\xd8\xff":
                # baseline JPEG decodes for real (pure-numpy codec)
                from ..codecs.jpeg import decode_jpeg

                return decode_jpeg(payload)
            raise NotImplementedError(
                "Compressed-media decoding beyond baseline JPEG is "
                "stubbed: no codec library (MP3/H.264/progressive JPEG) "
                "ships in this environment. Use mode='native' for "
                "PNM/WAV/JPEG payloads, or plug a codec in __init__."
            )
        if self.mode == "native":
            payload = bytes(payload)
            if kind == "image":
                if payload[:3] == b"\xff\xd8\xff":
                    from ..codecs.jpeg import decode_jpeg

                    return decode_jpeg(payload)
                return _parse_pnm(payload)[0]
            if kind == "audio":
                return _parse_wav(payload)
            if kind == "video":
                return _parse_pnm_stream(payload)
            raise ValueError(f"Unknown media kind {kind!r}")
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


class ImageResizer:
    """Actor-pool nearest-neighbor image resize over native payloads (PNM
    or baseline JPEG, dispatched by magic) — a REAL pixel transform
    (index-gather downsample/upsample), emitting valid PNM bytes back
    out (PNM: the output of a lossy-decode stage should not re-lose)."""

    def __init__(self, new_width: int, new_height: int):
        self.new_w = int(new_width)
        self.new_h = int(new_height)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..codecs.jpeg import decode_jpeg

        ids, payloads = [], []
        for media_id, payload, kind in zip(
            batch["media_id"], batch["payload"], batch["kind"]
        ):
            if kind != "image":
                continue
            payload = bytes(payload)
            if payload[:3] == b"\xff\xd8\xff":
                img = decode_jpeg(payload)
            else:
                img, _ = _parse_pnm(payload)
            h, w = img.shape[:2]
            yi = (np.arange(self.new_h) * h // self.new_h).astype(np.int64)
            xi = (np.arange(self.new_w) * w // self.new_w).astype(np.int64)
            resized = img[yi][:, xi]
            ids.append(media_id)
            payloads.append(encode_pnm(resized))
        return pd.DataFrame(
            {
                "media_id": pd.array(ids, dtype="int64"),
                "new_width": pd.array([self.new_w] * len(ids), dtype="int32"),
                "new_height": pd.array([self.new_h] * len(ids), dtype="int32"),
                "payload": pd.array(payloads, dtype=object),
            }
        )


def resize_images(media_ds, new_width: int, new_height: int,
                  concurrency: int = 2, batch_size: int = 16):
    return media_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"new_width": new_width, "new_height": new_height},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def _synth_wav(rng: np.random.Generator, n_samples: int = 1600, rate: int = 16000) -> bytes:
    import io
    import wave

    t = np.arange(n_samples) / rate
    freq = float(rng.uniform(100, 2000))
    pcm = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_media_table(n: int = 64, seed: int = 0, real_payloads: bool = False) -> pd.DataFrame:
    """Deterministic media rows. real_payloads=True emits VALID binary
    payloads for the native decoder: P5/P6 PNM images (every 2nd image a
    COMPRESSED baseline JPEG — the pure-numpy codec round-trips them),
    16-bit PCM WAV, and video as 8 concatenated P6 frames."""
    from ..codecs.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = []
    n_img = 0
    for kind in kinds:
        if not real_payloads:
            payloads.append(rng.bytes(256))
        elif kind == "image":
            img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
            n_img += 1
            if n_img % 2 == 0:
                payloads.append(encode_jpeg(img, quality=85))
            else:
                payloads.append(encode_pnm(img))
        elif kind == "audio":
            payloads.append(_synth_wav(rng))
        else:
            frames = rng.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
            payloads.append(b"".join(encode_pnm(f) for f in frames))
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": payloads,
            "width": np.where(kinds == "audio", 0, 16).astype(np.int32),
            "height": np.where(kinds == "audio", 0, 16).astype(np.int32),
            "duration_ms": np.where(kinds == "image", 0, 1000).astype(np.int32),
        }
    )
