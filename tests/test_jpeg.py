"""Pure-numpy baseline JPEG codec (codecs/jpeg.py) — round-trips, golden
fixtures, format-feature coverage (4:2:0, grayscale, restart markers,
byte stuffing), and the multimodal integration that closes the round-3
compressed-media stub (stages/multimodal.py strict mode)."""

import numpy as np
import pytest

from signalsharp_ray.codecs.jpeg import decode_jpeg, encode_jpeg


def _gradient(h=40, w=64):
    x = np.linspace(0, 255, w)
    return np.stack(
        [np.tile(x, (h, 1)), np.tile(x[::-1], (h, 1)), np.full((h, w), 100.0)],
        axis=-1,
    ).astype(np.uint8)


class TestRoundTrip:
    def test_flat_gray_exact(self):
        """A flat 128 image has all-zero DCT coefficients after the level
        shift — decode must be EXACT regardless of quantization."""
        img = np.full((16, 24, 3), 128, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)

    def test_smooth_gradient_near_lossless(self):
        img = _gradient()
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_chroma_subsampling_420(self):
        img = _gradient()
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    def test_grayscale(self):
        g = (np.add.outer(np.arange(24), np.arange(40)) * 3 % 256).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(g, quality=85))
        assert out.shape == g.shape
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 2

    def test_restart_markers(self):
        img = _gradient()
        plain = decode_jpeg(encode_jpeg(img, quality=90))
        with_rst = decode_jpeg(
            encode_jpeg(img, quality=90, restart_interval=3)
        )
        # restart markers change the container, not the pixels
        np.testing.assert_array_equal(plain, with_rst)

    def test_restart_markers_with_subsampling(self):
        img = _gradient()
        a = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        b = decode_jpeg(
            encode_jpeg(img, quality=90, subsample=True, restart_interval=2)
        )
        np.testing.assert_array_equal(a, b)

    def test_noise_survives_entropy_coding(self):
        """Random noise exercises every Huffman size class, ZRL runs and
        byte stuffing; decode must parse to the exact dimensions."""
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (56, 72, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=50))
        assert out.shape == img.shape

    def test_non_multiple_of_8_dims(self):
        img = _gradient(h=19, w=35)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (19, 35, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_quality_monotonic(self):
        img = _gradient()
        errs = []
        for q in (20, 60, 95):
            out = decode_jpeg(encode_jpeg(img, quality=q))
            errs.append(np.abs(out.astype(float) - img.astype(float)).mean())
        assert errs[0] >= errs[1] >= errs[2]


class TestFormatValidation:
    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"P6 1 1 255 abc")

    def test_rejects_progressive(self):
        """Swap SOF0 -> SOF2 in a valid stream: the decoder must refuse
        (progressive is not baseline) rather than mis-decode."""
        b = bytearray(encode_jpeg(_gradient(16, 16), quality=80))
        idx = b.find(b"\xff\xc0")
        assert idx > 0
        b[idx + 1] = 0xC2
        with pytest.raises(NotImplementedError, match="baseline"):
            decode_jpeg(bytes(b))

    def test_container_wellformed(self):
        """SOI/EOI framing and even-length segments."""
        b = encode_jpeg(_gradient(8, 8), quality=75)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        # DQT, SOF0, DHT, SOS all present
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in b


class TestMultimodalIntegration:
    def test_strict_mode_decodes_jpeg(self):
        from signalsharp_ray.stages.multimodal import MediaDecoder

        img = _gradient(16, 16)
        arr = MediaDecoder(mode="strict").decode(
            encode_jpeg(img, quality=90), "image"
        )
        assert arr.shape == (16, 16, 3)
        assert np.abs(arr.astype(int) - img.astype(int)).max() <= 2

    def test_strict_mode_still_stubs_audio(self):
        from signalsharp_ray.stages.multimodal import MediaDecoder

        with pytest.raises(NotImplementedError, match="MP3"):
            MediaDecoder(mode="strict").decode(b"\x00" * 64, "audio")

    def test_native_mode_dispatches_jpeg_and_pnm(self):
        from signalsharp_ray.stages.multimodal import (
            MediaDecoder, encode_pnm,
        )

        g = (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(
            np.uint8
        )
        dec = MediaDecoder(mode="native")
        assert dec.decode(encode_jpeg(g, quality=90), "image").shape == (16, 16)
        assert dec.decode(encode_pnm(g), "image").shape == (16, 16)

    def test_media_features_over_ray_with_compressed_payloads(self, ray_session):
        """End-to-end: the media table now carries REAL compressed JPEG
        payloads and the actor-pool feature stage decodes them on Ray."""
        import ray.data as rd

        from signalsharp_ray.stages.multimodal import (
            extract_features, synth_media_table,
        )

        tbl = synth_media_table(32, real_payloads=True)
        assert any(
            bytes(p)[:3] == b"\xff\xd8\xff" for p in tbl["payload"]
        ), "synth table must include compressed JPEG payloads"
        out = extract_features(
            rd.from_pandas(tbl), mode="native"
        ).to_pandas()
        assert len(out) == 32
        assert out["feature"].map(len).eq(16).all()
