"""Query-level invariants for pipelines/queries131.py — frame-sampling
arithmetic and resize shape/range contracts over the deterministic
synthetic media table."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_frame_sample_counts_and_determinism():
    from signalsharp_ray.pipelines.queries131 import q_frame_sample_audit

    a = q_frame_sample_audit("unused")
    b = q_frame_sample_audit("unused")
    assert len(a) > 0
    # deterministic synthetic payloads -> identical audits run to run
    assert a.equals(b)
    assert (a["n_kept"] >= 1).all()
    # every-2nd sampling keeps first frame; checksums are real sums
    assert (a["first_checksum"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_frame_sample_every_n_scales_counts():
    from signalsharp_ray.pipelines.queries131 import q_frame_sample_audit

    every2 = q_frame_sample_audit("unused", every_n=2).set_index("media_id")
    every4 = q_frame_sample_audit("unused", every_n=4).set_index("media_id")
    # keeping every 4th frame can never keep more than every 2nd
    joined = every2.join(every4, lsuffix="_2", rsuffix="_4")
    assert (joined["n_kept_4"] <= joined["n_kept_2"]).all()
    # first kept frame (index 0) is shared
    assert (joined["first_checksum_4"] == joined["first_checksum_2"]).all()


@pytest.mark.usefixtures("ray_session")
def test_image_resize_shapes_and_range():
    from signalsharp_ray.pipelines.queries131 import q_image_resize_audit

    out = q_image_resize_audit("unused", out_w=8, out_h=8)
    assert len(out) > 0
    assert (out["out_w"] == 8).all() and (out["out_h"] == 8).all()
    # nearest-neighbor picks existing pixels: sums bounded by 255 * pixels
    assert (out["out_pixel_sum"] <= 255 * 8 * 8 * 3).all()
    assert (out["out_pixel_sum"] >= 0).all()
    # downsampling a 16x16 to 8x8 keeps a quarter-ish of mass, never more
    assert (out["out_pixel_sum"] < out["in_pixel_sum"]).all()
