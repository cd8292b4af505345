"""Kernel tests for pipelines/queries163.py — Levenshtein template
probe and Burrows' Delta."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, sources):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


def test_levenshtein_kernel():
    from signalsharp_ray.pipelines.queries163 import _levenshtein

    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "abc") == 3
    assert _levenshtein("abc", "abc") == 0


@pytest.mark.usefixtures("ray_session")
def test_samelen_edit_distance_template_pair(tmp_path):
    """Two same-source same-length docs differing by one char: lev 1."""
    from signalsharp_ray.pipelines.queries163 import q_samelen_edit_distance

    texts = ["hello world xyz", "hello world xyy", "unrelated doc!!"]
    _write_docs(tmp_path, texts, ["s0", "s0", "s1"])
    out = q_samelen_edit_distance(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["lev"] == 1
    assert r["norm_sim"] == pytest.approx(1.0 - 1.0 / 15.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_samelen_cap_and_ordering(tmp_path):
    """More collision pairs than the cap: exactly 20 rows, in
    (source, n_chars, doc_a, doc_b) order."""
    from signalsharp_ray.pipelines.queries163 import q_samelen_edit_distance

    texts = ["abcdefgh"] * 10 + ["ijklmnop"] * 10  # 45 + 45 pairs
    sources = ["s0"] * 10 + ["s1"] * 10
    _write_docs(tmp_path, texts, sources)
    out = q_samelen_edit_distance(str(tmp_path))
    assert len(out) == 20
    assert (out["source"] == "s0").all()  # cap hits the first block
    assert (out["lev"] == 0).all()
    assert (out["norm_sim"] == 1.0).all()
    ordered = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ordered)
