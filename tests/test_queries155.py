"""Kernel tests for pipelines/queries155.py — sequence packing,
truncation loss, Kneser-Ney bigrams on constructed documents."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, source=None):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": source if source is not None else ["s0"] * n,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_sequence_packing_next_fit(tmp_path):
    """Token counts [500, 20, 512, 600->512, 100] next-fit into 512-token
    bins -> 5 bins, total 1644 capped tokens."""
    from signalsharp_ray.pipelines.queries155 import q_sequence_packing

    texts = ["w " * n for n in (500, 20, 512, 600, 100)]
    _write_docs(tmp_path, texts)
    out = q_sequence_packing(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_docs"] == 5
    assert r["total_tokens"] == 500 + 20 + 512 + 512 + 100
    assert r["n_bins"] == 5
    assert r["fill_ratio"] == pytest.approx(1644 / (5 * 512), abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_sequence_packing_fills_bins(tmp_path):
    """Docs that exactly fill: [256, 256, 256, 256] -> 2 full bins."""
    from signalsharp_ray.pipelines.queries155 import q_sequence_packing

    texts = ["w " * 256] * 4
    _write_docs(tmp_path, texts)
    out = q_sequence_packing(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["n_bins"] == 2
    assert r["fill_ratio"] == pytest.approx(1.0)


@pytest.mark.usefixtures("ray_session")
def test_truncation_loss(tmp_path):
    from signalsharp_ray.pipelines.queries155 import q_truncation_loss

    texts = ["w " * 100, "w " * 600]
    _write_docs(tmp_path, texts)
    out = (
        q_truncation_loss(str(tmp_path))
        .sort_values("max_len")
        .reset_index(drop=True)
    )
    assert list(out["max_len"]) == [128, 512, 2048]
    assert list(out["total_tokens"]) == [700, 700, 700]
    assert list(out["kept_tokens"]) == [228, 612, 700]
    assert out["loss_pct"].iloc[0] == pytest.approx(472 / 700, abs=1e-6)
    assert out["loss_pct"].iloc[2] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_kneser_ney_hand_computed(tmp_path):
    """Corpus {a b, a b, a c}: P(b|a) = 1.25/3 + (0.75*2/3)*(1/2) = 2/3,
    P(c|a) = 0.25/3 + 0.25 = 1/3 — the two interpolated probabilities
    sum to 1 over the observed continuations."""
    from signalsharp_ray.pipelines.queries155 import q_kneser_ney_bigram

    _write_docs(tmp_path, ["a b", "a b", "a c"])
    out = q_kneser_ney_bigram(str(tmp_path)).sort_values(
        ["n", "w2"], ascending=[False, True]
    ).reset_index(drop=True)
    assert len(out) == 2
    assert (out["w1"] == "a").all()
    ab = out[out["w2"] == "b"].iloc[0]
    ac = out[out["w2"] == "c"].iloc[0]
    assert ab["n"] == 2 and ac["n"] == 1
    assert ab["kn_prob"] == pytest.approx(2 / 3, abs=1e-6)
    assert ac["kn_prob"] == pytest.approx(1 / 3, abs=1e-6)
