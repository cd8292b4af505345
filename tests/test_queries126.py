"""Kernel tests for pipelines/queries126.py — BPE-ish pattern counting,
OOV against the deterministic vocab cut, token-length shares."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, sources=None, langs=None):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": langs if langs is not None else ["en"] * n,
            "source": sources if sources is not None else ["s0"] * n,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_bpe_estimate_splits_mixed_runs(tmp_path):
    from signalsharp_ray.pipelines.queries126 import q_bpe_token_estimate

    # "ab12cd" = 1 ws token but 3 BPE-ish tokens (ab / 12 / cd);
    # "x-y" = 1 ws token, 3 BPE-ish (x / - / y)
    _write_docs(tmp_path, ["ab12cd x-y"])
    out = q_bpe_token_estimate(str(tmp_path))
    r = out.iloc[0]
    assert r["ws_tokens"] == 2
    # ab,12,cd, " x","-","y" = 6
    assert r["bpe_tokens"] == 6
    assert r["fertility"] == pytest.approx(3.0)


@pytest.mark.usefixtures("ray_session")
def test_oov_rate_counts_occurrences_outside_vocab(tmp_path):
    from signalsharp_ray.pipelines import queries126

    # shrink the vocab to 2 for the test
    orig = queries126.OOV_VOCAB_K
    queries126.OOV_VOCAB_K = 2
    try:
        # counts: aa x4, bb x3, cc x2, dd x1 -> vocab {aa, bb}
        _write_docs(
            tmp_path,
            ["aa aa bb cc", "aa aa bb bb cc dd"],
            sources=["s0", "s1"],
        )
        out = queries126.q_oov_rate(str(tmp_path)).set_index("source")
        assert out.loc["s0", "n_tokens"] == 4
        assert out.loc["s0", "n_oov"] == 1  # cc
        assert out.loc["s1", "n_oov"] == 2  # cc + dd
    finally:
        queries126.OOV_VOCAB_K = orig


@pytest.mark.usefixtures("ray_session")
def test_token_length_histogram_shares(tmp_path):
    from signalsharp_ray.pipelines.queries126 import q_token_length_histogram

    _write_docs(tmp_path, ["a bb bb ccc"], langs=["en"])
    out = q_token_length_histogram(str(tmp_path)).set_index("tok_len")
    assert out.loc[1, "n_tokens"] == 1
    assert out.loc[2, "n_tokens"] == 2
    assert out.loc[3, "n_tokens"] == 1
    assert out.loc[2, "share"] == pytest.approx(0.5)
