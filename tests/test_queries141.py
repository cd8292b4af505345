"""Kernel tests for pipelines/queries141.py — Bray-Curtis extremes and
the Chao1 formula."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, sources):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_bray_curtis_extremes(tmp_path):
    from signalsharp_ray.pipelines.queries141 import q_bray_curtis_sources

    texts = ["aa bb aa", "aa bb aa", "zz yy xx"]
    sources = ["s0", "s1", "s2"]
    _write_docs(tmp_path, texts, sources)
    out = q_bray_curtis_sources(str(tmp_path)).set_index(
        ["source_a", "source_b"]
    )
    # identical mixes -> BC 0
    assert out.loc[("s0", "s1"), "bray_curtis"] == pytest.approx(0.0)
    # disjoint vocabularies share no tokens -> no pair row emitted
    assert ("s0", "s2") not in out.index


@pytest.mark.usefixtures("ray_session")
def test_chao1_formula(tmp_path):
    from signalsharp_ray.pipelines.queries141 import q_chao1_richness

    # source s0: tokens aa x3, bb x1, cc x1, dd x2
    # V=4, F1=2 (bb, cc), F2=1 (dd) -> chao1 = 4 + 2*1/(2*2) = 4.5
    _write_docs(tmp_path, ["aa aa aa bb cc dd dd"], ["s0"])
    out = q_chao1_richness(str(tmp_path))
    r = out.iloc[0]
    assert r["vocab"] == 4 and r["f1_hapax"] == 2 and r["f2_dis"] == 1
    assert r["chao1"] == pytest.approx(4.5)
