"""Known-answer tests for pipelines/queries9.py over a tiny synthetic
documents/embeddings fixture."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries9 import (
    q_char_trigram_profile,
    q_embedding_dim_stats,
    q_hapax_ratio_by_source,
    q_token_length_histogram,
)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("q9")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["aa bb aa", "bb ccc", "zz zz zz"]),
            "lang": pa.array(["en", "en", "de"]),
            "source": pa.array(["s1", "s1", "s2"]),
            "n_chars": pa.array([8, 6, 8], pa.int64()),
        }
    )
    pq.write_table(docs, d / "documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[0.5, -0.25], [0.25, 0.25]], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1], pa.int32()),
        }
    )
    pq.write_table(emb, d / "embeddings.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_token_length_histogram_known(sf_dir):
    out = q_token_length_histogram(sf_dir)
    got = {(r.source, r.token_len): r.n_tokens for r in out.itertuples()}
    # s1: aa,bb,aa,bb (len2) + ccc (len3); s2: zz x3 (len2)
    assert got == {("s1", 2): 4, ("s1", 3): 1, ("s2", 2): 3}


@pytest.mark.usefixtures("ray_session")
def test_hapax_ratio_known(sf_dir):
    out = q_hapax_ratio_by_source(sf_dir).set_index("source")
    # s1 vocab {aa:2, bb:2, ccc:1} -> hapax 1/3; s2 {zz:3} -> 0/1
    assert out.loc["s1", "vocab"] == 3 and out.loc["s1", "hapax"] == 1
    assert out.loc["s1", "hapax_ratio"] == round(1 / 3, 6)
    assert out.loc["s2", "vocab"] == 1 and out.loc["s2", "hapax_ratio"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_char_trigram_rank_and_ties(sf_dir):
    out = q_char_trigram_profile(sf_dir)
    de = out[out["lang"] == "de"].sort_values("rank")
    # "zz zz zz": trigrams zz_, z_z, _zz, zz_, z_z, _zz -> each count 2,
    # ties broken ascending: " zz" < "z z" < "zz "
    assert list(de["gram"]) == [" zz", "z z", "zz "]
    assert list(de["n"]) == [2, 2, 2]
    assert list(de["rank"]) == [1, 2, 3]
    en = out[out["lang"] == "en"]
    assert len(en) == 5  # top-5 cut applies


@pytest.mark.usefixtures("ray_session")
def test_embedding_dim_stats_known(sf_dir):
    out = q_embedding_dim_stats(sf_dir).set_index("dim")
    # dim0: q = [500000, 250000] -> mean 375000, var (125000)^2
    assert out.loc[0, "n"] == 2
    assert out.loc[0, "mean_q"] == 375000.0
    assert out.loc[0, "var_q"] == 125000.0**2
    # dim1: q = [-250000, 250000] -> mean 0, var 250000^2
    assert out.loc[1, "mean_q"] == 0.0
    assert out.loc[1, "var_q"] == 250000.0**2
