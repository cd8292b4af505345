"""Kernel tests for pipelines/queries30.py — trigram perplexity / basket
diversity / priority lead time known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries30 import (
    q_basket_diversity,
    q_priority_lead_time,
    q_trigram_perplexity,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_trigram_perplexity_deterministic_text(tmp_path):
    # single repeating text: model is fully predictive within the corpus
    # trigram model except for branching: 'ababab' -> trigrams aba, bab
    # each context fully determines next char -> perplexity 1
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["ab" * 20],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([40], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_trigram_perplexity(str(tmp_path))
    r = out.iloc[0]
    assert r["n_trigrams"] == 38
    assert r["perplexity"] == 1.0
    assert r["log_likelihood"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_basket_diversity(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "l_partkey": np.array([10, 11, 12, 10], dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.array([10, 11, 12], dtype=np.int64),
            "p_name": ["a", "b", "c"],
            "p_brand": ["B"] * 3,
            "p_type": ["STEEL", "STEEL", "BRASS"],
            "p_size": np.array([1, 1, 1], dtype=np.int32),
            "p_retailprice": [1.0] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    out = q_basket_diversity(str(tmp_path)).set_index("n_types")
    # order 1: STEEL+BRASS -> 2 types; order 2: STEEL -> 1 type
    assert out.loc[2, "n_orders"] == 1
    assert out.loc[1, "n_orders"] == 1


@pytest.mark.usefixtures("ray_session")
def test_priority_lead_time(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 2], dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [1.0] * 3,
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            # order 1 first ships day +5 (min of +5, +9); order 2 at +10
            "l_shipdate": [D("1995-01-06"), D("1995-01-10"), D("1995-01-12")],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.array([7, 8], dtype=np.int64),
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": [1.0] * 2,
            "o_orderdate": [D("1995-01-01"), D("1995-01-02")],
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_priority_lead_time(str(tmp_path))
    r = out.iloc[0]
    assert r["n_orders"] == 2
    assert r["total_days"] == 15  # 5 + 10
    assert r["mean_lead_days"] == 7.5
