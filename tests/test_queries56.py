"""Kernel tests for pipelines/queries56.py — char class mix / whale
revenue share known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries56 import (
    q_char_class_mix,
    q_customer_revenue_topshare,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_char_class_mix(tmp_path):
    # "ab 12!" -> 6 chars: 2 alpha, 2 digit, 1 space, 1 other
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["ab 12!"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([6], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_char_class_mix(str(tmp_path))
    r = out.iloc[0]
    assert r["n_chars"] == 6
    assert r["alpha_share"] == round(2.0 / 6.0, 6)
    assert r["digit_share"] == round(2.0 / 6.0, 6)
    assert r["space_share"] == round(1.0 / 6.0, 6)
    assert r["other_share"] == round(1.0 / 6.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_customer_revenue_topshare(tmp_path):
    # 3 customers: revenues 100, 10, 10 -> k = ceil(0.03) = 1, share 100/120
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.array([1, 2, 3], dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [100.0, 10.0, 10.0],
            "o_orderdate": [D("1995-01-01")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_customer_revenue_topshare(str(tmp_path))
    r = out.iloc[0]
    assert r["n_customers"] == 3 and r["k_top"] == 1
    assert r["top_revenue_c"] == 10000
    assert r["top_share"] == round(10000.0 / 12000.0, 6)
