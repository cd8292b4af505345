"""Kernel test for pipelines/queries95.py — round price bias."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries95 import q_round_price_bias

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_round_price_bias(tmp_path):
    # 10.00 (whole dollar+ten), 25.00 (whole dollar), 19.99 (neither)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 25.0, 19.99],
            "o_orderdate": [D("1995-01-05")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_round_price_bias(str(tmp_path))
    r = out.iloc[0]
    assert r["n_orders"] == 3
    assert r["whole_dollar_share"] == round(2.0 / 3.0, 6)
    assert r["whole_ten_share"] == round(1.0 / 3.0, 6)
