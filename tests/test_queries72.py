"""Kernel test for pipelines/queries72.py — segment balance known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries72 import q_mktsegment_balance_stats


@pytest.mark.usefixtures("ray_session")
def test_mktsegment_balance(tmp_path):
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(4, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(4)],
            "c_nationkey": np.zeros(4, dtype=np.int64),
            "c_acctbal": [100.0, -50.0, 25.5, 10.0],
            "c_mktsegment": ["AUTO", "AUTO", "AUTO", "HOUSE"],
        }
    )
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    out = q_mktsegment_balance_stats(str(tmp_path)).set_index("segment")
    assert out.loc["AUTO", "n_customers"] == 3
    # cents: 10000 - 5000 + 2550 = 7550 -> /3 /100
    assert out.loc["AUTO", "mean_balance"] == round(7550.0 / 3.0 / 100.0, 6)
    assert out.loc["AUTO", "negative_share"] == round(1.0 / 3.0, 6)
    assert out.loc["HOUSE", "n_customers"] == 1
    assert out.loc["HOUSE", "negative_share"] == 0.0
