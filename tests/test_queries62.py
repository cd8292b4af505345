"""Kernel test for pipelines/queries62.py — Benford prices known answer."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries62 import q_benford_prices

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_benford_prices(tmp_path):
    # prices 10.00, 1.50, 29.99 -> cents 1000, 150, 2999 -> digits 1, 1, 2
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [10.0, 1.50, 29.99],
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_benford_prices(str(tmp_path)).set_index("digit")
    assert len(out) == 9
    assert out.loc[1, "n_items"] == 2
    assert out.loc[2, "n_items"] == 1
    assert out.loc[1, "observed_share"] == round(2.0 / 3.0, 6)
    assert out.loc[1, "benford_share"] == round(math.log10(2.0), 6)
    assert (out["chi2"] > 0).all()
