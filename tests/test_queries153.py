"""Training-data mixing operators (pipelines/queries153.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, sources):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(sources), dtype=np.int64),
            "source": sources,
            "text": ["x"] * len(sources),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    return df


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_deterministic_and_rate_bounded(tmp_path):
    from signalsharp_ray.pipelines.queries153 import q_stratified_sample  # registered as source_rate_sample

    sources = ["web"] * 500 + ["wiki"] * 300 + ["other"] * 200
    _write_docs(tmp_path, sources)
    a = q_stratified_sample(str(tmp_path)).to_pandas().sort_values("doc_id")
    b = q_stratified_sample(str(tmp_path)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )  # reproducible: hash gate, no RNG
    rates = a.groupby("source").size()
    assert 0.10 < rates.get("web", 0) / 500 < 0.32   # ~20%
    assert 0.65 < rates.get("wiki", 0) / 300 < 0.95  # ~80%
    assert rates.get("other", 0) / 200 < 0.22        # ~10% default


@pytest.mark.usefixtures("ray_session")
def test_mixing_weights_temperature_flattens(tmp_path):
    from signalsharp_ray.pipelines.queries153 import q_mixing_weights

    sources = ["big"] * 900 + ["small"] * 100
    _write_docs(tmp_path, sources)
    out = q_mixing_weights(str(tmp_path)).set_index("source")
    assert out["weight"].sum() == pytest.approx(1.0, abs=1e-5)
    # alpha < 1 up-weights the tail: small's weight > its raw share
    assert out.loc["small", "weight"] > 0.1
    assert out.loc["small", "epochs_multiplier"] > 1.0
    assert out.loc["big", "epochs_multiplier"] < 1.0
    # alpha=1 reproduces raw shares
    raw = q_mixing_weights(str(tmp_path), alpha=1.0).set_index("source")
    assert raw.loc["big", "weight"] == pytest.approx(0.9, abs=1e-9)
