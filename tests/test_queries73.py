"""Kernel test for pipelines/queries73.py — hod ANOVA known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries73 import q_hod_anova


@pytest.mark.usefixtures("ray_session")
def test_hod_anova_known(tmp_path):
    # Two days, hours 0 and 1 each day: hour-0 counts {2,2}, hour-1
    # counts {1,1}. SSW = 0 -> query drops the row (den 0); instead use
    # counts {2,1} per hod with within variance: h0 {2,2}, h1 {1,3}.
    counts = {(0, 0): 2, (0, 1): 1, (1, 0): 2, (1, 1): 3}
    rows = []
    base = np.datetime64("2024-01-01T00:30:00", "us")
    for (day, hour), c in counts.items():
        for j in range(c):
            rows.append(
                base + np.timedelta64(day, "D") + np.timedelta64(hour, "h")
                + np.timedelta64(j, "s")
            )
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(rows, dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_hod_anova(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # dense grid spans 26 hourly buckets (day1 00:00 .. day2 01:00);
    # hod groups: h0 {2,2}, h1 {1,3}, h2..h23 {0} each (22 single-zero
    # groups). n=26, k=24.
    assert r["n_buckets"] == 26
    assert r["n_groups"] == 24
    # SSB = (16/2 + 16/2 + 22*0) - 64/26 ; SSW = SST - SSB with
    # SST = 18 - 64/26 -> SSW = 2 ; F = (SSB/23)/(SSW/2)
    ssb = 16.0 - 64.0 / 26.0
    f = (ssb / 23.0) / (2.0 / 2.0)
    assert r["f_stat"] == round(f, 6)
