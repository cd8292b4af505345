"""Round-3 batch 63: the activity 80/20 point — the smallest share of
users (busiest first, (count DESC, user ASC) ties) that generates 80%
of all events, with the exact user count and their event share at the
crossing. The single number behind every 'a fraction of users drive
the load' capacity argument (pareto_share reports fixed top-k shares;
this solves for the crossing).

House parity: the crossing test is the pure integer comparison
5*cum >= 4*total over the deterministic ordering; shares are single
transcribed divisions.

Scale contract: per-user counts are one exchange; the ranked scan is
the hill/gini driver-fold contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES61: dict = {}
ORACLES61: dict = {}


def q_pareto_8020_point(sf_dir: str):
    """The smallest k such that the k busiest users ((count DESC,
    user ASC)) carry >= 80% of events (integer test 5*cum >= 4*total),
    with k's share of the user base and the exact share carried."""
    ev = _events(sf_dir, ["user_id"]).map_batches(
        lambda b: pd.DataFrame({"user_id": b["user_id"].astype(np.int64)})
        .groupby("user_id", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per_user = (
        hash_bucket_aggregate(ev, ["user_id"], [("n", "sum")])
        .to_pandas()
        .sort_values(["n_sum", "user_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(per_user["n_sum"].sum())
    n_users = len(per_user)
    cum = np.cumsum(per_user["n_sum"].to_numpy(np.int64))
    k = int(np.flatnonzero(5 * cum >= 4 * total)[0]) + 1
    carried = int(cum[k - 1])
    return pd.DataFrame(
        {
            "n_users": np.array([n_users], dtype=np.int64),
            "k_users": np.array([k], dtype=np.int64),
            "user_share": [float(_r6away(float(k) / float(n_users)))],
            "event_share": [float(_r6away(float(carried) / float(total)))],
        }
    )


ORACLES61["pareto_8020_point"] = """
WITH u AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
),
r AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rn,
         CAST(SUM(n) OVER (ORDER BY n DESC, user_id ASC) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total,
         COUNT(*) OVER () AS n_users
  FROM u
),
hit AS (
  SELECT rn, cum, total, n_users,
         ROW_NUMBER() OVER (ORDER BY rn) AS h
  FROM r WHERE 5 * cum >= 4 * total
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       CAST(rn AS BIGINT) AS k_users,
       ROUND(CAST(rn AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS user_share,
       ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS event_share
FROM hit WHERE h = 1
"""


QUERIES61["pareto_8020_point"] = q_pareto_8020_point
