"""Round-4 batch 136: warehouse data-quality audits — referential
integrity across every foreign-key edge of the star schema (orphan
children per edge via co-partitioned anti-joins), the null profile of
the fact tables, and primary-key uniqueness (duplicate key accounting)
— the three checks a data platform runs before anything else trusts the
tables.

House parity: every number is an exact integer count; no floats exist
anywhere in this batch.

Scale contracts: orphan detection joins child keys against parent keys
co-partitioned on the key (bucketed_join — parents are never collected
to the driver); child keys pre-dedup inside map_batches; null and
key-duplicate counts are integer partial+final reductions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate

QUERIES136: dict = {}
ORACLES136: dict = {}

FK_EDGES = [
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

PK_TABLES = [
    ("events", "event_id"),
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

NULL_TABLES = {
    "events": ["event_id", "ts", "user_id", "event_type", "value"],
    "orders": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    "lineitem": ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
    "documents": ["doc_id", "text", "lang", "source"],
}


def _read(sf_dir: str, table: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Referential integrity
# ---------------------------------------------------------------------------


def q_referential_integrity_audit(sf_dir: str):
    """One row per foreign-key edge of the star schema: distinct child
    key values, parent key count, and how many DISTINCT child keys have
    no parent (orphans) plus how many child ROWS those orphans cover —
    the first audit any warehouse runs. Child keys dedup in-batch,
    reduce through a key exchange, and anti-join the parent
    co-partitioned on the key."""
    rows = []
    for child, ckey, parent, pkey in FK_EDGES:
        cds = _read(sf_dir, child, [ckey])

        def dedup(batch: pd.DataFrame, _k=ckey) -> pd.DataFrame:
            u, counts = np.unique(
                batch[_k].to_numpy(np.int64), return_counts=True
            )
            return pd.DataFrame({"k": u, "n": counts.astype(np.int64)})

        ckeys = hash_bucket_aggregate(
            cds.map_batches(dedup, batch_format="pandas"),
            ["k"],
            [("n", "sum")],
        )
        pds = _read(sf_dir, parent, [pkey])

        def pkeys(batch: pd.DataFrame, _k=pkey) -> pd.DataFrame:
            u = np.unique(batch[_k].to_numpy(np.int64))
            return pd.DataFrame(
                {"k": u, "is_parent": np.ones(u.size, dtype=np.int64)}
            )

        parents = hash_bucket_aggregate(
            pds.map_batches(pkeys, batch_format="pandas"),
            ["k"],
            [("is_parent", "min")],
        )
        joined = bucketed_join(ckeys, parents, on=["k"], how="left")

        def orphan_counts(batch: pd.DataFrame) -> pd.DataFrame:
            miss = batch["is_parent_min"].isna().to_numpy()
            return pd.DataFrame(
                {
                    "g": np.zeros(1, dtype=np.int64),
                    "child_keys": np.array([len(batch)], dtype=np.int64),
                    "orphan_keys": np.array(
                        [int(miss.sum())], dtype=np.int64
                    ),
                    "orphan_rows": np.array(
                        [int(batch["n_sum"].to_numpy(np.int64)[miss].sum())],
                        dtype=np.int64,
                    ),
                }
            )

        agg = hash_bucket_aggregate(
            joined.map_batches(orphan_counts, batch_format="pandas"),
            ["g"],
            [
                ("child_keys", "sum"),
                ("orphan_keys", "sum"),
                ("orphan_rows", "sum"),
            ],
        ).to_pandas()
        n_parents = int(parents.count())
        rows.append(
            (
                f"{child}.{ckey}->{parent}.{pkey}",
                int(agg["child_keys_sum"].sum()),
                n_parents,
                int(agg["orphan_keys_sum"].sum()),
                int(agg["orphan_rows_sum"].sum()),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "fk_edge", "distinct_child_keys", "parent_keys",
            "orphan_keys", "orphan_rows",
        ],
    ).astype(
        {
            "distinct_child_keys": np.int64,
            "parent_keys": np.int64,
            "orphan_keys": np.int64,
            "orphan_rows": np.int64,
        }
    )


def _fk_edge_sql(child, ckey, parent, pkey):
    return f"""
SELECT '{child}.{ckey}->{parent}.{pkey}' AS fk_edge,
       CAST((SELECT COUNT(DISTINCT {ckey}) FROM {child}) AS BIGINT)
         AS distinct_child_keys,
       CAST((SELECT COUNT(DISTINCT {pkey}) FROM {parent}) AS BIGINT)
         AS parent_keys,
       CAST((SELECT COUNT(*) FROM
              (SELECT DISTINCT c.{ckey} FROM {child} c
               LEFT JOIN (SELECT DISTINCT {pkey} AS pk FROM {parent}) p
                 ON p.pk = c.{ckey}
               WHERE p.pk IS NULL)) AS BIGINT) AS orphan_keys,
       CAST((SELECT COUNT(*) FROM {child} c
             LEFT JOIN (SELECT DISTINCT {pkey} AS pk FROM {parent}) p
               ON p.pk = c.{ckey}
             WHERE p.pk IS NULL) AS BIGINT) AS orphan_rows
"""


ORACLES136["referential_integrity_audit"] = "\nUNION ALL\n".join(
    _fk_edge_sql(*e) for e in FK_EDGES
)


# ---------------------------------------------------------------------------
# Null profile
# ---------------------------------------------------------------------------


def q_null_profile(sf_dir: str):
    """Per (table, column) over the fact tables: row count and null
    count — the completeness sheet of a data contract. Pure integer
    partial+final reduction per table."""
    rows = []
    for table, cols in NULL_TABLES.items():
        ds = _read(sf_dir, table, cols)

        def counts(batch: pd.DataFrame, _cols=tuple(cols)) -> pd.DataFrame:
            out = {"g": np.zeros(1, dtype=np.int64)}
            out["rows"] = np.array([len(batch)], dtype=np.int64)
            for c in _cols:
                out[f"null_{c}"] = np.array(
                    [int(batch[c].isna().sum())], dtype=np.int64
                )
            return pd.DataFrame(out)

        aggs = [("rows", "sum")] + [(f"null_{c}", "sum") for c in cols]
        agg = hash_bucket_aggregate(
            ds.map_batches(counts, batch_format="pandas"), ["g"], aggs
        ).to_pandas()
        n = int(agg["rows_sum"].sum())
        for c in cols:
            rows.append((table, c, n, int(agg[f"null_{c}_sum"].sum())))
    return pd.DataFrame(
        rows, columns=["table_name", "column_name", "n_rows", "n_nulls"]
    ).astype({"n_rows": np.int64, "n_nulls": np.int64})


ORACLES136["null_profile"] = "\nUNION ALL\n".join(
    f"""
SELECT '{table}' AS table_name, '{col}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE {col} IS NULL) AS BIGINT) AS n_nulls
FROM {table}
"""
    for table, cols in NULL_TABLES.items()
    for col in cols
)


# ---------------------------------------------------------------------------
# Primary-key uniqueness
# ---------------------------------------------------------------------------


def q_key_uniqueness_audit(sf_dir: str):
    """Per declared primary key: row count, distinct key count, and how
    many key values occur more than once — the uniqueness contract.
    Key counts reduce through one exchange per table."""
    rows = []
    for table, key in PK_TABLES:
        ds = _read(sf_dir, table, [key])

        def dedup(batch: pd.DataFrame, _k=key) -> pd.DataFrame:
            u, counts = np.unique(
                batch[_k].to_numpy(np.int64), return_counts=True
            )
            return pd.DataFrame({"k": u, "n": counts.astype(np.int64)})

        keys = hash_bucket_aggregate(
            ds.map_batches(dedup, batch_format="pandas"),
            ["k"],
            [("n", "sum")],
        )

        def summarize(batch: pd.DataFrame) -> pd.DataFrame:
            n = batch["n_sum"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "g": np.zeros(1, dtype=np.int64),
                    "rows": np.array([int(n.sum())], dtype=np.int64),
                    "keys": np.array([len(batch)], dtype=np.int64),
                    "dup_keys": np.array(
                        [int((n > 1).sum())], dtype=np.int64
                    ),
                }
            )

        agg = hash_bucket_aggregate(
            keys.map_batches(summarize, batch_format="pandas"),
            ["g"],
            [("rows", "sum"), ("keys", "sum"), ("dup_keys", "sum")],
        ).to_pandas()
        rows.append(
            (
                table,
                key,
                int(agg["rows_sum"].sum()),
                int(agg["keys_sum"].sum()),
                int(agg["dup_keys_sum"].sum()),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["table_name", "key_column", "n_rows", "n_distinct",
                 "n_dup_keys"],
    ).astype(
        {"n_rows": np.int64, "n_distinct": np.int64, "n_dup_keys": np.int64}
    )


ORACLES136["key_uniqueness_audit"] = "\nUNION ALL\n".join(
    f"""
SELECT '{table}' AS table_name, '{key}' AS key_column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_distinct,
       CAST((SELECT COUNT(*) FROM
              (SELECT {key} FROM {table} GROUP BY 1 HAVING COUNT(*) > 1))
            AS BIGINT) AS n_dup_keys
FROM {table}
"""
    for table, key in PK_TABLES
)


QUERIES136["referential_integrity_audit"] = q_referential_integrity_audit
QUERIES136["null_profile"] = q_null_profile
QUERIES136["key_uniqueness_audit"] = q_key_uniqueness_audit
