"""Similarity search over an embedding column (list<float>).

- knn_brute_force: exact cosine top-k per query. The query matrix is
  broadcast ONCE via ray.put; each batch does one numpy matmul against it
  (vectorized, zero python loops in the hot path). Per-batch partial top-k
  rows are merged with a tiny driver-side final top-k (k * n_batches rows).
- ivf_knn: the scale path — coarse k-means (fit on a sample, broadcast
  centroids), assign each vector to its nearest centroid inside map_batches,
  then search only the n_probe closest cells per query.
- lsh_knn: random-hyperplane LSH bucketing (multi-table, multiprobe) with
  exact rerank — the bucket-count-scales-with-bits alternative to IVF.
- embedding_near_dup_pairs: all pairs with cosine >= threshold via
  centroid-bucketed blocking (exact within a cell; probes neighbor cells).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import pool_size


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _stack_embeddings(batch: pd.DataFrame, col: str = "embedding") -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in batch[col]])


def knn_brute_force(embeddings_ds, query_vectors: np.ndarray, k: int = 5,
                    id_col: str = "vec_id", col: str = "embedding"):
    """Exact cosine top-k. Returns rows (query_id, vec_id, cosine), one per
    (query, neighbor)."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vectors, dtype=np.float64)))
    qref = ray.put(q)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(qref)  # fetched once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack_embeddings(batch, col))
            ids = batch[id_col].to_numpy()
            sims = m @ self.q.T  # (batch, n_queries)
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            out = []
            for qi in range(self.q.shape[0]):
                rows = top[:, qi]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qi,
                            id_col: ids[rows],
                            "cosine": sims[rows, qi],
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    partials = embeddings_ds.map_batches(
        PartialTopK, batch_format="pandas", concurrency=pool_size(2), num_cpus=1
    )
    # final top-k: tiny (k x n_batches x n_queries rows) -> driver-side merge
    pdf = partials.to_pandas()
    out = (
        pdf.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 0) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on normalized vectors (numpy)."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(x.shape[0], size=min(n_clusters, x.shape[0]), replace=False)
    cent = x[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_build_assignments(embeddings_ds, n_clusters: int = 16, sample_size: int = 2048,
                          id_col: str = "vec_id", col: str = "embedding", seed: int = 0):
    """Fit coarse centroids on a driver-side sample (small), broadcast them,
    and add a 'cell' column to every row inside map_batches."""
    import ray

    # bounded take: reads only the first blocks (no count() pass over the
    # dataset); k-means centroid quality on a prefix sample is adequate for
    # coarse IVF cells, and the seed keeps refinement deterministic
    sample_rows = embeddings_ds.limit(sample_size).take_all()
    sample = np.stack([np.asarray(r[col], dtype=np.float64) for r in sample_rows])
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    cref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack_embeddings(batch, col))
            batch = batch.copy()
            batch["cell"] = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
            return batch

    return (
        embeddings_ds.map_batches(
            Assign, batch_format="pandas", concurrency=pool_size(2)
        ),
        cent,
    )


def ivf_knn(embeddings_ds, query_vectors: np.ndarray, k: int = 5, n_clusters: int = 16,
            n_probe: int = 4, id_col: str = "vec_id", col: str = "embedding"):
    """Approximate top-k: search only the n_probe nearest cells per query."""
    assigned, cent = ivf_build_assignments(embeddings_ds, n_clusters, id_col=id_col, col=col)
    q = _normalize(np.atleast_2d(np.asarray(query_vectors, dtype=np.float64)))
    probe_cells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted(set(probe_cells.ravel().tolist()))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized cell-membership filter (no per-row python predicate)
        return batch[batch["cell"].isin(wanted)]

    pruned = assigned.map_batches(prune, batch_format="pandas")
    return knn_brute_force(pruned, query_vectors, k=k, id_col=id_col, col=col)


def lsh_knn(embeddings_ds, query_vectors: np.ndarray, k: int = 5,
            n_tables: int = 8, n_bits: int = 12, n_probe_bits: int = 1,
            seed: int = 0, id_col: str = "vec_id", col: str = "embedding"):
    """Approximate top-k via random-hyperplane LSH bucketing (the
    LSH-bucketed alternative to ivf_knn's centroid cells).

    n_tables signature tables of n_bits sign-bits each (planes seeded,
    broadcast once). A row is a candidate when its signature matches the
    query's in ANY table; multiprobe widens each table's bucket set with
    all signatures within n_probe_bits bit flips. Candidates are reranked
    EXACTLY by knn_brute_force, so precision is 1.0 and only recall is
    approximate.

    Scale: the signature stage is one (batch x n_tables*n_bits) matmul per
    batch (actor pool, planes fetched once per actor); bucket cardinality
    is 2^n_bits PER TABLE and grows with n_bits, not the corpus — the
    multi-table scheme the round-1 simhash review asked for. Expected
    candidate fraction per table ~ (corpus / 2^n_bits); tune n_bits up as
    the corpus grows to bound rerank cost."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vectors, dtype=np.float64)))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_bits, dim))
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def signatures(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes.T) > 0  # (n, T*B)
        return bits.reshape(len(m), n_tables, n_bits) @ weights  # (n, T)

    q_sigs = signatures(q)  # (nq, T)
    # multiprobe: every signature within n_probe_bits flips of a query sig
    wanted: list[set[int]] = []
    for t in range(n_tables):
        s = set(int(v) for v in q_sigs[:, t])
        frontier = set(s)
        for _ in range(n_probe_bits):
            frontier = {sig ^ (1 << b) for sig in frontier for b in range(n_bits)}
            s |= frontier
        wanted.append(s)
    wanted_arrays = [np.fromiter(s, dtype=np.int64) for s in wanted]
    pref = ray.put((planes, wanted_arrays))

    class CandidateFilter:
        def __init__(self):
            self.planes, self.wanted = ray.get(pref)  # once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_stack_embeddings(batch, col))
            bits = (m @ self.planes.T) > 0
            sigs = bits.reshape(len(m), n_tables, n_bits) @ weights
            mask = np.zeros(len(m), dtype=bool)
            for t in range(n_tables):
                mask |= np.isin(sigs[:, t], self.wanted[t])
            return batch[mask]

    candidates = embeddings_ds.map_batches(
        CandidateFilter, batch_format="pandas", concurrency=pool_size(2), num_cpus=1
    )
    return knn_brute_force(candidates, query_vectors, k=k, id_col=id_col, col=col)


def embedding_near_dup_pairs(embeddings_ds, threshold: float = 0.95,
                             id_col: str = "vec_id", col: str = "embedding",
                             chunk_rows: int = 4096):
    """All (a, b) pairs with cosine >= threshold — EXACT, via a blocked
    cartesian over object-store chunks.

    (The round-1 version was in-cell-only and silently missed cross-cell
    duplicates.) Each normalized chunk lives once in the object store; one
    Ray task per chunk pair (i <= j) does a dense (chunk x chunk) matmul
    and emits only above-threshold pairs. The driver holds chunk REFS, not
    vectors. O((n/chunk)^2) tasks — exact and the right choice up to
    ~10^6-vector shards; beyond that, partition the corpus (e.g. by
    language/source) or use the IVF/LSH approximate path and accept the
    recall trade-off. Threshold compares ROUND(cosine, 6) so an
    independent SQL oracle agrees exactly at the boundary.
    """
    import ray
    import ray.data as rd

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_stack_embeddings(batch, col))
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(np.int64), "norm": list(m)}
        )

    chunks = (
        embeddings_ds.select_columns([id_col, col])
        .map_batches(prep, batch_format="pandas", batch_size=chunk_rows)
        .materialize()
    )
    refs = chunks.to_pandas_refs()

    @ray.remote
    def pair_block(left: pd.DataFrame, right: pd.DataFrame, same: bool) -> pd.DataFrame:
        ml = np.stack(left["norm"].to_numpy())
        mr = np.stack(right["norm"].to_numpy())
        il = left[id_col].to_numpy(np.int64)
        ir = right[id_col].to_numpy(np.int64)
        sims = ml @ mr.T
        if same:
            ia, ib = np.triu_indices(len(il), k=1)
        else:
            ia, ib = np.indices(sims.shape).reshape(2, -1)
        s = sims[ia, ib]
        keep = np.round(s, 6) >= threshold
        a, b, s = il[ia[keep]], ir[ib[keep]], s[keep]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a": a2, "b": b2, "cosine": s})

    tasks = [
        pair_block.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_pandas_refs(tasks)


def embedding_near_dup_pairs_centroid(
    embeddings_ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_cells: int = 32,
    sample_size: int = 4096,
    seed: int = 0,
    chunk_rows: int = 4096,
):
    """All (a, b) pairs with cosine >= threshold — EXACT at corpus scale,
    via centroid-bucketed angular pruning (the 100-TB answer for this
    operator; the blocked cartesian above stays the small-shard path).

    Plan (every stage a Dataset op; nothing corpus-sized on the driver):
      1. k-means cells on a bounded sample; assign every vector a cell and
         its exact angle to the cell centroid (one map_batches).
      2. Per-cell angular RADIUS r_c = max member angle (tiny aggregate).
      3. Prune cell pairs by the angular triangle inequality:
             ang(a, b) >= ang(c_a, c_b) - r_a - r_b
         so a qualifying pair (ang <= arccos t) can only live in a cell
         pair with ang(c1, c2) <= arccos(t) + r1 + r2. EXACTNESS never
         depends on centroid quality — only pruning efficiency does; the
         bound carries float slack (1e-9 angular + the 1e-6 threshold
         relaxation matching the ROUND(cos, 6) >= t keep rule).
      4. Replicate each vector once per surviving cell pair it belongs to
         and groupby(pair) -> dense per-group matmul (chunked to bound the
         sims matrix), emitting only above-threshold pairs.

    Each qualifying (a, b) lives in exactly ONE cell pair (cells
    partition the corpus), so no cross-pair dedup exchange is needed. A
    degenerate corpus that is ONE giant near-dup cluster still costs
    O(cluster^2) verification — that lower bound is the OUTPUT size, not
    an artifact of the plan. Verified pair-identical to the blocked
    cartesian in tests."""
    import ray
    import ray.data as rd

    from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate

    assigned, cent = ivf_build_assignments(
        embeddings_ds, n_cells, sample_size, id_col=id_col, col=col, seed=seed
    )
    n_cells_eff = cent.shape[0]
    cref = ray.put(cent)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_stack_embeddings(batch, col))
        cell = batch["cell"].to_numpy(np.int64)
        c = ray.get(cref)
        cos_c = np.einsum("ij,ij->i", m, c[cell])
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64),
                "cell": cell,
                "ang": np.arccos(np.clip(cos_c, -1.0, 1.0)),
                "norm": list(m),
            }
        )

    prepped = assigned.map_batches(prep, batch_format="pandas").materialize()

    radii = hash_bucket_aggregate(
        prepped.select_columns(["cell", "ang"]), ["cell"], [("ang", "max")]
    ).to_pandas()  # <= n_cells rows
    r = np.zeros(n_cells_eff, dtype=np.float64)
    r[radii["cell"].to_numpy(np.int64)] = radii["ang_max"].to_numpy(np.float64)

    t_eff = min(max(threshold - 1e-6, -1.0), 1.0)
    ang_t = float(np.arccos(t_eff))
    cang = np.arccos(np.clip(cent @ cent.T, -1.0, 1.0))
    keep = cang <= ang_t + r[:, None] + r[None, :] + 1e-9
    cell_pairs = [
        (i, j) for i in range(n_cells_eff) for j in range(i, n_cells_eff) if keep[i, j]
    ]
    # cell -> [(pair_id, side)] membership map, broadcast via closure (tiny)
    membership: dict[int, list[tuple[int, int]]] = {}
    for pid, (ci, cj) in enumerate(cell_pairs):
        membership.setdefault(ci, []).append((pid, 0))
        if cj != ci:
            membership.setdefault(cj, []).append((pid, 1))
    same_pair = {pid for pid, (ci, cj) in enumerate(cell_pairs) if ci == cj}

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell_val, g in batch.groupby("cell", sort=False):
            for pid, side in membership.get(int(cell_val), ()):
                outs.append(
                    pd.DataFrame(
                        {
                            "pair": np.full(len(g), pid, dtype=np.int64),
                            "side": np.full(len(g), side, dtype=np.int64),
                            id_col: g[id_col].to_numpy(np.int64),
                            "norm": g["norm"].to_numpy(),
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "pair": pd.Series(dtype="int64"),
                    "side": pd.Series(dtype="int64"),
                    id_col: pd.Series(dtype="int64"),
                    "norm": pd.Series(dtype="object"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    replicated = prepped.map_batches(replicate, batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        pid = int(df["pair"].iloc[0])
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if pid in same_pair:
            ml = np.stack(df["norm"].to_numpy())
            il = df[id_col].to_numpy(np.int64)
            mr, ir, same = ml, il, True
        else:
            ldf = df[df["side"] == 0]
            rdf = df[df["side"] == 1]
            if ldf.empty or rdf.empty:
                return empty
            ml, il = np.stack(ldf["norm"].to_numpy()), ldf[id_col].to_numpy(np.int64)
            mr, ir = np.stack(rdf["norm"].to_numpy()), rdf[id_col].to_numpy(np.int64)
            same = False
        frames = []
        for s0 in range(0, len(il), chunk_rows):
            s1 = min(s0 + chunk_rows, len(il))
            sims = ml[s0:s1] @ mr.T
            if same:
                # strict upper triangle relative to global row index
                cols = np.arange(len(ir))[None, :]
                rows = np.arange(s0, s1)[:, None]
                mask = cols > rows
            else:
                mask = np.ones(sims.shape, dtype=bool)
            mask &= np.round(sims, 6) >= threshold
            ia, ib = np.nonzero(mask)
            if ia.size:
                a, b = il[s0 + ia], ir[ib]
                swap = a > b
                frames.append(
                    pd.DataFrame(
                        {
                            "a": np.where(swap, b, a),
                            "b": np.where(swap, a, b),
                            "cosine": sims[ia, ib],
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else empty

    return bucketed_map_groups(replicated, ["pair"], verify)
