"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized map_batches transforms over the documents table
(doc_id, text, lang, source, n_chars). Stages that need compiled state
(regexes, stopword tables) are callable classes run as actor pools so the
setup happens once per actor, per the stateful-stage contract.

Operators:
- token_count: whitespace tokens + a BPE-ish regex token count
- quality_score: length / punctuation / uppercase / digit / stopword ratios
  and a composite score
- language_id: n-gram + stopword heuristic over a small built-in profile set
- fingerprint: 64-bit rolling (polynomial) content hash per document
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..common.raytools import pool_size

# -- token counting -------------------------------------------------------

_BPE_ISH = re.compile(r"\w+|[^\w\s]")


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"].fillna("")
    out = pd.DataFrame({"doc_id": batch["doc_id"]})
    out["n_tokens_ws"] = text.str.split().str.len().fillna(0).astype(np.int64)
    out["n_tokens_bpe"] = text.str.findall(_BPE_ISH).str.len().astype(np.int64)
    return out


def token_counts(docs_ds):
    return docs_ds.map_batches(token_count_batch, batch_format="pandas")


# -- quality scoring ------------------------------------------------------

_STOPWORDS = frozenset(
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will".split()
)


_STOPWORD_ARR = None  # built lazily (pa.array of the stopword list)


def _tokenize_arrow(arr: "pa.Array", token_complement: str):
    """Exact token extraction in Arrow C++: split on runs of NON-token
    characters (identical token set to re.findall of the class complement),
    flatten, drop boundary empties. Returns (flat_tokens, parent_doc_idx).
    """
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(arr, token_complement)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    nonempty = pc.not_equal(flat, "")
    flat_ne = pc.filter(flat, nonempty)
    parent_ne = (
        pc.filter(parent, nonempty).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    return flat_ne, parent_ne


class QualityScorer:
    """Actor-pool stage: per-doc quality heuristics, Arrow-native.

    Every hot kernel is a pyarrow.compute C++ call — char-class counts via
    count_substring_regex (RE2), tokenization via split_pattern_regex +
    list_flatten, stopword membership via utf8_lower + is_in, and per-doc
    reassembly via np.bincount on the list-parent indices. No per-doc (or
    per-token) Python loop anywhere; measured ~2.7x faster per batch than
    the round-4 pandas findall+loop formulation and exact on the same
    inputs (see BASELINE.md). Digits count [0-9] (the SQL oracle's class;
    the old pandas \\d also matched non-ASCII digit codepoints).

    Accepts a pyarrow Table (preferred — zero-copy from the object store)
    or a pandas DataFrame; returns the same family it was given.
    """

    _PUNCT = r"[.,;:!?'\"()\[\]{}-]"
    _DIGIT = r"[0-9]"
    _UPPER = r"[A-Z]"
    _NONWORD = r"[^a-zA-Z']+"

    def __init__(self):
        global _STOPWORD_ARR
        if _STOPWORD_ARR is None:
            _STOPWORD_ARR = pa.array(sorted(_STOPWORDS))
        self.stop_arr = _STOPWORD_ARR

    def __call__(self, batch):
        import pyarrow.compute as pc

        is_pandas = isinstance(batch, pd.DataFrame)
        if is_pandas:
            text = pa.array(batch["text"].fillna("").astype(str))
            doc_id = pa.array(batch["doc_id"].to_numpy())
        else:
            text = pc.fill_null(batch["text"], "")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            doc_id = batch["doc_id"]
        n = len(text)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        denom = np.maximum(n_chars, 1).astype(np.float64)
        n_punct = pc.count_substring_regex(text, self._PUNCT).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_digit = pc.count_substring_regex(text, self._DIGIT).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_upper = pc.count_substring_regex(text, self._UPPER).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat, parent = _tokenize_arrow(text, self._NONWORD)
        n_words = np.bincount(parent, minlength=n).astype(np.int64)
        hit = pc.is_in(
            pc.utf8_lower(flat), value_set=self.stop_arr
        ).to_numpy(zero_copy_only=False)
        stop_hits = np.bincount(parent[hit], minlength=n).astype(np.int64)
        stopword_ratio = stop_hits / np.maximum(n_words, 1).astype(np.float64)
        digit_ratio = n_digit / denom
        quality = (
            np.clip(n_words / 100.0, 0, 1) * 0.4
            + np.clip(stopword_ratio * 2.5, 0, 1) * 0.4
            + (1.0 - np.clip(digit_ratio * 5, 0, 1)) * 0.2
        )
        cols = {
            "doc_id": doc_id,
            "n_chars": n_chars,
            "n_words": n_words,
            "punct_ratio": n_punct / denom,
            "digit_ratio": digit_ratio,
            "upper_ratio": n_upper / denom,
            "stopword_ratio": stopword_ratio,
            "quality_score": quality,
        }
        if is_pandas:
            return pd.DataFrame(
                {k: (v if isinstance(v, np.ndarray) else v.to_numpy(zero_copy_only=False))
                 for k, v in cols.items()}
            )
        return pa.table(cols)


def quality_scores(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(
        QualityScorer,
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# -- language id ----------------------------------------------------------

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "was", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "den"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "y", "en", "que", "por", "una"},
    "pt": {"o", "a", "os", "de", "e", "que", "em", "um", "uma", "para"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "по", "как", "из"},
    "zh": set(),  # handled by the CJK-character ratio below
}


class LanguageId:
    """Actor-pool heuristic language id: stopword votes + CJK char ratio,
    Arrow-native per batch.

    One split_pattern_regex tokenize pass (letters: \\p{L}+, the SQL
    oracle's class), utf8_lower, then a C-level is_in per language profile
    into a (docs x langs) vote matrix reassembled with np.bincount —
    argmax (first-max wins, matching the profile dict's iteration order
    with a strict-> comparison) picks the language. No per-doc or
    per-token Python loop. Accepts a pyarrow Table or pandas DataFrame;
    returns the same family.
    """

    _NONWORD = r"[^\p{L}]+"  # RE2: split on non-letters
    _CJK = r"[一-鿿]"

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk = re.compile(r"[一-鿿]")
        self.langs = [l for l, s in _LANG_PROFILES.items() if s]
        self.profile_arrs = [
            pa.array(sorted(_LANG_PROFILES[l])) for l in self.langs
        ]

    def _predict(self, s: str) -> str:
        """Row-at-a-time reference implementation (kept for callers that
        score single strings and for the vectorized-equivalence test)."""
        if not s:
            return "und"
        cjk = len(self.cjk.findall(s))
        if cjk > max(8, 0.05 * len(s)):
            return "zh"
        toks = [t.lower() for t in self.word.findall(s)]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stops in _LANG_PROFILES.items():
            if not stops:
                continue
            hits = sum(1 for t in toks if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "und"

    def __call__(self, batch):
        import pyarrow.compute as pc

        is_pandas = isinstance(batch, pd.DataFrame)
        if is_pandas:
            text = pa.array(batch["text"].fillna("").astype(str))
            doc_id = batch["doc_id"].to_numpy()
        else:
            text = pc.fill_null(batch["text"], "")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            doc_id = batch["doc_id"]
        n = len(text)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        cjk_n = pc.count_substring_regex(text, self._CJK).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        zh = cjk_n > np.maximum(8, 0.05 * n_chars)
        flat, parent = _tokenize_arrow(text, self._NONWORD)
        low = pc.utf8_lower(flat)
        n_toks = np.bincount(parent, minlength=n)
        votes = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, stop_arr in enumerate(self.profile_arrs):
            hit = pc.is_in(low, value_set=stop_arr).to_numpy(zero_copy_only=False)
            votes[:, j] = np.bincount(parent[hit], minlength=n)
        best_j = votes.argmax(axis=1)  # first max: strict-> scan order
        best_hits = votes[np.arange(n), best_j]
        pred = np.asarray(self.langs, dtype=object)[best_j]
        pred[(best_hits == 0) | (n_toks == 0)] = "und"
        pred[zh] = "zh"
        if is_pandas:
            return pd.DataFrame({"doc_id": doc_id, "pred_lang": pred})
        return pa.table(
            {"doc_id": doc_id, "pred_lang": pa.array(pred, pa.string())}
        )


def language_id(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(
        LanguageId,
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# -- document fingerprinting ---------------------------------------------


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit content fingerprint: the first 8 bytes of md5(utf-8 text),
    little-endian — stable across runs/processes AND reproducible in SQL
    engines (DuckDB's md5_number_upper), so the operator is
    oracle-verifiable. md5 here is a content hash, not a security
    primitive; hashlib.md5 runs at C speed per row."""
    import hashlib

    text = batch["text"].fillna("")
    fps = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in text
        ),
        dtype=np.uint64,
        count=len(text),
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": fps.view(np.int64),
        }
    )


def fingerprints(docs_ds):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pandas")


# -- corpus vocabulary ------------------------------------------------------


_WORD_RE = re.compile(r"\w+")


def token_count_partial(batch):
    """Per-batch combiner: corpus token counts (fillna/lower/\\w+ findall,
    C-level explode + value_counts). Shared by vocabulary_topk and the
    PMI unigram leg (pipelines/queries5.q_bigram_pmi) so the tokenization
    can never desynchronize between them."""
    import pandas as pd

    words = batch["text"].fillna("").str.lower().str.findall(_WORD_RE)
    exploded = words.explode().dropna()
    vc = exploded.value_counts()
    return pd.DataFrame({"word": vc.index.astype(str), "n": vc.to_numpy(np.int64)})


def vocabulary_topk(docs_ds, k: int = 100):
    """Global top-K token frequencies.

    In-batch partial counts (pandas value_counts, C-level) -> bucketed
    exact sum (each word lives in exactly one hash bucket) -> per-bucket
    top-K -> tiny driver merge of K x n_buckets rows. Exact: a word's
    global count is complete within its bucket, so the union of per-bucket
    top-Ks is a superset of the global top-K. Ties break (count DESC,
    word ASC) to match the SQL oracle deterministically."""
    import pandas as pd

    from ..common.raytools import hash_bucket_aggregate

    partials = docs_ds.select_columns(["text"]).map_batches(
        token_count_partial, batch_format="pandas"
    )
    agg = hash_bucket_aggregate(partials, ["word"], [("n", "sum")])

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_sum", "word"], ascending=[False, True]).head(k)

    from ..common.raytools import bucketed_map_groups

    tops = bucketed_map_groups(agg, ["word"], None, whole_bucket_fn=bucket_topk)
    out = tops.to_pandas()  # K x n_buckets rows — tiny
    out = out.sort_values(["n_sum", "word"], ascending=[False, True]).head(k)
    return out.rename(columns={"n_sum": "n"}).reset_index(drop=True)


# -- benchmark decontamination ---------------------------------------------


def contamination_scores(docs_ds, probe_texts: list[str], shingle_k: int = 3,
                         threshold: float = 0.5):
    """Max word-shingle Jaccard of every document against a small PROBE set
    (e.g. evaluation-benchmark passages) — the standard training-data
    decontamination primitive. Probe shingle sets are broadcast once
    (bounded by the probe count, never the corpus); each batch computes
    its docs' overlap vectorized against all probes."""
    import ray

    from .dedup import _shingle_hashes

    probes = [
        s for s in (_shingle_hashes(t or "", shingle_k) for t in probe_texts)
        if s.size
    ]
    ref = ray.put(probes)

    class Scorer:
        def __init__(self):
            self.probes = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = np.zeros(len(batch), dtype=np.float64)
            for i, text in enumerate(batch["text"]):
                sh = _shingle_hashes(text or "", shingle_k)
                if sh.size == 0:
                    continue
                best = 0.0
                for p in self.probes:
                    inter = np.intersect1d(sh, p, assume_unique=True).size
                    union = sh.size + p.size - inter
                    if union and inter / union > best:
                        best = inter / union
                out[i] = best
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype(np.int64),
                    "max_probe_jaccard": out,
                    "contaminated": np.floor(out * 1e6 + 0.5) / 1e6 >= threshold,
                }
            )

    from ..common.raytools import pool_size

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        Scorer, batch_format="pandas", concurrency=pool_size(4), num_cpus=1
    )
