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


class QualityScorer:
    """Actor-pool stage: per-doc quality heuristics (regexes compiled once)."""

    def __init__(self):
        self.punct = re.compile(r"[.,;:!?'\"()\[\]{}-]")
        self.digit = re.compile(r"\d")
        self.upper = re.compile(r"[A-Z]")
        self.word = re.compile(r"[a-zA-Z']+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        denom = n_chars.clip(lower=1).astype(np.float64)
        n_punct = text.str.count(self.punct).astype(np.int64)
        n_digit = text.str.count(self.digit).astype(np.int64)
        n_upper = text.str.count(self.upper).astype(np.int64)
        words = text.str.findall(self.word)
        n_words = words.str.len().astype(np.int64)
        stop_hits = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in _STOPWORDS)
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_words": n_words,
                "punct_ratio": n_punct / denom,
                "digit_ratio": n_digit / denom,
                "upper_ratio": n_upper / denom,
                "stopword_ratio": stop_hits / n_words.clip(lower=1).astype(np.float64),
            }
        )
        # composite: long-enough, low-symbol, natural-language-looking docs
        out["quality_score"] = (
            np.clip(out["n_words"] / 100.0, 0, 1) * 0.4
            + np.clip(out["stopword_ratio"] * 2.5, 0, 1) * 0.4
            + (1.0 - np.clip(out["digit_ratio"] * 5, 0, 1)) * 0.2
        )
        return out


def quality_scores(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(
        QualityScorer,
        batch_format="pandas",
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
    """Actor-pool heuristic language id: stopword votes + CJK char ratio."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk = re.compile(r"[一-鿿]")

    def _predict(self, s: str) -> str:
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": batch["text"].fillna("").map(self._predict),
            }
        )


def language_id(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(
        LanguageId,
        batch_format="pandas",
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
