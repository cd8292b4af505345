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
