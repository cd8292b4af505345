"""Round-4 batch 122: published corpus-quality filters as distributed
operators — the Gopher rule set (word-count / word-length / alpha-word /
stopword gates from Rae et al. 2021, reduced to the rules meaningful on
a single-line corpus), Gopher's duplicate-n-gram character fraction (the
within-document repetition statistic), cross-document n-gram novelty
(the share of a document's 4-grams first seen in it — the self-BLEU-ish
redundancy screen), and a PII scan (email / phone / IPv4 regex counts
per source).

House parity: every Gopher gate is an integer cross-multiplication
(3n <= chars <= 10n, 5*alpha >= 4n), never a float-mean compare;
duplicate-gram coverage and novelty counts are exact integers with ONE
shared division each; PII patterns are RE2-safe (no backrefs, no \\b,
non-capturing groups) so Python re and DuckDB regexp_extract_all count
identical non-overlapping matches.

Scale contracts: per-document features compute in one map_batches pass
(documents never leave their batch); novelty's global gram table moves
through bucketed exchanges keyed on the gram and doc_id (gram -> min
doc via hash_bucket_aggregate, co-partitioned join back, per-doc count
reduce) — no driver-side vocabulary at any point."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away

QUERIES122: dict = {}
ORACLES122: dict = {}

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WS_RE = re.compile(r"\s+")

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"
PII_IPV4 = r"(?:\d{1,3}\.){3}\d{1,3}"


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------


def q_gopher_quality_rules(sf_dir: str):
    """Per document: the Gopher quality gates computable on a
    single-line corpus (the line-based bullet/ellipsis rules are
    degenerate here and omitted) — word count in [50, 100000], mean word
    length in [3, 10] as the integer cross-multiplication
    3n <= chars <= 10n, alpha-word share >= 0.8 as 5*alpha >= 4n, and at
    least 2 distinct hits from Gopher's 8-stopword list — plus the
    conjunction keep flag. Everything is exact integer arithmetic."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        n_words = np.zeros(len(batch), dtype=np.int64)
        total_len = np.zeros(len(batch), dtype=np.int64)
        alpha = np.zeros(len(batch), dtype=np.int64)
        stops = np.zeros(len(batch), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = t.split()
            n_words[i] = len(ws)
            total_len[i] = sum(len(w) for w in ws)
            alpha[i] = sum(1 for w in ws if _ALPHA_RE.search(w))
            present = set(ws)
            stops[i] = sum(1 for sw in GOPHER_STOPWORDS if sw in present)
        r_wc = ((n_words >= 50) & (n_words <= 100_000)).astype(np.int64)
        r_mwl = ((3 * n_words <= total_len) & (total_len <= 10 * n_words)).astype(
            np.int64
        )
        r_alpha = (5 * alpha >= 4 * n_words).astype(np.int64)
        r_stop = (stops >= 2).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "n_words": n_words,
                "rule_word_count": r_wc,
                "rule_word_len": r_mwl,
                "rule_alpha": r_alpha,
                "rule_stopword": r_stop,
                "keep": (r_wc & r_mwl & r_alpha & r_stop).astype(np.int64),
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        feats, batch_format="pandas"
    )


ORACLES122["gopher_quality_rules"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                     x -> x <> '') AS l,
         CAST(length(regexp_replace(COALESCE(text, ''), '\\s+', '', 'g'))
              AS BIGINT) AS total_len
  FROM documents
),
s AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n, total_len,
         CAST(len(list_filter(l, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS alpha,
         (CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'be') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'to') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'that') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'have') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(l, 'with') THEN 1 ELSE 0 END)
           AS stop_hits
  FROM w
)
SELECT doc_id, n AS n_words,
       CAST(CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END AS BIGINT)
         AS rule_word_count,
       CAST(CASE WHEN 3 * n <= total_len AND total_len <= 10 * n
                 THEN 1 ELSE 0 END AS BIGINT) AS rule_word_len,
       CAST(CASE WHEN 5 * alpha >= 4 * n THEN 1 ELSE 0 END AS BIGINT)
         AS rule_alpha,
       CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT)
         AS rule_stopword,
       CAST(CASE WHEN n >= 50 AND n <= 100000
                  AND 3 * n <= total_len AND total_len <= 10 * n
                  AND 5 * alpha >= 4 * n AND stop_hits >= 2
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# Gopher duplicate-n-gram character fraction
# ---------------------------------------------------------------------------


def q_dup_ngram_char_fraction(sf_dir: str, n: int = 3):
    """Per document: the fraction of non-whitespace characters covered
    by word 3-grams that occur at least twice WITHIN the document —
    Gopher's duplicate-n-gram repetition statistic (a high fraction
    flags boilerplate/spam). A token is covered if any duplicated gram
    window contains it; covered and total character counts are exact
    integers, the fraction one shared division."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        out_n = np.zeros(len(batch), dtype=np.int64)
        out_cov = np.zeros(len(batch), dtype=np.int64)
        out_tot = np.zeros(len(batch), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = t.split()
            out_n[i] = len(ws)
            lens = [len(w) for w in ws]
            out_tot[i] = sum(lens)
            if len(ws) < n:
                continue
            grams = [tuple(ws[j : j + n]) for j in range(len(ws) - n + 1)]
            counts: dict = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            covered = np.zeros(len(ws), dtype=bool)
            for j, g in enumerate(grams):
                if counts[g] >= 2:
                    covered[j : j + n] = True
            out_cov[i] = int(sum(l for l, c in zip(lens, covered) if c))
        keep = out_tot > 0
        frac = np.zeros(len(batch), dtype=np.float64)
        frac[keep] = out_cov[keep].astype(np.float64) / out_tot[keep].astype(
            np.float64
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
                "n_words": out_n[keep],
                "covered_chars": out_cov[keep],
                "total_chars": out_tot[keep],
                "dup_char_frac": _r6away(frac[keep]),
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        feats, batch_format="pandas"
    )


ORACLES122["dup_ngram_char_fraction"] = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                     x -> x <> '') AS l
  FROM documents
),
t AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) AS pos, unnest(l) AS tok
  FROM base
),
g AS (
  SELECT t1.doc_id, t1.pos AS start,
         t1.tok || ' ' || t2.tok || ' ' || t3.tok AS gram
  FROM t t1
  JOIN t t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN t t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2
),
dup AS (
  SELECT g.doc_id, g.start
  FROM g JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.gram = g.gram
  WHERE cnt.c >= 2
),
covered AS (
  SELECT DISTINCT t.doc_id, t.pos, len(t.tok) AS wlen
  FROM t JOIN dup d
    ON d.doc_id = t.doc_id AND t.pos BETWEEN d.start AND d.start + 2
),
per AS (
  SELECT b.doc_id, CAST(len(b.l) AS BIGINT) AS n_words,
         CAST(COALESCE((SELECT SUM(wlen) FROM covered c
                        WHERE c.doc_id = b.doc_id), 0) AS BIGINT)
           AS covered_chars,
         CAST(length(regexp_replace(
               (SELECT text FROM documents d WHERE d.doc_id = b.doc_id),
               '\\s+', '', 'g')) AS BIGINT) AS total_chars
  FROM base b
)
SELECT doc_id, n_words, covered_chars, total_chars,
       ROUND(CAST(covered_chars AS DOUBLE) / CAST(total_chars AS DOUBLE), 6)
         AS dup_char_frac
FROM per WHERE total_chars > 0
"""


# ---------------------------------------------------------------------------
# Cross-document n-gram novelty
# ---------------------------------------------------------------------------


def q_ngram_novelty(sf_dir: str, n: int = 4):
    """Per document: how many of its DISTINCT word 4-grams are novel —
    first seen in this document (global minimum doc_id owner) — and the
    novelty share. A low share means the document restates earlier
    corpus content (self-BLEU-ish redundancy). Distributed plan: one
    batch pass emits per-document distinct grams (already globally
    unique pairs); gram -> min doc_id reduces through a gram-keyed
    exchange; the verdict joins back co-partitioned on the gram; per-doc
    counts reduce through a doc_id-keyed exchange. The driver never
    holds the gram table."""

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        rows_doc: list = []
        rows_gram: list = []
        for doc_id, t in zip(
            batch["doc_id"].to_numpy(np.int64), batch["text"].fillna("")
        ):
            ws = t.split()
            if len(ws) < n:
                continue
            seen = {
                " ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)
            }
            rows_doc.extend(int(doc_id) for _ in seen)
            rows_gram.extend(seen)
        return pd.DataFrame(
            {
                "gram": rows_gram,
                "doc_id": np.array(rows_doc, dtype=np.int64),
            }
        )

    pairs = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        grams, batch_format="pandas"
    )
    mins = hash_bucket_aggregate(pairs, ["gram"], [("doc_id", "min")])
    joined = bucketed_join(pairs, mins, on=["gram"])

    def verdict(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "one": np.ones(len(batch), dtype=np.int64),
                "novel": (
                    batch["doc_id"].to_numpy(np.int64)
                    == batch["doc_id_min"].to_numpy(np.int64)
                ).astype(np.int64),
            }
        )

    per_doc = hash_bucket_aggregate(
        joined.map_batches(verdict, batch_format="pandas"),
        ["doc_id"],
        [("one", "sum"), ("novel", "sum")],
    ).to_pandas()
    ng = per_doc["one_sum"].to_numpy(np.int64)
    nv = per_doc["novel_sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "doc_id": per_doc["doc_id"].to_numpy(np.int64),
            "n_grams": ng,
            "n_novel": nv,
            "novelty": _r6away(nv.astype(np.float64) / ng.astype(np.float64)),
        }
    )


ORACLES122["ngram_novelty"] = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                     x -> x <> '') AS l
  FROM documents
),
t AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) AS pos, unnest(l) AS tok
  FROM base
),
g AS (
  SELECT DISTINCT t1.doc_id,
         t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok AS gram
  FROM t t1
  JOIN t t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN t t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
  JOIN t t4 ON t4.doc_id = t1.doc_id AND t4.pos = t1.pos + 3
),
m AS (SELECT gram, MIN(doc_id) AS mn FROM g GROUP BY 1)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE m.mn = g.doc_id) AS BIGINT) AS n_novel,
       ROUND(CAST(COUNT(*) FILTER (WHERE m.mn = g.doc_id) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM g JOIN m USING (gram)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# PII scan
# ---------------------------------------------------------------------------


def q_pii_scan(sf_dir: str):
    """Per source: documents containing and total occurrences of email /
    phone / IPv4 patterns — the pre-release PII screen every corpus
    audit runs (zero hits is itself the auditable answer). Patterns are
    RE2-safe and count identical leftmost non-overlapping matches in
    Python re and DuckDB."""
    email_re = re.compile(PII_EMAIL)
    phone_re = re.compile(PII_PHONE)
    ipv4_re = re.compile(PII_IPV4)

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        em = texts.map(lambda t: len(email_re.findall(t))).to_numpy(np.int64)
        ph = texts.map(lambda t: len(phone_re.findall(t))).to_numpy(np.int64)
        ip = texts.map(lambda t: len(ipv4_re.findall(t))).to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "n_docs": np.ones(len(batch), dtype=np.int64),
                    "docs_with_pii": ((em + ph + ip) > 0).astype(np.int64),
                    "n_emails": em,
                    "n_phones": ph,
                    "n_ipv4": ip,
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            feats, batch_format="pandas"
        ),
        ["source"],
        [
            ("n_docs", "sum"),
            ("docs_with_pii", "sum"),
            ("n_emails", "sum"),
            ("n_phones", "sum"),
            ("n_ipv4", "sum"),
        ],
    ).to_pandas()
    return agg.rename(
        columns={
            "n_docs_sum": "n_docs",
            "docs_with_pii_sum": "docs_with_pii",
            "n_emails_sum": "n_emails",
            "n_phones_sum": "n_phones",
            "n_ipv4_sum": "n_ipv4",
        }
    )


ORACLES122["pii_scan"] = f"""
WITH per AS (
  SELECT source,
         len(regexp_extract_all(COALESCE(text, ''), '{PII_EMAIL}')) AS em,
         len(regexp_extract_all(COALESCE(text, ''), '{PII_PHONE}')) AS ph,
         len(regexp_extract_all(COALESCE(text, ''), '{PII_IPV4}')) AS ip
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE em + ph + ip > 0) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(em) AS BIGINT) AS n_emails,
       CAST(SUM(ph) AS BIGINT) AS n_phones,
       CAST(SUM(ip) AS BIGINT) AS n_ipv4
FROM per GROUP BY 1
"""


QUERIES122["gopher_quality_rules"] = q_gopher_quality_rules
QUERIES122["dup_ngram_char_fraction"] = q_dup_ngram_char_fraction
QUERIES122["ngram_novelty"] = q_ngram_novelty
QUERIES122["pii_scan"] = q_pii_scan
