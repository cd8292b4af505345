"""Kernel tests for pipelines/queries122.py — Gopher gate edges, the
duplicate-n-gram coverage math, novelty's min-doc ownership, and PII
pattern counting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": sources if sources is not None else ["s0"] * n,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_gopher_rules_integer_boundaries(tmp_path):
    from signalsharp_ray.pipelines.queries122 import q_gopher_quality_rules

    good = " ".join(["the"] + ["that"] + ["word"] * 48)  # 50 words, mwl ok
    short = "the that word"  # 3 words: fails word count
    _write_docs(tmp_path, [good, short])
    out = q_gopher_quality_rules(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "rule_word_count"] == 1
    assert out.loc[0, "rule_word_len"] == 1  # mean in [3,10]
    assert out.loc[0, "rule_stopword"] == 1  # 'the' + 'that'
    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "rule_word_count"] == 0
    assert out.loc[1, "keep"] == 0


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_char_fraction_covers_repeated_windows(tmp_path):
    from signalsharp_ray.pipelines.queries122 import q_dup_ngram_char_fraction

    # "a b c" appears twice; tokens a b c a b c d are all covered except d
    doc = "aa bb cc aa bb cc dd"
    clean = "xx yy zz ww"  # no repeated 3-gram
    _write_docs(tmp_path, [doc, clean])
    out = (
        q_dup_ngram_char_fraction(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "covered_chars"] == 12  # 6 covered tokens x 2 chars
    assert out.loc[0, "total_chars"] == 14
    assert out.loc[0, "dup_char_frac"] == pytest.approx(12 / 14, abs=1e-6)
    assert out.loc[1, "covered_chars"] == 0
    assert out.loc[1, "dup_char_frac"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_ngram_novelty_min_doc_owns_gram(tmp_path):
    from signalsharp_ray.pipelines.queries122 import q_ngram_novelty

    a = "one two three four five"  # grams: 1234, 2345 — both novel
    b = "one two three four nine"  # gram 1234 owned by doc 0, 234n novel
    _write_docs(tmp_path, [a, b])
    out = q_ngram_novelty(str(tmp_path)).set_index("doc_id")
    assert out.loc[0, "n_grams"] == 2 and out.loc[0, "n_novel"] == 2
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_novel"] == 1
    assert out.loc[1, "novelty"] == pytest.approx(0.5)


@pytest.mark.usefixtures("ray_session")
def test_pii_scan_counts_patterns(tmp_path):
    from signalsharp_ray.pipelines.queries122 import q_pii_scan

    texts = [
        "contact bob@example.com or alice@test.org now",
        "call 555-123-4567 from 10.0.0.1 please",
        "totally clean text here",
    ]
    _write_docs(tmp_path, texts, sources=["s0", "s0", "s1"])
    out = q_pii_scan(str(tmp_path)).set_index("source")
    assert out.loc["s0", "n_emails"] == 2
    assert out.loc["s0", "n_phones"] == 1
    assert out.loc["s0", "n_ipv4"] == 1
    assert out.loc["s0", "docs_with_pii"] == 2
    assert out.loc["s1", "docs_with_pii"] == 0
