"""Synthesizer invariants: determinism under any partitioning, the
byte-identical extract_text(html) == text invariant (input_hint), and
the known contamination mix."""

import numpy as np
import pandas as pd

from facs_spark.io.synth import (extract_text, reference_corpus_batch,
                                 synth_batch)


def test_rows_pure_function_of_id():
    a = synth_batch(np.arange(0, 200))
    b = synth_batch(np.arange(100, 150))
    merged = a.iloc[100:150].reset_index(drop=True)
    for col in ("url", "text", "lang"):
        assert merged[col].tolist() == b[col].tolist()
    assert [bytes(x) for x in merged["html"]] == [bytes(x) for x in b["html"]]


def test_extract_text_invariant():
    pdf = synth_batch(np.arange(500))
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text(bytes(html)) == text


def test_contamination_mix_and_vocab_disjoint():
    pdf = synth_batch(np.arange(20000), contam_frac=0.3)
    frac = pdf["is_contam"].mean()
    assert abs(frac - 0.3) < 0.02
    from facs_spark.io.synth import CLEAN_VOCAB, REF_VOCAB
    assert not set(REF_VOCAB) & set(CLEAN_VOCAB)
    contam_tokens = set(" ".join(
        pdf[pdf.is_contam]["text"].tolist()).split())
    clean_tokens = set(" ".join(
        pdf[~pdf.is_contam]["text"].tolist()).split())
    assert contam_tokens <= set(REF_VOCAB)
    assert clean_tokens <= set(CLEAN_VOCAB)


def test_lang_and_host_skew():
    pdf = synth_batch(np.arange(20000))
    langs = pdf["lang"].value_counts(normalize=True)
    assert langs["en"] > 0.5, "en must dominate (zipf lang mix)"
    hosts = pdf["url"].str.extract(r"https://host(\d+)\.")[0].astype(int)
    top_share = hosts.value_counts(normalize=True).iloc[:10].sum()
    assert top_share > 0.2, "host distribution must be skewed for salting tests"


def test_reference_corpus_deterministic():
    a = reference_corpus_batch(n_docs=10)
    b = reference_corpus_batch(n_docs=10)
    assert a["text"].tolist() == b["text"].tolist()
