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


def test_sweep_tool_smoke():
    """The ROC-sweep harness (tools/sweep.py, the executable analogue
    of the reference's doc/ROC.m grids): one tiny grid point set on
    the labeled mix — perfect separation at low tole on the disjoint
    vocabularies, monotone TPR in tole, FPR bounded by the filter's
    error rate."""
    import sys
    sys.path.insert(0, ".")
    from tools.sweep import sweep

    from facs_spark.session import get_spark
    spark = get_spark("facs_sweep_test", cpus=4, shuffle_partitions=4)
    rows = sweep(spark, n_pages=400, contam_frac=0.3,
                 k_grid=[12, 15], tole_grid=[0.1, 0.4, 0.9])
    assert len(rows) == 6
    by_k = {}
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 400
        assert r["fpr"] <= 0.01  # disjoint vocab + tight filter
        by_k.setdefault(r["k"], []).append(r)
    for k, rs in by_k.items():
        rs.sort(key=lambda r: r["tole"])
        tprs = [r["tpr"] for r in rs]
        assert tprs == sorted(tprs, reverse=True), (k, tprs)
        assert tprs[0] >= 0.99  # low tole recovers the planted mix
