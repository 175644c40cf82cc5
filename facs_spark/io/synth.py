"""Deterministic Common-Crawl-style page synthesizer (BASELINE.json
input_hint schema) — the engine's simNGS analogue (fixed seed like the
reference's ``tests/test_simngs.py:40``).

Every row is a pure function of ``(seed, doc_id)`` via splitmix64, so
the SAME table materializes for ANY Spark partitioning or parallelism
— the property the two-cluster-size scaling benchmark and the
resume-from-checkpoint tests rely on.

Schema: ``url string, warc_ts timestamp, html binary, text string,
lang string`` (+ optional ground-truth ``is_contam``).  ``text`` is
derived from ``html`` by the fixed extractor ``extract_text`` —
byte-identical per url (input_hint invariant), tested.

Two page populations with a known mix (the reference's 3000+6000
two-organism dataset, tests/test_simngs.py:113-149): "contaminated"
pages draw tokens from ``REF_VOCAB``, "clean" pages from the disjoint
``CLEAN_VOCAB`` ⇒ exact expected contamination_rate.  ``lang`` and
host are zipf-skewed to exercise salting (SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sketch.hashing import splitmix64

REF_VOCAB = np.array([
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
])
CLEAN_VOCAB = np.array([
    "zero", "wind", "stone", "river", "moon", "glass", "ember", "frost",
    "cloud", "birch", "otter", "maple", "crane", "tide", "fern", "slate",
    "wren", "dusk", "pine", "vale",
])
LANGS = np.array(["en", "de", "sv", "zh", "es", "fr", "pt", "nl"])
# zipf-ish lang mass: en ≈ 60%
LANG_CUM = np.cumsum(np.array([0.60, 0.12, 0.08, 0.07, 0.05, 0.04, 0.02, 0.02]))
N_HOSTS = 1000
EPOCH = np.datetime64("2024-01-01T00:00:00")

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
                "lang string")
PAGES_LABELED_SCHEMA = PAGES_SCHEMA + ", is_contam boolean"


def _u(ids: np.ndarray, salt: int) -> np.ndarray:
    """Per-id uniform uint64 stream, field-salted."""
    with np.errstate(over="ignore"):
        return splitmix64(ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                          + np.uint64(salt))


def _unit(ids: np.ndarray, salt: int) -> np.ndarray:
    return _u(ids, salt).astype(np.float64) / 2.0**64


def extract_text(html: bytes) -> str:
    """THE fixed extractor: text between <body> and </body> (UTF-8).

    Deterministic and total — the byte-identical-text-per-url
    invariant is ``text == extract_text(html)`` for every row.
    """
    s = html.decode("utf-8")
    start = s.index("<body>") + len("<body>")
    end = s.index("</body>")
    return s[start:end]


def synth_batch(ids: np.ndarray, seed: int = 6666520666,
                contam_frac: float = 0.3,
                mean_tokens: int = 60) -> pd.DataFrame:
    """Generate the page rows for a batch of doc ids (vectorized)."""
    ids = ids.astype(np.int64)
    n = ids.size
    base = np.int64(seed)
    is_contam = _unit(ids + base, 1) < contam_frac
    # token counts: 8 .. 2*mean (uniform-ish), deterministic
    n_tok = (8 + (_u(ids + base, 2) % np.uint64(2 * mean_tokens - 8))).astype(np.int64)
    # zipf-skewed host: h = floor(N^u) concentrates mass on low ids
    host = np.floor(N_HOSTS ** _unit(ids + base, 3)).astype(np.int64) % N_HOSTS
    lang = LANGS[np.searchsorted(LANG_CUM, _unit(ids + base, 4), side="right")]
    ts = EPOCH + (ids % 31_536_000).astype("timedelta64[s]")

    # flat token draw: token t of doc i ← hash(i, 5) + t re-mixed
    total = int(n_tok.sum())
    doc_of_tok = np.repeat(np.arange(n), n_tok)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=starts[1:])
    tok_pos = np.arange(total, dtype=np.int64) - starts[:-1][doc_of_tok]
    with np.errstate(over="ignore"):
        tok_hash = splitmix64(_u(ids + base, 5)[doc_of_tok]
                              + tok_pos.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03))
    ref_idx = (tok_hash % np.uint64(len(REF_VOCAB))).astype(np.int64)
    flat_tokens = np.where(is_contam[doc_of_tok],
                           REF_VOCAB[ref_idx], CLEAN_VOCAB[ref_idx])
    texts = [" ".join(flat_tokens[starts[i]:starts[i + 1]]) for i in range(n)]
    htmls = [f"<html><body>{t}</body></html>".encode("utf-8") for t in texts]
    urls = [f"https://host{h}.example/{l}/{i}"
            for h, l, i in zip(host, lang, ids)]
    return pd.DataFrame({
        "url": urls,
        "warc_ts": ts,
        "html": htmls,
        "text": texts,
        "lang": lang,
        "is_contam": is_contam,
    })


def synth_pages(spark, n_pages: int, seed: int = 6666520666,
                contam_frac: float = 0.3, mean_tokens: int = 60,
                partitions: int | None = None, with_labels: bool = False):
    """Distributed deterministic pages table as a Spark DataFrame."""
    from ..session import ensure_shipped
    ensure_shipped(spark)
    rng_df = spark.range(0, n_pages,
                         numPartitions=partitions) if partitions else spark.range(0, n_pages)

    def gen(iterator):
        for batch in iterator:
            out = synth_batch(batch["id"].to_numpy(), seed=seed,
                              contam_frac=contam_frac,
                              mean_tokens=mean_tokens)
            if not with_labels:
                out = out.drop(columns=["is_contam"])
            yield out

    schema = PAGES_LABELED_SCHEMA if with_labels else PAGES_SCHEMA
    return rng_df.mapInPandas(gen, schema=schema)


def reference_corpus_batch(n_docs: int = 50, seed: int = 424242,
                           mean_tokens: int = 200) -> pd.DataFrame:
    """The "genome" corpus: long contaminated-vocabulary documents whose
    k-grams form the Bloom membership set (FIXTURES.md §2)."""
    ids = np.arange(n_docs, dtype=np.int64)
    pdf = synth_batch(ids, seed=seed, contam_frac=1.0,
                      mean_tokens=mean_tokens)
    return pd.DataFrame({"ref_id": [f"ref{i}" for i in ids],
                         "text": pdf["text"]})
