"""PII scrubbing for web-corpus curation — redact emails, phone
numbers, and IPv4 addresses before text ships to training.

The reference engine has no counterpart (it classifies reads, it never
rewrites them); this is the standard pre-training redaction pass every
crawl pipeline runs (C4/Dolma-style), expressed entirely as JVM
``regexp_replace``/``regexp_count`` expressions inside whole-stage
codegen — no Python in the hot path, no shuffle, scales as a pure map
over row groups at any corpus size.

Pattern contract (shared verbatim with the q60 DuckDB oracle, so every
regex must mean the same thing in Java regex and RE2 — no backrefs, no
lookaround):

* patterns are applied IN ORDER (email, US-style phone, E.164 phone,
  IPv4), each ``regexp_count`` evaluated on the text state produced by
  the previous replacement, so an already-redacted span is never
  double-counted;
* US phones run before IPv4 so a dotted phone (``555.123.4567``)
  redacts as a phone, not as a near-miss IP;
* replacement tokens are angle-bracket tags (``<EMAIL>`` etc.) —
  greppable, and themselves unmatched by every pattern (idempotent:
  scrubbing twice is a no-op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, replacement) — order is load-bearing, see module doc.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone_us", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("phone_e164", r"\+\d{7,15}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None,
              count_cols: bool = True) -> DataFrame:
    """Redact PII in ``text_col``; optionally add per-kind hit counts.

    Returns the input columns with ``out_col`` (default: ``text_col``
    replaced in place) holding the redacted text and, when
    ``count_cols``, one ``pii_<name>`` long per pattern counting the
    spans that pattern redacted.  Pure map — composes with any scan.
    """
    out_col = out_col or text_col
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, repl in PII_PATTERNS:
        # ONE regex pass per pattern instead of two (r7): split on
        # the pattern, then count = parts−1 and redacted text =
        # join(parts, repl).  Identical to regexp_count +
        # regexp_replace for these patterns: same left-to-right
        # non-overlapping Pattern scan, no zero-width matches, and
        # the literal replacements carry no group references;
        # codegen subexpression elimination evaluates the split once.
        parts = F.split(cur, pat, -1)
        if count_cols:
            counts.append(
                F.when(cur.isNull(), F.lit(None))
                .otherwise(F.size(parts) - 1).cast("long")
                .alias(f"pii_{name}"))
        cur = F.array_join(parts, repl)
    cols = [cur.alias(out_col) if c == out_col else F.col(c)
            for c in df.columns]
    if out_col not in df.columns:
        cols.append(cur.alias(out_col))
    return df.select(*cols, *counts)


# control chars minus \t\n\r (which the whitespace collapse handles);
# shared verbatim with the q77 oracle (same class in Java regex + RE2)
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_WS_CLASS = r"[ \t\r\n]+"


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   form: str = "NFC") -> DataFrame:
    """Unicode + whitespace hygiene — the canonicalization pass crawl
    text gets before dedup/tokenization (C4/CCNet-style cleanup):

    1. strip control characters (C0 minus tab/newline/CR, plus DEL) —
       pure JVM ``regexp_replace``;
    2. Unicode-normalize to ``form`` (NFC by default: combining
       sequences compose, so ``e`` + U+0301 and precomposed ``é``
       dedup/hash identically) — the ONE step Spark has no builtin
       for, done in a vectorized pandas kernel (``Series.str
       .normalize``, Arrow-batched, no per-row Python);
    3. collapse runs of space/tab/CR/LF to one space and trim —
       pure JVM again.

    Returns (id, text_norm, n_chars_before, n_chars_after, changed).
    Char counts are code points on both engines (Spark ``length`` ==
    DuckDB ``length``), so the q77 oracle replays every value with
    ``nfc_normalize`` + the same regex classes.  Scale: two codegen
    maps around one Arrow map — no shuffle anywhere.
    """
    import pandas as pd

    from ..session import ensure_parallelism, ensure_shipped
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    ensure_shipped(df.sparkSession)
    base = (df.select(F.col(id_col),
                      F.col(text_col).alias("_raw"),
                      F.regexp_replace(F.col(text_col), CONTROL_CLASS,
                                       "").alias("_t")))

    def kernel(batches):
        for pdf in batches:
            out = pd.DataFrame({
                id_col: pdf[id_col],
                "_raw": pdf["_raw"],
                "_t": pdf["_t"].astype("string").str.normalize(form)
                .astype(object)})
            yield out

    schema = f"{id_col} long, _raw string, _t string"
    normed = ensure_parallelism(base).mapInPandas(kernel, schema=schema)
    text_norm = F.trim(F.regexp_replace(F.col("_t"), _WS_CLASS, " "))
    return (normed.select(
        F.col(id_col),
        text_norm.alias("text_norm"),
        F.length("_raw").cast("long").alias("n_chars_before"),
        F.length(text_norm).cast("long").alias("n_chars_after"),
        (F.col("_raw") != text_norm).alias("changed")))
