"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path, so they run at scan speed on 100 TB.  Each has an exact ANSI
SQL equivalent (used by the DuckDB oracle) because the logic is plain
string/arithmetic ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
    "it": [" il ", " di ", " che "],
}

#: stopwords for the quality heuristic
QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def _occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    (len(s) - len(replace(s, needle, ''))) / len(needle); identical formula
    works in any SQL dialect."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def subword_count(col: Column) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + individual
    punctuation marks each count as one token."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("long")


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword-marker
    occurrence counts over a padded lowercase text; 'und' (undetermined)
    when no marker hits.

    This is the classic n-gram/stopword profile approach (Cavnar & Trenkle
    style) reduced to column expressions; at scale it runs in the scan
    stage with zero shuffles.
    """
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    scores = {lang: sum((_occurrences(padded, m) for m in marks), F.lit(0))
              for lang, marks in LANG_MARKERS.items()}
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # reverse order so earlier languages win ties (first match in list order)
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(col: Column) -> Column:
    return (F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]")) /
            F.greatest(F.length(col), F.lit(1))).cast("double")


def stopword_ratio(col: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    hits = sum((_occurrences(padded, f" {w} ") for w in QUALITY_STOPWORDS), F.lit(0))
    return (hits / F.greatest(token_count(col), F.lit(1))).cast("double")


def quality_score(col: Column) -> Column:
    """Composite document quality score in [0, 1]:

    - length component: tanh-ish saturation at 200 tokens;
    - lexical diversity: distinct/total token ratio;
    - stopword component: natural prose has some stopwords (target ~0.4);
    - punctuation sanity: heavy symbol soup is penalized.

    Mirrors the quality-signal recipes of public web-data pipelines (C4,
    Gopher rules) in pure SQL arithmetic.
    """
    toks = tokens(col)
    n = F.size(toks).cast("double")
    length_c = F.least(n / F.lit(200.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1.0))
    stop_c = F.lit(1.0) - F.least(F.abs(stopword_ratio(col) - F.lit(0.4)) /
                                  F.lit(0.4), F.lit(1.0))
    punct_c = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    return (F.round(F.lit(0.25) * (length_c + diversity + stop_c + punct_c), 6)
            .alias("quality"))


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 over whitespace-normalized
    lowercase text.  The cheap exact-dedup key (rolling-hash shingle
    fingerprints live in dedup.py as minhash/simhash)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def chunk_tokens(df, id_col: str, text_col: str,
                 chunk_size: int = 128, overlap: int = 16):
    """Overlapping token-window chunking — the document→training-sample
    splitter of an LLM data pipeline: each doc explodes into windows of
    ``chunk_size`` whitespace tokens starting every ``chunk_size −
    overlap`` tokens (the last window may be shorter).

    Pure JVM expressions end to end (split → sequence of starts →
    transform/slice → posexplode): the fan-out happens inside the task,
    output rows ∝ corpus tokens / stride, no Python and no driver.  The
    arithmetic is portable, so a DuckDB oracle reproduces every chunk
    byte-for-byte."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                        F.lit(step))
    chunks = F.transform(starts,
                         lambda s: F.slice(toks, s + 1, chunk_size))
    return (df.select(F.col(id_col), F.posexplode(chunks)
                      .alias("chunk_idx", "__c"))
            .select(id_col, "chunk_idx",
                    F.array_join("__c", " ").alias("chunk"),
                    F.size("__c").cast("long").alias("n_tokens")))
