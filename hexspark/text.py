"""Text-analysis operators for the training-data pipeline.

All hot-path functions are native Column expressions (JVM-side regex /
string ops — no Python UDFs), so they run inside whole-stage codegen
over the 10^12-row pages/documents table.  Each has a DuckDB SQL twin
for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}

TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"  # BPE-ish: words or single punct
WORD_SPLIT_RE = r"\s+"


def token_count(text: Column) -> Column:
    """Number of BPE-ish tokens (word runs + punctuation marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("long")


def dd_token_count(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{TOKEN_RE}')) AS BIGINT)"


def word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), WORD_SPLIT_RE)).cast("long")


def dd_word_count(text: str) -> str:
    # DuckDB single-quoted strings keep backslashes literally
    return f"CAST(len(string_split_regex(trim({text}), '{WORD_SPLIT_RE}')) AS BIGINT)"


def stopword_hits(text: Column, lang: str) -> Column:
    """Occurrences of the language's stopwords (word-boundary matches)."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0)).cast("long")


def dd_stopword_hits(text: str, lang: str) -> str:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return f"CAST(len(regexp_extract_all(lower({text}), '{pat}')) AS BIGINT)"


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, 'und' when zero."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    for lang in sorted(STOPWORDS):  # deterministic tie-break: first alphabetical wins ties via strict >
        h = hits[lang]
        take = h > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best_lang


def dd_lang_id(text: str) -> str:
    expr_lang = "'und'"
    expr_hits = "CAST(0 AS BIGINT)"
    for lang in sorted(STOPWORDS):
        h = dd_stopword_hits(text, lang)
        expr_lang = f"(CASE WHEN {h} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END)"
        expr_hits = f"(CASE WHEN {h} > {expr_hits} THEN {h} ELSE {expr_hits} END)"
    return expr_lang


def quality_score(text: Column) -> Column:
    """Deterministic integer quality score in [0, 100]:
    + length band, + stopword ratio band, - punctuation-heavy penalty.
    Integer arithmetic only → exact oracle parity."""
    n = F.length(text).cast("long")
    words = word_count(text)
    stops = stopword_hits(text, "en")
    punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9_\s]"), 0)
    ).cast("long")
    len_band = F.when(n >= 200, 40).when(n >= 50, 25).when(n >= 10, 10).otherwise(0)
    stop_band = F.when(stops * 100 >= words * 20, 30).when(
        stops * 100 >= words * 5, 20
    ).otherwise(5)
    punct_pen = F.when(punct * 100 > n * 20, 20).otherwise(0)
    return (len_band + stop_band - punct_pen + F.lit(30)).cast("long")


def dd_quality_score(text: str) -> str:
    n = f"CAST(length({text}) AS BIGINT)"
    words = dd_word_count(text)
    stops = dd_stopword_hits(text, "en")
    punct = f"CAST(len(regexp_extract_all({text}, '[^A-Za-z0-9_\\s]')) AS BIGINT)"
    len_band = f"(CASE WHEN {n} >= 200 THEN 40 WHEN {n} >= 50 THEN 25 WHEN {n} >= 10 THEN 10 ELSE 0 END)"
    stop_band = f"(CASE WHEN {stops} * 100 >= {words} * 20 THEN 30 WHEN {stops} * 100 >= {words} * 5 THEN 20 ELSE 5 END)"
    punct_pen = f"(CASE WHEN {punct} * 100 > {n} * 20 THEN 20 ELSE 0 END)"
    return f"CAST({len_band} + {stop_band} - {punct_pen} + 30 AS BIGINT)"


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (md5 exists identically in Spark and DuckDB)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def dd_fingerprint(text: str) -> str:
    return f"md5(regexp_replace(lower(trim({text})), '\\s+', ' ', 'g'))"
