"""Text-analysis functions for the documents table (EXT: language-ID,
quality scoring, token counting, fingerprinting — BASELINE.json).

Everything here is built-in `pyspark.sql.functions` expressions
(JVM-side, whole-stage codegen) — no Python UDFs in the hot path.
Each function returns a Column so operators/queries compose them.

Portability: the DuckDB oracle mirrors these with string_split_regex /
list_filter / md5; the shared primitive is ``hash32`` — the first 8
hex digits of md5 as a non-negative 32-bit integer, identical in any
engine that has md5().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lists (classic stopword-hit language-ID
# heuristic). Deliberately small — the point is the operator shape
# (n-gram/stopword scoring at scale), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# BPE-ish tokenizer: letter runs, digit runs, or single non-space
# symbols — the common shape of byte-pair pre-tokenization.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (empty → single '')."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")


def n_tokens(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def marker_hits(tokens: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (duplicates counted)."""
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_markers, t)))


def stopword_ratio(col: Column | str) -> Column:
    toks = ws_tokens(col)
    return marker_hits(toks, STOPWORDS).cast("double") / F.size(toks)


def lang_id(col: Column | str) -> Column:
    """Argmax of per-language marker hits, ties broken by language
    code order (deterministic).  'und' (undetermined) when no list
    scores a hit."""
    toks = ws_tokens(col)
    hits = {lang: marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Build the when-chain in reverse language order so earlier
    # languages win ties (first match in sorted order).
    for lang in sorted(hits, reverse=True):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def bpe_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), 0))


def fingerprint_md5(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of lower(trim(text))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def hash32(col: Column | str) -> Column:
    """Portable non-negative 32-bit hash: first 8 hex digits of md5.

    Identical in Spark (`conv(substring(md5(x),1,8),16,10)`) and
    DuckDB (`('0x' || substr(md5(x),1,8))::BIGINT`) — the shared
    primitive under minhash/simhash/LSH so oracles can replicate
    signatures exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


#: DuckDB twins of hash32/hash32_hi — oracle SQL builders interpolate
#: them with .format(x="<sql expr>").  Single-sourced here so the
#: portable-hash idiom can never drift between query modules.
H32_SQL = "('0x' || substr(md5({x}), 1, 8))::BIGINT"
H32HI_SQL = "('0x' || substr(md5({x}), 9, 8))::BIGINT"


def hash32_hi(col: Column | str) -> Column:
    """Second independent 32-bit hash: md5 hex digits 9-16.

    Paired with ``hash32`` this yields 64 independent portable hash
    bits (for the 64-bit SimHash) without ever assembling a value that
    overflows a signed BIGINT.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long")
