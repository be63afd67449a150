"""Text primitives: normalization, tokenization, shingles, portable hashes.

Everything here is a built-in-function Catalyst expression (no Python UDFs)
and each hash is *engine-portable*: computed from ``md5`` hex so the DuckDB
oracle reproduces the exact same values. Spark's native ``hash``/``xxhash64``
are faster but engine-specific; ``portable_hash`` trades a few ns per value
for cross-engine verifiability. Scale note: md5-based hashing is still
JVM-side and codegen'd — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-zA-Z0-9À-ɏ֐-׿一-鿿]+"

# A small English stopword list shared verbatim with SQL oracles.
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not no i you he she we they do does did have has had"
).split()


def normalize_text(c: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used by
    dedup fingerprints (intent of reference embed/embed.go:30-31 newline
    flattening, minus the shell-escape curl artifact)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Lowercase word tokens; empty strings filtered out."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def py_tokens(s: str, unique: bool = False) -> list[str]:
    """Driver-side twin of :func:`tokens` for literal query strings — the
    SAME split regex, so a punctuated query like ``state-of-the-art``
    yields the matchable tokens ``state, of, the, art`` instead of the
    unmatchable ``stateoftheart`` an isalnum-strip tokenizer produces.
    ``unique=True`` keeps first occurrence order (query-facet semantics)."""
    import re

    out = [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t]
    if unique:
        seen: set[str] = set()
        out = [t for t in out if not (t in seen or seen.add(t))]
    return out


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """n-word shingles (space-joined) from an ALREADY-MATERIALIZED token
    array column. Prefer this two-step form (project tokens, then shingle)
    in operators: handing ``tokens(text)`` directly to the shingle HOF
    re-evaluates the split per lambda element — O(tokens²·len) per doc and
    ~10× slower end-to-end on real corpora.

    Documents shorter than n tokens produce their full token string as the
    single shingle, so no document silently drops out of dedup.
    """
    toks = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, sh).otherwise(F.array(F.array_join(toks, " ")))


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """n-word shingles straight from a text column (single-expression form;
    see ``shingles_from_tokens`` for the fast two-step form)."""
    return shingles_from_tokens(tokens(c), n)


def portable_hash(c: Column | str, seed: int = 0, nibbles: int = 8) -> Column:
    """Deterministic ``4·nibbles``-bit unsigned hash as BIGINT, identical in
    Spark and DuckDB: first ``nibbles`` hex chars of md5('<seed>:' || value),
    base-16 decoded. ``nibbles`` ≤ 15 keeps the value positive in int64.

    DuckDB equivalent: ``('0x' || substr(md5(seed || ':' || v), 1, n))::BIGINT``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, nibbles), 16, 10
    ).cast("long")


def portable_hash64(c: Column | str, seed: int = 0) -> Column:
    """63-bit positive hash (first 15 hex nibbles of md5) as BIGINT."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15), 16, 10).cast("long")
