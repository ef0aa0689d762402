"""Text-analysis column expressions for large-scale corpus pipelines.

Everything here is a pure JVM-side Column expression (no Python UDFs),
so it stays inside whole-stage codegen and scales linearly with
executors. Each helper has an exactly-equivalent ANSI-SQL spelling used
by the DuckDB oracle (see queries.py) — keep the two in sync.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared stopword list (tiny on purpose: used as a deterministic signal
# for quality scoring, not linguistic truth).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Marker tokens per language for the n-gram/stopword language-ID
# heuristic. Ordered: ties resolve to the earliest entry.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "is")),
    ("es", ("el", "la", "de", "que")),
    ("de", ("der", "und", "die", "ist")),
    ("fr", ("le", "et", "la", "est")),
    ("zh", ("de5", "shi4", "le5", "zai4")),
)


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (matches regexp_split_to_array '\\s+').

    Empty / whitespace-only text yields [] (Spark's split would yield
    [''], making token_count 1 for empty docs). DuckDB oracle spelling:
      CASE WHEN trim(t) = '' THEN [] ELSE regexp_split_to_array(trim(t), '\\s+') END
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# punctuation marks — the split a byte-pair tokenizer starts from.
# ASCII classes only, so Java (Spark) and RE2-ish (DuckDB) regex
# engines agree byte-for-byte; DuckDB spelling:
#   regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_tokens(col: str | Column = "text") -> Column:
    """Regex pre-tokenization (letters/digits/punct marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        F.coalesce(c, F.lit("")), F.lit(BPE_TOKEN_RE), 0
    )


def unique_token_count(col: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def punct_count(col: str | Column = "text") -> Column:
    """Characters that are not alphanumeric/whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def normalized_text(col: str | Column = "text") -> Column:
    """lower + trim + collapse internal whitespace — dedup canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def content_hash(col: str | Column = "text") -> Column:
    """sha256 hex of the normalized text (exact-dedup key)."""
    return F.sha2(normalized_text(col), 256)


def fingerprint_hex(col: str | Column = "text") -> Column:
    """md5 hex of the normalized text (cheap 128-bit fingerprint)."""
    return F.md5(normalized_text(col))


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; whole text if fewer than k tokens.

    Pure array expression: transform over a sequence of start offsets,
    each shingle being concat_ws(' ', slice(toks, i, k)). NOTE: array
    higher-order functions evaluate their lambda INTERPRETED (outside
    whole-stage codegen) — prefer ``word_shingles_text`` in hot paths.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def word_shingles_text(
    col: str | Column = "text", k: int = 3, distinct: bool = True
) -> Column:
    """``word_shingles`` computed in ONE native regex pass — identical
    output, ~3x faster on corpus-scale explodes. ``distinct=False``
    keeps the positional (ordered, repeated) shingle sequence, which
    winnowing needs.

    Whitespace is first collapsed to single spaces, then overlapping
    k-token windows are captured with a lookahead group while each
    match consumes exactly one token: ``(?=(\\S+ \\S+ \\S+))\\S+ ?``.
    A failed lookahead only occurs where fewer than k tokens remain, so
    char-by-char bumping never fabricates a mid-token shingle. Docs
    with fewer than k tokens fall back to the whole collapsed text
    (matching the slice-based spelling, including '' for empty docs).
    """
    c = F.col(col) if isinstance(col, str) else col
    collapsed = F.regexp_replace(F.trim(F.coalesce(c, F.lit(""))), r"\s+", " ")
    pat = "(?=(" + " ".join(["\\S+"] * k) + "))\\S+ ?"
    got = F.regexp_extract_all(collapsed, F.lit(pat), F.lit(1))
    out = F.when(F.size(got) > 0, got).otherwise(F.array(collapsed))
    return F.array_distinct(out) if distinct else out


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB.

    md5 hex -> first 15 hex digits -> int. DuckDB spelling:
      CAST('0x' || substr(md5(seed || ':' || s), 1, 15) AS BIGINT)
    Used by MinHash/SimHash so the oracle can replay signatures exactly.
    """
    keyed = F.concat_ws(":", F.lit(str(seed)), col)
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


# ------------------------------------------- multiply-shift mix family
#
# MinHash needs num_perms independent hashes per shingle. Hashing the
# string num_perms times (md5 each) makes the signature build O(perms)
# string hashes per shingle — the measured hot spot of the whole dedup
# path. Instead: ONE md5 per shingle -> 60-bit base, then a per-perm
# multiply-shift mix over the base's 30-bit halves. Every operation
# (&, >>, *, +) is exact BIGINT arithmetic with all intermediates
# < 2^62, so Spark (ANSI) and DuckDB compute identical values with no
# overflow on either engine.

MIX_MASK30 = (1 << 30) - 1
MIX_MASK60 = (1 << 60) - 1


def mix_constants(p: int) -> tuple[int, int, int]:
    """Per-permutation (a, b, c): md5-derived, a/b odd 30-bit, c 60-bit.
    Public multiply-shift universal-hash construction (Dietzfelbinger
    et al.); constants are plan-time literals on both engines."""

    def _h(tag: str, bits: int) -> int:
        v = int(hashlib.md5(f"{tag}:{p}".encode()).hexdigest()[:15], 16)
        return v & ((1 << bits) - 1)

    return _h("A", 30) | 1, _h("B", 30) | 1, _h("C", 60)


def mix_hash(base: Column, p: int) -> Column:
    """Permutation p of a 60-bit ``base`` hash: (a*lo & M) + (b*hi & M)
    + c, all masked to 60 bits. ~6 integer ops vs one md5 — the reason
    a 16-perm MinHash costs 1 string hash per shingle, not 16."""
    a, b, c = mix_constants(p)
    lo = base.bitwiseAND(F.lit(MIX_MASK30))
    hi = F.shiftright(base, 30)
    return (
        (lo * F.lit(a)).bitwiseAND(F.lit(MIX_MASK60))
        + (hi * F.lit(b)).bitwiseAND(F.lit(MIX_MASK60))
        + F.lit(c)
    ).bitwiseAND(F.lit(MIX_MASK60))


def mix_hash_sql(base_expr: str, p: int) -> str:
    """The identical permutation as a DuckDB expression."""
    a, b, c = mix_constants(p)
    return (
        f"(((({base_expr} & {MIX_MASK30}) * {a}) & {MIX_MASK60}) + "
        f"((({base_expr} >> 30) * {b}) & {MIX_MASK60}) + {c}) "
        f"& {MIX_MASK60}"
    )


def mix_hash_spark_sql(base_expr: str, p: int) -> str:
    """``mix_hash`` as a Spark-SQL string (same ops/constants as the
    Column spelling, so values are bit-identical). One parsed string
    per permutation replaces ~10 py4j round-trips per Column-built
    permutation — on a 16-perm signature that is hundreds of driver
    round-trips per plan, a measurable slice of every MinHash query's
    wall time (driver plan construction is serial overhead at any
    cluster size). ``shiftright`` spelled as the function for parser
    portability."""
    a, b, c = mix_constants(p)
    return (
        f"(((({base_expr} & {MIX_MASK30}) * {a}) & {MIX_MASK60}) + "
        f"((shiftright({base_expr}, 30) * {b}) & {MIX_MASK60}) + {c}) "
        f"& {MIX_MASK60}"
    )
