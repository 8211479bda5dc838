"""Text scalar functions (SURVEY.md §2.7, F1-F3, F7) — all native column
expressions, zero Python UDFs.

The reference tokenizer (`app/mapreduce/mapper1.py:5-10`, duplicated at
`app/app.py:12-16`) is ``lower`` → ``re.sub(r'[^\\w\\s]', ' ')`` →
whitespace split.  Python ``\\w`` is Unicode; Java's is ASCII unless the
pattern opts in with ``(?U)`` (UNICODE_CHARACTER_CLASS) — SURVEY.md §7.5.
Staying native keeps the whole pipeline inside whole-stage codegen; a row-wise
Python UDF here would put a JVM→Python round-trip on the hottest path of a
100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-\w parity with the Python reference (SURVEY.md §7.5).
TOKEN_STRIP_PATTERN = r"(?U)[^\w\s]"


def tokenize(col: Column | str) -> Column:
    """F1 `tokenize` (`mapper1.py:5-10`): array of non-empty lowercase tokens.

    Splitting on ``\\s+`` yields a leading/trailing '' when the text starts or
    ends with stripped punctuation, so filter empties (SURVEY.md §7.5).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(c), TOKEN_STRIP_PATTERN, " "), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_query(query: str) -> list[str]:
    """F3 query normalization (`app/query.py:82-85`): ``lower`` +
    ``re.findall(r'\\w+')`` — provably token-equivalent to :func:`tokenize`
    (maximal ``\\w`` runs); driver-side because queries are tiny."""
    import re

    return re.findall(r"\w+", query.lower())


def normalize_whitespace(col: Column | str) -> Column:
    """F2 (`app/prepare_data.py:23-27`): collapse runs of whitespace, strip.
    The reference registers a Python UDF for this; native fns suffice."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sanitize_filename(col: Column | str) -> Column:
    """F7 (`app/prepare_data.py:32-33`): spaces→'_' then strip everything
    outside ``[a-zA-Z0-9_-]`` (only used by the per-doc text sink)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, " ", "_"), "[^a-zA-Z0-9_\\-]", "")


def char_poly_hash(col: Column | str, mod: int = 2_147_483_647, base: int = 31) -> Column:
    """Deterministic polynomial rolling hash over a string's characters:
    ``h = (h*base + ascii(ch)) % mod``, engine-portable (the same fold is
    expressible in DuckDB with ``list_reduce``), unlike xxhash64/murmur whose
    implementations differ between engines.  Used by the dedup / fingerprint
    extension ops (SimHash, MinHash, document fingerprinting) so their DuckDB
    oracles can reproduce identical hashes.

    Stays JVM-side: ``aggregate`` over ``split(col, '')`` is a codegen'd
    higher-order function, not a UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
