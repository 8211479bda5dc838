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

# Token = maximal (?U)\w run: strip-punctuation → split-on-\s ≡ extract
# \w runs (the equivalence tokenize_query's docstring proves).
TOKEN_PATTERN = r"(?U)\w+"


def tokenize(col: Column | str) -> Column:
    """F1 `tokenize` (`mapper1.py:5-10`): array of non-empty lowercase tokens.

    r17 (guide §1.2 "per-task work"): ONE ``regexp_extract_all`` pass
    replaces the previous strip(regexp_replace) → split(\\s+) →
    filter('') three-pass form — token-identical (a token is exactly a
    maximal ``(?U)\\w`` run either way, including empty/NULL edges;
    pinned by tests) and measured 15-25% faster at the full-query level
    (search_bm25_topk 1.73→1.35 s min, dedup_simhash 2.87→2.15 s min at
    sf0.1, alternating A/B) — this is the hottest expression in the
    repo (every index build and most dedup/text operators run it over
    the whole corpus).

    Unicode-whitespace contract (r18 advice): the single-pass form and
    the old three-pass form differ on text containing Unicode-only
    whitespace (NBSP, U+2000-200A, U+3000): the old ``split('\\s+')``
    used Java's ASCII ``\\s``, so ``'a\\u00A0b'`` survived as ONE token
    with the NBSP inside; the maximal-``(?U)\\w``-run definition splits
    it into ``a`` and ``b``.  The SPLIT behavior is the contract — it is
    what the Python reference (`mapper1.py`) produces, since Python's
    ``str.split()`` splits on Unicode whitespace — so r17's rewrite was
    a reference-parity FIX on this edge, pinned by
    tests/test_r17_optimizations.py::test_tokenize_unicode_whitespace.
    (The harness corpus is pure-ASCII, so the DuckDB oracles — RE2,
    ASCII ``\\w`` — are unaffected; ``tokenize_cjk`` intentionally keeps
    the three-pass form, whose strip step already spaces out CJK
    punctuation, and its oracle replays that same pipeline.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


# CJK codepoint classes with no inherent word delimiters: hiragana +
# katakana, CJK Unified (incl. ext A), hangul syllables.  BMP-only, so the
# class behaves identically in Java regex (UTF-16) and RE2 (UTF-8).
CJK_CLASS = ("\u3040-\u30ff"    # hiragana + katakana
             "\u3400-\u4dbf"    # CJK unified ideographs extension A
             "\u4e00-\u9fff"    # CJK unified ideographs
             "\uac00-\ud7af")   # hangul syllables


def tokenize_cjk(col: Column | str) -> Column:
    """Script-aware tokenizer variant (r17, VERDICT r16 #6): the reference
    tokenizer (F1) emits one giant token for an unsegmented CJK sentence —
    correct reference parity, wrong for dedup/BM25 over multilingual web
    text.  This OPT-IN variant keeps F1 semantics for space-delimited
    scripts and falls back to character BIGRAMS for CJK runs (the standard
    n-gram CJK indexing strategy, used by e.g. Lucene's CJKAnalyzer):

    lower → strip punctuation (same ``(?U)[^\\w\\s]`` as F1) → isolate
    each CJK codepoint run with surrounding spaces → split on whitespace →
    every CJK run of length >= 2 becomes its overlapping character
    bigrams, everything else (Latin/Cyrillic/digit runs, single CJK
    chars) passes through unchanged, in document order.

    All native column expressions (regexp_replace + higher-order
    transform/flatten — no UDF on the 100 TB path); the DuckDB oracle
    replays the identical pipeline with explicit codepoint classes."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), TOKEN_STRIP_PATTERN, " ")
    isolated = F.regexp_replace(stripped, f"([{CJK_CLASS}]+)", " $1 ")
    toks = F.filter(F.split(isolated, r"\s+"), lambda t: t != F.lit(""))

    def expand(t: Column) -> Column:
        bigrams = F.transform(F.sequence(F.lit(1), F.length(t) - 1),
                              lambda i: F.substring(t, i, F.lit(2)))
        return F.when(t.rlike(f"^[{CJK_CLASS}]{{2,}}$"),
                      bigrams).otherwise(F.array(t))

    return F.flatten(F.transform(toks, expand))


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
