"""Text-analysis family declared queries + DuckDB oracle twins
(operators/textstats.py): token counts, quality features, language-ID,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import (LANG_MARKERS, STOPWORDS, predict_lang,
                                   quality_features, fingerprint)
from ..sources.io import load_table
from .search_queries import _TOKENS_CTE


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(load_table(spark, sf_dir, "documents"))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return predict_lang(load_table(spark, sf_dir, "documents"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram with per-source breadth — the shape of a
    vocabulary/contamination report."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokenize

    return (docs.select("source", F.explode(tokenize("text")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct("source").alias("n_sources")))


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 whitespace normalization (the reference's only Python UDF,
    `prepare_data.py:23-27`) as a native expression."""
    from ..functions.text import normalize_whitespace

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       normalize_whitespace("text").alias("normalized"))


def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation query: confusion counts of predicted vs labeled language
    (the documents table carries a `lang` label) — the shape of a pipeline
    quality report."""
    docs = load_table(spark, sf_dir, "documents")
    pred = predict_lang(docs).select("doc_id", "pred_lang")
    labeled = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                          F.col("lang").alias("true_lang"))
    return (labeled.join(pred, "doc_id")
            .groupBy("true_lang", "pred_lang")
            .agg(F.count("*").alias("n")))


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning composite (the shape of a real
    training-data prep job): quality gate (length + stopword bounds) →
    exact-dedup survivors on the token-set key → surviving doc ids with
    their quality stats."""
    from ..operators.dedup import dedup_exact, tokenset_key

    docs = load_table(spark, sf_dir, "documents")
    q = quality_features(docs)
    passing = q.filter((F.col("n_tokens") >= 20)
                       & (F.col("stopword_ratio") <= 0.3))
    filtered = (docs.withColumn("doc_id_s", F.col("doc_id").cast("string"))
                .join(passing.select(F.col("doc_id").alias("doc_id_s")),
                      "doc_id_s")
                .select("doc_id", "text"))
    survivors = dedup_exact(filtered, tokenset_key("text"))
    return (survivors.join(passing, "doc_id")
            .select("doc_id", "n_copies", "n_tokens", "stopword_ratio"))


# --- Unicode tokenizer parity --------------------------------------------
# The harness corpus is pure ASCII, so the `(?U)` tokenizer (Python-`\w`
# parity, SURVEY.md §7.5) only had pytest coverage.  This query tokenizes a
# fixed multilingual mini-corpus with the ENGINE tokenizer; the oracle is
# the literal expected output computed at module level with the reference's
# own Python semantics (`app/mapreduce/mapper1.py:5-10`:
# lower → re.sub(r'[^\w\s]', ' ') → split).  Characters avoid
# locale-sensitive case mappings (no Turkish İ, no final sigma).
_UNICODE_DOCS = [
    ("u1", "Héllo, wörld! Füße — straße."),
    ("u2", "Ελληνικά: ναι ή όχι;"),
    ("u3", "русский Текст здесь"),
    ("u4", "点心 好吃 12３4"),
    ("u5", "naïve café résumé's test"),
    ("u6", "  mixed\tWHITESPACE\nand ASCII words  "),
]


def _ref_tokenize(text: str) -> list[str]:
    import re

    return [t for t in re.sub(r"[^\w\s]", " ", text.lower()).split() if t]


def q_tokenize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    docs = spark.createDataFrame(_UNICODE_DOCS, "doc_id string, text string")
    return docs.select(
        "doc_id", F.posexplode(tokenize("text")).alias("position", "term"))


_UNI_EXPECTED = ", ".join(
    f"('{doc_id}', {i}, '{tok}')"
    for doc_id, text in _UNICODE_DOCS
    for i, tok in enumerate(_ref_tokenize(text)))


QUERIES = {
    "text_tokenize_unicode": q_tokenize_unicode,
    "pipeline_clean_corpus": q_clean_corpus,
    "text_langid_eval": q_langid_eval,
    "text_normalize": q_normalize,
    "text_quality": q_quality,
    "text_langid": q_langid,
    "text_fingerprint": q_fingerprint,
    "text_token_histogram": q_token_histogram,
}

_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

_LANG_SCORES = ",\n       ".join(
    "len(list_filter(toks, t -> t IN ({}))) AS score_{}".format(
        ", ".join(f"'{m}'" for m in markers), lang)
    for lang, markers in LANG_MARKERS.items())

_LANGS_SORTED = sorted(LANG_MARKERS)
_BEST = "greatest(" + ", ".join(f"score_{l}" for l in _LANGS_SORTED) + ")"
_PRED = "CASE WHEN {best} = 0 THEN 'und' {whens} END".format(
    best=_BEST,
    whens=" ".join(f"WHEN score_{l} = {_BEST} THEN '{l}'"
                   for l in _LANGS_SORTED))

ORACLES = {
    # Golden oracle: rows precomputed with the reference's Python tokenizer
    # (DuckDB's RE2 `\w` is ASCII-only and cannot express `(?U)` itself).
    "text_tokenize_unicode": f"""
SELECT doc_id, position, term
FROM (VALUES {_UNI_EXPECTED}) AS t(doc_id, position, term)
""",
    "pipeline_clean_corpus": f"""
WITH {_TOKENS_CTE},
quality AS (
  SELECT d.doc_id,
         CAST(len(d.toks) AS INTEGER) AS n_tokens,
         round(CASE WHEN len(d.toks) > 0
               THEN CAST(len(list_filter(d.toks, t -> t IN ({_STOP_LIST})))
                         AS DOUBLE) / len(d.toks)
               ELSE 0.0 END, 6) AS stopword_ratio,
         md5(array_to_string(list_sort(list_distinct(d.toks)), ' ')) AS k
  FROM docs d),
passing AS (
  SELECT * FROM quality WHERE n_tokens >= 20 AND stopword_ratio <= 0.3),
survivors AS (
  SELECT CAST(min(CAST(doc_id AS BIGINT)) AS VARCHAR) AS doc_id,
         count(*) AS n_copies
  FROM passing GROUP BY k)
SELECT s.doc_id, s.n_copies, p.n_tokens, p.stopword_ratio
FROM survivors s JOIN passing p USING (doc_id)
""",
    "text_langid_eval": f"""
WITH {_TOKENS_CTE},
scored AS (
  SELECT doc_id,
       {_LANG_SCORES}
  FROM docs),
pred AS (
  SELECT doc_id, {_PRED} AS pred_lang FROM scored)
SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang FROM documents) d
JOIN pred p USING (doc_id)
GROUP BY 1, 2
""",
    "text_normalize": """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS normalized
FROM documents
""",
    "text_quality": f"""
WITH {_TOKENS_CTE}
SELECT d.doc_id,
       length(x.text) AS n_chars,
       CAST(len(d.toks) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(x.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS INTEGER) AS n_bpe_tokens,
       round(CASE WHEN len(d.toks) > 0
             THEN CAST(length(x.text) AS DOUBLE) / len(d.toks)
             ELSE 0.0 END, 6) AS chars_per_token,
       round(CASE WHEN len(d.toks) > 0
             THEN CAST(len(list_filter(d.toks, t -> t IN ({_STOP_LIST})))
                       AS DOUBLE) / len(d.toks)
             ELSE 0.0 END, 6) AS stopword_ratio,
       round(CASE WHEN length(x.text) > 0
             THEN CAST(length(regexp_replace(x.text, '[^A-Za-z]', '', 'g'))
                       AS DOUBLE) / length(x.text)
             ELSE 0.0 END, 6) AS alpha_ratio,
       round(CASE WHEN length(x.text) > 0
             THEN CAST(length(regexp_replace(x.text, '[^0-9]', '', 'g'))
                       AS DOUBLE) / length(x.text)
             ELSE 0.0 END, 6) AS digit_ratio
FROM docs d JOIN (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text
                  FROM documents) x USING (doc_id)
""",
    "text_langid": f"""
WITH {_TOKENS_CTE},
scored AS (
  SELECT doc_id,
       {_LANG_SCORES}
  FROM docs)
SELECT doc_id, {", ".join("score_" + l for l in _LANGS_SORTED)},
       {_PRED} AS pred_lang
FROM scored
""",
    "text_fingerprint": f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
            THEN 0
            ELSE list_reduce(
                list_transform(
                    string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ''),
                    ch -> CAST(ascii(ch) AS BIGINT)),
                (a, b) -> (a * 31 + b) % 2147483647)
       END AS fingerprint
FROM documents
""",
    "text_token_histogram": f"""
WITH docs AS (
    SELECT source,
           list_filter(
               string_split_regex(
                   regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'), '\\s+'),
               t -> t <> '') AS toks
    FROM documents)
SELECT term, count(*) AS n_occurrences, count(DISTINCT source) AS n_sources
FROM (SELECT source, unnest(toks) AS term FROM docs)
GROUP BY term
""",
}
