"""Text-analysis family declared queries + DuckDB oracle twins
(operators/textstats.py): token counts, quality features, language-ID,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64_sql
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


HEAVY_HITTER_K = 31


def q_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (tokens with frequency > n/(k+1),
    k={k}) via the two-pass Misra-Gries candidate/verify shape
    (operators.sketches.heavy_hitters_exact): pass 1 streams each
    partition through k bounded counters (mergeable-summaries batched
    rule) and ships ≤ k candidates per partition; pass 2 exact-counts
    candidates only.  Complements ``text_heavy_hitters`` (approx_top_k
    sketch, fixed OUTPUT size): this variant guarantees an exact
    FREQUENCY-threshold answer with O(k) pass-1 state even when distinct
    keys exceed any tracking budget — at 100 TB it replaces the full
    distinct-vocabulary shuffle with k × partitions candidate rows + a
    candidate-filtered count.  The threshold compare is pure integer
    arithmetic (freq·(k+1) > n); the oracle is a plain GROUP BY ...
    HAVING — losslessness of the candidate pass is exactly what a green
    row certifies."""
    from pyspark import StorageLevel

    from ..functions.text import tokenize
    from ..operators.sketches import heavy_hitters_exact

    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(tokenize("text")).alias("term"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    return heavy_hitters_exact(toks, "term", HEAVY_HITTER_K)


q_heavy_hitters_exact.__doc__ = \
    q_heavy_hitters_exact.__doc__.format(k=HEAVY_HITTER_K)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-driven BPE encode (round-4 brief task #6): the fixed
    BPE_MERGES table folded over each DISTINCT word's char array in rank
    order (native higher-order functions), broadcast-joined back to word
    occurrences, per-doc piece sequence reassembled in order.  The
    DuckDB twin re-implements the same fold with list_reduce, so the
    oracle row certifies the merge semantics themselves (cascades,
    rank-order blocking, left-to-right non-overlap) — not just counts."""
    from ..operators.textstats import bpe_encode

    return bpe_encode(load_table(spark, sf_dir, "documents"))


BPE_TRAIN_MERGES = 8  # unrolled round count in the DuckDB oracle


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table TRAINING over the corpus (Sennrich et al.
    ACL'16): per-round adjacent-pair argmax over the frequency-weighted
    DISTINCT vocabulary, deterministic (count DESC, lhs, rhs) tie-break.
    The oracle unrolls the same 8 rounds in SQL — each round's merge is
    re-derived by DuckDB and folded via a correlated list_reduce, so a
    green row certifies the full training loop (pair counting incl.
    overlaps, argmax tie-break, left-to-right non-overlapping merge
    application), not just the final table shape."""
    from ..operators.textstats import bpe_train

    return bpe_train(load_table(spark, sf_dir, "documents"),
                     n_merges=BPE_TRAIN_MERGES)


SAMPLE_PER_KEY_K = 5
SAMPLE_PER_KEY_SALT = "pk7"


def q_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sample (hash-rank reservoir
    replacement): 5 docs per source by md5 order — the eval-set-carving /
    per-source-cap primitive whose per-key output size is exact, unlike
    Bernoulli sampleBy."""
    from ..operators.prepare import sample_per_key

    return sample_per_key(load_table(spark, sf_dir, "documents"),
                          "source", SAMPLE_PER_KEY_K,
                          salt=SAMPLE_PER_KEY_SALT)


def q_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END tokenizer lifecycle: learn the 8-merge table from the
    corpus (bpe_learn_merges — bounded driver collect per round), then
    tokenize the SAME corpus with the learned table (bpe_encode's
    dictionary-encoded fold + broadcast-back).  The oracle re-derives
    the merges in SQL and threads them through correlated encode folds,
    so train→apply is certified as one contract."""
    from ..operators.textstats import bpe_encode, bpe_learn_merges

    docs = load_table(spark, sf_dir, "documents")
    learned = tuple((m[1], m[2])
                    for m in bpe_learn_merges(docs, BPE_TRAIN_MERGES))
    return bpe_encode(docs, merges=learned)


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


# --- CJK script-aware tokenization (r17, VERDICT r16 #6) -------------------
# The `(?U)\w`-run tokenizer emits ONE token for an unsegmented CJK
# sentence — reference parity, but wrong for the LLM-data north star
# (dedup/BM25 over multilingual web text).  tokenize_cjk is the opt-in
# script-aware variant: CJK codepoint runs → character bigrams, all other
# runs unchanged.  The harness corpus is pure ASCII, so the query appends
# a deterministic per-doc CJK snippet (fixed literals, doc_id-indexed) and
# the oracle REPLAYS the full pipeline in DuckDB — a computed oracle, not
# golden VALUES: RE2 lacks `(?U)\w`, but on lowercased ASCII+CJK data the
# explicit class [a-z0-9_ + CJK ranges] is exactly Unicode-\w's behavior.
_CJK_SNIPPETS = [
    "深度学习的模型",        # Han run
    "スパークは速い",        # katakana + hiragana run
    "빅데이터 처리 엔진",    # hangul with spaces
    "spark引擎很快",         # Latin run abutting a Han run
    "数据123处理",           # Han / digit / Han (digits are \w, not CJK)
]

# DuckDB RE2 spelling of functions.text.CJK_CLASS (same BMP ranges).
_CJK_RE2 = (r"\x{3040}-\x{30ff}\x{3400}-\x{4dbf}"
            r"\x{4e00}-\x{9fff}\x{ac00}-\x{d7af}")
_CJK_MAX_ID = 40


def q_tokenize_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize_cjk

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").cast("bigint") < _CJK_MAX_ID)
    snip = F.element_at(
        F.array(*[F.lit(s) for s in _CJK_SNIPPETS]),
        (F.col("doc_id").cast("bigint") % len(_CJK_SNIPPETS) + 1)
        .cast("int"))
    mixed = F.concat(F.col("text"), F.lit(" "), snip)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(tokenize_cjk(mixed)).alias("position", "term"))


_CJK_SNIPS_SQL = "[" + ", ".join(f"'{s}'" for s in _CJK_SNIPPETS) + "]"


def _cjk_docs_ctes(max_id: int | None) -> str:
    """CTE chain replaying the CJK-mixed corpus + tokenize_cjk pipeline,
    ending in ``cjk_docs (doc_id, toks)`` — shared by the tokenize row
    and the BM25-over-bigrams row."""
    where = (f"WHERE CAST(doc_id AS BIGINT) < {max_id}"
             if max_id is not None else "")
    return f"""mixed AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         lower(text) || ' ' ||
         {_CJK_SNIPS_SQL}[CAST(CAST(doc_id AS BIGINT)
                               % {len(_CJK_SNIPPETS)} + 1 AS INTEGER)] AS t
  FROM documents {where}),
isolated AS (
  SELECT doc_id,
         regexp_replace(
             regexp_replace(t, '[^a-z0-9_\\s{_CJK_RE2}]', ' ', 'g'),
             '([{_CJK_RE2}]+)', ' \\1 ', 'g') AS t
  FROM mixed),
pretoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS toks
  FROM isolated),
cjk_docs AS MATERIALIZED (
  SELECT doc_id,
         flatten(list_transform(toks, tok ->
           CASE WHEN regexp_matches(tok, '^[{_CJK_RE2}]{{2,}}$')
                THEN list_transform(range(1, length(tok)),
                                    i -> substr(tok, CAST(i AS INTEGER), 2))
                ELSE [tok] END)) AS toks
  FROM pretoks)"""


_TOKENIZE_CJK_SQL = f"""
WITH {_cjk_docs_ctes(_CJK_MAX_ID)}
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS position,
       unnest(toks) AS term
FROM cjk_docs
"""

# tokenize_cjk("深度学习 vector") — CJK run → overlapping bigrams, the
# ASCII term passes through; parity with the engine tokenizer is pinned
# by tests/test_properties.py.
_CJK_QUERY = "深度学习 vector"
_CJK_QUERY_TERMS = ("深度", "度学", "学习", "vector")


def q_bm25_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over a CJK-BIGRAM index (r17): the tokenize_cjk variant wired
    through the real indexing + scoring path — postings/df/doc-stats
    built from bigram tokens over the CJK-mixed corpus (every doc gets
    its deterministic CJK snippet), then the standard broadcast-terms
    BM25 plan scores a mixed CJK/ASCII query.  This is the north-star
    case the plain (?U)\\w tokenizer cannot serve: an unsegmented CJK
    query can only match an unsegmented CJK document through a shared
    sub-word unit, which the bigram index provides.  The oracle replays
    corpus construction, bigram tokenization, and the exact reference
    BM25 formula in SQL."""
    from ..functions.text import tokenize_cjk
    from ..operators.index import build_postings, doc_freq
    from ..operators.search import (B_DEFAULT, K1_DEFAULT,
                                    _bm25_scores_from_terms)

    docs = load_table(spark, sf_dir, "documents")
    snip = F.element_at(
        F.array(*[F.lit(s) for s in _CJK_SNIPPETS]),
        (F.col("doc_id").cast("bigint") % len(_CJK_SNIPPETS) + 1)
        .cast("int"))
    mixed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), snip).alias("text"))
    tokens = mixed.select(
        "doc_id",
        F.posexplode(tokenize_cjk("text")).alias("position", "term"))
    postings = build_postings(tokens)
    stats = mixed.select(
        "doc_id", F.size(tokenize_cjk("text")).alias("length"))
    terms_df = spark.createDataFrame(
        [(t,) for t in _CJK_QUERY_TERMS], "term string")
    scores = _bm25_scores_from_terms(terms_df, postings,
                                     doc_freq(postings), stats,
                                     K1_DEFAULT, B_DEFAULT)
    return (scores.withColumn("score", F.round("score", 6))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10))


_CJK_QTERMS_SQL = ", ".join(f"('{t}')" for t in _CJK_QUERY_TERMS)

_BM25_CJK_SQL = f"""
WITH {_cjk_docs_ctes(None)},
tokens AS (SELECT doc_id, unnest(toks) AS term FROM cjk_docs),
postings AS (
    SELECT term, doc_id, count(*) AS tf FROM tokens GROUP BY term, doc_id),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
stats AS (SELECT doc_id, len(toks) AS length FROM cjk_docs),
consts AS (SELECT count(*) AS n, avg(length) AS avgdl FROM stats),
qterms AS (SELECT term FROM (VALUES {_CJK_QTERMS_SQL}) AS q(term)),
scored AS (
    SELECT p.doc_id,
           sum( ln(greatest(1.0, c.n / greatest(1, d.df)))
                * (p.tf * 2.0)
                / (p.tf + 1.0 * (1.0 - 0.75 + 0.75 * s.length / c.avgdl)) )
               AS score
    FROM postings p
    JOIN qterms q USING (term)
    JOIN dfreq d USING (term)
    JOIN stats s USING (doc_id)
    CROSS JOIN consts c
    WHERE d.df > 0
    GROUP BY p.doc_id)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id ASC
LIMIT 10
"""


# --- PII redaction ---------------------------------------------------------
# Training-data scrubbing: emails / URLs / phone-ish numbers → typed tags.
# Patterns are restricted to syntax Java regex and RE2 share (no lookaround,
# no backrefs) so the DuckDB oracle runs the very same patterns; the golden
# corpus is inline because the harness documents are a clean 31-word
# vocabulary with no PII.
_PII_DOCS = [
    ("p1", "contact me at alice.smith+spam@example.co.uk or bob@test.io now"),
    ("p2", "visit https://example.com/a?b=c#frag or http://t.co/x for info"),
    ("p3", "call +1 415 555 2671 or 020-7946-0958 before friday"),
    ("p4", "no pii here, just plain words and numbers like 42"),
    ("p5", "mixed: eve@corp.example, https://corp.example/path, +44 7911 123456"),
]
_PII_RULES = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("https?://[^ ]+", "<URL>"),
    ("\\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
]


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.createDataFrame(_PII_DOCS, "doc_id string, text string")
    out = F.col("text")
    for pat, tag in _PII_RULES:
        out = F.regexp_replace(out, pat, tag)
    n_redactions = F.size(F.split(out, "<(EMAIL|URL|PHONE)>")) - 1
    return docs.select("doc_id", out.alias("redacted"),
                       n_redactions.alias("n_redactions"))


# --- repetition filter (Gopher-style quality signal) -----------------------

def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram ratio per document — the 'repetitive text' quality
    filter from LLM data pipelines (Rae et al. '21 §A1.3): share of token
    bigrams that are repeats of an earlier bigram.  Pure array expressions
    (no explode, no shuffle): this is a map-side per-row signal at 100 TB."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    # sequence(1, 0) would generate a DESCENDING sequence — guard short docs.
    bigrams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    n = F.size(bigrams)
    nd = F.size(F.array_distinct(bigrams))
    ratio = F.when(n > 0, F.round(1.0 - nd.cast("double") / n, 6)) \
        .otherwise(F.lit(0.0))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n.alias("n_bigrams"),
        ratio.alias("dup_bigram_ratio"),
        (ratio > 0.5).alias("is_repetitive"))


# --- domain mixture weights ------------------------------------------------

def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for training-mix construction: token
    share per source, smoothed by sqrt (alpha=0.5, the multilingual-mixing
    trick), renormalized.  Two tiny aggs over an all-rows window — the
    grouped relation is a handful of rows regardless of corpus size."""
    from pyspark.sql import Window

    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    per_src = (docs.select("source", F.size(tokenize("text")).alias("n_tok"))
               .groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum("n_tok").alias("n_tokens")))
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    smooth = F.sqrt(share)
    return per_src.select(
        "source", "n_docs", "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(smooth / F.sum(smooth).over(w), 6).alias("mix_weight"))


# --- deterministic training shards ----------------------------------------

N_SHARDS = 8


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets a
    stable (shard, position) from an md5-derived hash — reproducible
    across runs/engines, no RNG, no driver-side pass.  One shuffle on the
    shard key; positions via row_number within shard."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash64(F.col("doc_id").cast("string"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                        F.pmod(h, F.lit(N_SHARDS)).cast("int").alias("shard"),
                        h.alias("h"))
            .withColumn("position", F.row_number().over(w))
            .select("doc_id", "shard", "position"))


# --- benchmark-contamination detection -------------------------------------

CONTAM_N = 5        # shingle width
EVAL_MAX_ID = 20    # doc_id < 20 plays the held-out benchmark set


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination scan: for every training document, how many
    distinct 5-gram shingles it shares with the held-out set (doc_id <
    EVAL_MAX_ID) and how many eval docs it hits — the de-contamination
    report an LLM data pipeline runs before training.  Inverted-index
    shingle equi-join (train side × tiny eval side), never all-pairs."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    n = CONTAM_N
    shingles = F.when(F.size(toks) >= n, F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)])))
    ).otherwise(F.array().cast("array<string>"))
    sh = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                     F.explode(shingles).alias("shingle"))
    ev = (sh.filter(F.col("doc_id") < EVAL_MAX_ID)
          .select(F.col("doc_id").alias("eval_doc"), "shingle"))
    tr = sh.filter(F.col("doc_id") >= EVAL_MAX_ID)
    return (tr.join(F.broadcast(ev), "shingle")
            .groupBy(F.col("doc_id").cast("string").alias("doc_id"))
            .agg(F.countDistinct("shingle").alias("n_shared_shingles"),
                 F.countDistinct("eval_doc").alias("n_eval_docs_hit")))


def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod corpus split (90/10 train/eval): stable
    across runs, engines and corpus growth — the reproducible-split
    pattern every training pipeline needs (seeded RNG sampling is
    engine-specific and unreplayable).  Returns per-(source, split) doc
    and token counts for the split report."""
    from ..functions.hashing import md5_hash64
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    split = F.when(F.pmod(md5_hash64(F.col("doc_id").cast("string")),
                          F.lit(100)) < 90, "train").otherwise("eval")
    return (docs.select("source", split.alias("split"),
                        F.size(tokenize("text")).alias("n_tok"))
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens")))


def q_prepare_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end training-data prep: quality gate → exact-dedup
    survivors → GPT-style sequence packing of the surviving corpus — the
    whole pipeline a pretraining run needs, as ONE declared lineage (each
    stage is the already-verified operator: quality_features, dedup_exact,
    pack_sequences)."""
    from ..operators.dedup import dedup_exact, tokenset_key
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    passing = (quality_features(docs)
               .filter((F.col("n_tokens") >= 20)
                       & (F.col("stopword_ratio") <= 0.3))
               .select(F.col("doc_id").alias("doc_id_s")))
    filtered = (docs.withColumn("doc_id_s", F.col("doc_id").cast("string"))
                .join(passing, "doc_id_s")
                .select("doc_id", "text"))
    survivors = (dedup_exact(filtered, tokenset_key("text"))
                 .select(F.col("doc_id").alias("doc_id_s")))
    surviving = (filtered.withColumn("doc_id_s",
                                     F.col("doc_id").cast("string"))
                 .join(survivors, "doc_id_s")
                 .select("doc_id", "text"))
    return pack_sequences(surviving)


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score per document — the
    perplexity-filter signal of CCNet-style pipelines (Wenzek et al. '19),
    with the corpus itself as the LM: avg ln P(t2|t1) over the doc's
    bigrams, P = corpus bigram count / prefix count (MLE; every doc bigram
    has corpus count ≥ 1 by construction, so no smoothing is needed).

    Shape at scale: one explode + two count aggs + two equi-joins keyed by
    tokens — no windows over raw text, no all-pairs; count relations are
    vocabulary-sized, far smaller than the token stream."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    bigrams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("t1"),
                           F.element_at(toks, i + 1).alias("t2")))
    ).otherwise(F.array().cast("array<struct<t1:string,t2:string>>"))
    b = (docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                     F.explode(bigrams).alias("bg"))
         .select("doc_id", F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2")))
    c2 = b.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = b.groupBy("t1").agg(F.count(F.lit(1)).alias("n1"))
    scored = (b.join(c2, ["t1", "t2"]).join(c1, "t1")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                   F.round(F.avg(F.log(F.col("n2") / F.col("n1"))), 6)
                   .alias("avg_logprob")))
    all_docs = docs.select(F.col("doc_id").cast("string").alias("doc_id"))
    return (all_docs.join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob")))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-chunk sequence packing: each document's
    (seq_id, seq_offset, n_seq_spans) in the fixed-budget token stream,
    via the scale-safe global cumulative sum (operators/packing.py)."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs)


def q_scale_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Arrow path (applyInPandas) under a hard oracle row:
    per-source min-max scaling of document length.  The oracle uses the
    native agg+join form — which is also the recommended plan at scale
    (see functions/udfs.py docstring)."""
    from ..functions.udfs import minmax_scale_by_group

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       "source", F.col("n_chars").cast("int").alias("n_chars"))
    return minmax_scale_by_group(base, "source", "n_chars")


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy via the sanctioned Arrow
    ``pandas_udf`` path (functions/udfs.py) — the one place Python math is
    on a declared data path, so the U1 UDF surface itself gets a hard
    cross-engine correctness row (6-dp rounding absorbs summation-order
    differences)."""
    from ..functions.udfs import shannon_entropy

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       shannon_entropy("text").alias("entropy"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent items (heavy hitters) over the corpus token
    stream via ``approx_top_k`` (Spark 4 sketch aggregate) — the
    vocabulary-report operator that at 100 TB replaces an exact full
    group-by with a fixed-size mergeable sketch per partition (no shuffle
    of the long-tail terms at all).

    Hard oracle row is possible because the sketch is EXACT whenever the
    live item count fits the tracking budget (maxItemsTracked=65536 ≫ the
    harness vocabulary): the oracle is the exact per-term count.  At web
    scale the same plan degrades gracefully to approximate counts."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("term"))
    return (toks.select(F.expr("approx_top_k(term, 100, 65536)").alias("tk"))
            .select(F.explode("tk").alias("e"))
            .select(F.col("e.item").alias("term"),
                    F.col("e.count").cast("bigint").alias("n_occurrences")))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level benchmark decontamination: drop every training doc
    whose bag-of-words (token-set) key matches a held-out doc (doc_id <
    EVAL_MAX_ID), reported per source — the registry-vs-corpus anti-join
    every training pipeline runs (complementing ``text_contamination``,
    which scores partial shingle overlap).

    One pass over the training side: left join against the (distinct,
    tiny) eval-key side + conditional aggregation.  The eval side
    broadcasts here; at 100 TB with a large eval registry the same plan
    becomes a shuffle join where the session's runtime bloom filter
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`) prunes the
    training side before the exchange — the idiomatic-Spark form of
    "build a bloom filter of the eval set and filter the corpus"."""
    from ..operators.dedup import tokenset_key

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("source", tokenset_key("text").alias("__k"),
                        F.col("doc_id").cast("bigint").alias("__nid"))
    ev = (keyed.filter(F.col("__nid") < EVAL_MAX_ID)
          .select("__k").distinct().withColumn("__hit", F.lit(1)))
    tr = keyed.filter(F.col("__nid") >= EVAL_MAX_ID)
    return (tr.join(ev, "__k", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_train"),
                 F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_clean"),
                 F.sum(F.coalesce("__hit", F.lit(0)))
                 .cast("bigint").alias("n_dropped")))


# GPT-2-style pre-tokenizer, restricted to syntax Java regex and RE2 share
# (no lookaround): letter runs, digit runs, punctuation runs — each with an
# optional leading space, BPE's "space-prefixed word" convention.  On the
# ASCII harness corpus this is the exact piece count a byte-level BPE's
# pre-tokenization produces before merges.  Whitespace is the EXPLICIT
# class [ \t\n\f\r], never \s: Java's \s includes vertical tab (\x0B)
# while RE2's does not, so \s-based classes silently desync the two
# engines on any document containing \x0B (round-4 ADVICE); with the
# explicit class, \x0B lands in the punctuation branch in both.
_BPE_PRETOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\f\r]+|[ \t\n\f\r]+"


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways the brief names: whitespace tokens and
    BPE-ish pre-tokenizer pieces (`_BPE_PRETOKEN_RE`) — the
    cost-estimation operator every training pipeline runs before packing
    (piece counts size the token budget; ws counts size the vocabulary
    stats).  Pure native expressions: ``regexp_extract_all`` + ``size``,
    map-side only, no shuffle, no Python."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(_BPE_PRETOKEN_RE), F.lit(0))
    # Explicit class for the same Java-vs-RE2 \s divergence as above.
    nonspace = F.filter(pieces, lambda p: p.rlike(r"[^ \t\n\f\r]"))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(tokenize("text")).alias("n_ws_tokens"),
        F.size(nonspace).alias("n_bpe_pieces"))


def q_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-aware upsampling: expand each source by its integer epoch
    count (the mixture-execution step after mixture-weight planning —
    low-resource languages repeat, capped at 3 epochs here).  A generator
    expression (`explode(sequence(...))`), so the expansion is map-side
    and linear in OUTPUT size — no joins, no shuffle before the final
    count; each copy carries (doc_id, epoch) for downstream shuffling."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    # epochs = clamp(ceil(max_source_count / count), 1..3); the window runs
    # over the per-SOURCE relation (a handful of rows by definition — same
    # driver-sized-relation pattern as global_rank's offsets).
    plan = (per.withColumn("__mx",
                           F.max("n_docs").over(Window.partitionBy(F.lit(1))))
            .select("lang",
                    F.least(F.lit(3), F.greatest(F.lit(1), F.ceil(
                        F.col("__mx") / F.col("n_docs")))).cast("int")
                    .alias("epochs")))
    return (docs.join(F.broadcast(plan), "lang")
            .select("lang", F.col("doc_id").cast("string").alias("doc_id"),
                    F.explode(F.sequence(F.lit(1), F.col("epochs")))
                    .alias("epoch")))


PRIORITY_SAMPLE_K = 200


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus sampling via PRIORITY SAMPLING (Duffield, Lund &
    Thorup, JACM '07): each doc gets priority q = w / u with u a
    deterministic uniform from the arithmetic KMV hash (pure rational
    arithmetic — no transcendental functions, so the priorities are
    bit-identical in ANSI SQL and the top-k cutoff cannot diverge between
    engines).  Weight = chars + 1, i.e. sample roughly proportional to
    token budget — the 'fill a training-mix quota by content volume, not
    doc count' step.  The Horvitz-Thompson estimate max(w, tau), with tau
    the (k+1)-th priority, makes the sample reusable for unbiased
    subset-sum estimates over the full corpus.

    Scale shape: one projection pass + TakeOrderedAndProject(k+1) — no
    global sort, no shuffle beyond the top-k tree reduce; the windows run
    on the k+1 survivors only."""
    from pyspark.sql import Window

    from ..operators.sketches import KMV_P, kmv_hash

    docs = load_table(spark, sf_dir, "documents")
    k = PRIORITY_SAMPLE_K
    w_int = (F.length("text") + F.lit(1)).cast("bigint")
    u = (kmv_hash(F.col("doc_id").cast("bigint")) + F.lit(1)) \
        .cast("double") / F.lit(float(KMV_P + 1))
    scored = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                         w_int.alias("w"),
                         (w_int.cast("double") / u).alias("q"))
    top = (scored.orderBy(F.desc("q"), F.col("doc_id").cast("bigint"))
           .limit(k + 1))
    wr = Window.orderBy(F.desc("q"), F.col("doc_id").cast("bigint"))
    wall = Window.partitionBy(F.lit(1))
    ranked = (top.withColumn("rn", F.row_number().over(wr))
              .withColumn("tau",
                          F.max(F.when(F.col("rn") == k + 1, F.col("q")))
                          .over(wall)))
    w_d = F.col("w").cast("double")
    est = F.when(F.col("tau").isNull(), w_d) \
        .when(F.col("tau") > w_d, F.col("tau")).otherwise(w_d)
    return (ranked.filter(F.col("rn") <= k)
            .select("doc_id", "w", F.round(est, 4).alias("est_weight")))


_SHUFFLE_SALT = "shuffle-epoch-1"


def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-data shuffle: every doc gets a unique
    position in a pseudo-random total order (md5 of id + epoch salt) —
    the pre-training permutation step, reproducible across reruns and
    engines.  Uses :func:`operators.relational.global_rank` (range
    shuffle + broadcast offsets), NOT a PARTITION-BY-less window, so the
    permutation of a 100 TB corpus never funnels through one task; a new
    salt is a new epoch's shuffle."""
    from ..operators.relational import global_rank

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(_SHUFFLE_SALT))).alias("__k"))
    ranked = global_rank(keyed, [F.col("__k"), F.col("doc_id")],
                         rank_col="position")
    return ranked.select("doc_id", "position")


QUERIES = {
    "pipeline_priority_sample": q_priority_sample,
    "pipeline_upsample": q_upsample,
    "pipeline_global_shuffle": q_global_shuffle,
    "text_token_count_bpe": q_token_count_bpe,
    "text_bpe_encode": q_bpe_encode,
    "text_bpe_train": q_bpe_train,
    "text_bpe_train_encode": q_bpe_train_encode,
    "pipeline_sample_per_key": q_sample_per_key,
    "text_heavy_hitters": q_heavy_hitters,
    "text_heavy_hitters_exact": q_heavy_hitters_exact,
    "pipeline_decontaminate": q_decontaminate,
    "pipeline_prepare_training": q_prepare_training,
    "text_lm_score": q_lm_score,
    "pipeline_pack_sequences": q_pack_sequences,
    "text_scale_by_source": q_scale_by_source,
    "text_entropy": q_entropy,
    "pipeline_split_train_eval": q_split_train_eval,
    "text_contamination": q_contamination,
    "text_tokenize_unicode": q_tokenize_unicode,
    "text_tokenize_cjk": q_tokenize_cjk,
    "search_bm25_cjk": q_bm25_cjk,
    "text_redact_pii": q_redact_pii,
    "text_repetition": q_repetition,
    "pipeline_mixture_weights": q_mixture_weights,
    "pipeline_shard_assign": q_shard_assign,
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

_PII_VALUES = ", ".join(f"('{d}', '{t}')" for d, t in _PII_DOCS)
_PII_REDACTED_SQL = "text"
for _pat, _tag in _PII_RULES:
    _PII_REDACTED_SQL = (f"regexp_replace({_PII_REDACTED_SQL}, "
                         f"'{_pat}', '{_tag}', 'g')")

_MIX_DOCS_CTE = r"""
sdocs AS (
    SELECT source,
           list_filter(
               string_split_regex(
                   regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
               t -> t <> '') AS toks
    FROM documents)
"""

from ..operators.packing import SEQ_BUDGET as _SEQ_BUDGET  # noqa: E402

# Shared corpus-cleaning CTE chain (quality gate → tokenset-dedup
# survivors), used by pipeline_clean_corpus and pipeline_prepare_training.
_CLEAN_CTES = f"""{_TOKENS_CTE},
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
  FROM passing GROUP BY k)"""

ORACLES = {
    # Same LCG hash, same rational priority, same (k+1)-cutoff: pure
    # mul/div doubles, so the ordering — and therefore the SAMPLE — is
    # bit-identical across engines (constants = operators/sketches.py).
    "pipeline_priority_sample": f"""
WITH s AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(length(text) + 1 AS BIGINT) AS w,
         CAST(CAST(length(text) + 1 AS BIGINT) AS DOUBLE)
         / (CAST(((CAST(doc_id AS BIGINT) % 2147483647) * 1103515245
                  + 12345)
                 % 2147483647 + 1 AS DOUBLE) / 2147483648.0) AS q
  FROM documents
),
r AS (SELECT doc_id, w, q,
             row_number() OVER (ORDER BY q DESC, CAST(doc_id AS BIGINT))
                 AS rn
      FROM s),
t AS (SELECT max(CASE WHEN rn = {PRIORITY_SAMPLE_K + 1} THEN q END) AS tau
      FROM r WHERE rn <= {PRIORITY_SAMPLE_K + 1})
SELECT doc_id, w,
       round(CASE WHEN t.tau IS NULL THEN CAST(w AS DOUBLE)
                  WHEN t.tau > CAST(w AS DOUBLE) THEN t.tau
                  ELSE CAST(w AS DOUBLE) END, 4) AS est_weight
FROM r, t WHERE rn <= {PRIORITY_SAMPLE_K}
""",
    "pipeline_upsample": """
WITH per AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
plan AS (
  SELECT lang,
         CAST(least(3, greatest(1,
             ceil((max(n) OVER ()) * 1.0 / n))) AS INTEGER) AS epochs
  FROM per)
SELECT lang, doc_id, CAST(e AS INTEGER) AS epoch
FROM (
  SELECT d.lang, CAST(d.doc_id AS VARCHAR) AS doc_id,
         unnest(generate_series(1, p.epochs)) AS e
  FROM documents d JOIN plan p USING (lang))
""",
    # The naive total-order window IS the oracle (tiny at sf0.01); the
    # engine side uses the distributed two-shuffle global_rank.
    "pipeline_global_shuffle": f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SALT}'),
                    CAST(doc_id AS VARCHAR)) AS BIGINT) AS position
FROM documents
""",
    # Identical regexes run in both engines (RE2/Java-shared syntax).
    "text_token_count_bpe": r"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(list_filter(
           string_split_regex(
               regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
           t -> t <> '')) AS INTEGER) AS n_ws_tokens,
       CAST(len(list_filter(
           regexp_extract_all(
               text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\f\r]+|[ \t\n\f\r]+'),
           p -> regexp_matches(p, '[^ \t\n\f\r]'))) AS INTEGER)
           AS n_bpe_pieces
FROM documents
""",
    # approx_top_k is EXACT while live items <= maxItemsTracked (65536 >>
    # the corpus vocabulary), so the oracle is the exact per-term count.
    "text_heavy_hitters": f"""
WITH {_TOKENS_CTE}
SELECT term, count(*) AS n_occurrences
FROM tokens GROUP BY term
ORDER BY n_occurrences DESC LIMIT 100
""",
    # Exact-threshold twin: freq*(k+1) > n in pure integer arithmetic.
    # The Spark side computes this via MG candidates + verify; the oracle
    # is the definitionally-exact full group-by — a green row proves the
    # candidate pass lost no heavy hitter.
    "text_heavy_hitters_exact": f"""
WITH {_TOKENS_CTE},
tot AS (SELECT count(*) AS n FROM tokens)
SELECT term, count(*) AS freq
FROM tokens, tot
GROUP BY term, n
HAVING count(*) * {HEAVY_HITTER_K + 1} > n
""",
    # Same token-set key as dedup_tokenset's oracle; eval side distinct
    # before the LEFT JOIN so training rows never multiply.
    "pipeline_decontaminate": f"""
WITH {_TOKENS_CTE},
keyed AS (
  SELECT d.source, CAST(d.doc_id AS BIGINT) AS nid,
         md5(array_to_string(list_sort(list_distinct(t.toks)), ' ')) AS k
  FROM documents d
  JOIN docs t ON CAST(d.doc_id AS VARCHAR) = t.doc_id),
ev AS (SELECT DISTINCT k FROM keyed WHERE nid < {EVAL_MAX_ID}),
tr AS (SELECT * FROM keyed WHERE nid >= {EVAL_MAX_ID})
SELECT tr.source,
       count(*) AS n_train,
       CAST(sum(CASE WHEN ev.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean,
       CAST(sum(CASE WHEN ev.k IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_dropped
FROM tr LEFT JOIN ev ON tr.k = ev.k
GROUP BY tr.source
""",
    # Exclusive running sum over ascending doc_id (DuckDB SUM() OVER is
    # HUGEINT → cast BIGINT to match Spark), then integer div/mod by the
    # sequence budget.
    "pipeline_pack_sequences": f"""
WITH {_TOKENS_CTE},
t AS (SELECT CAST(doc_id AS BIGINT) AS did,
             CAST(len(toks) AS INTEGER) AS n_tok
      FROM docs),
c AS (SELECT did, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
                 ORDER BY did
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
      FROM t)
SELECT CAST(did AS VARCHAR) AS doc_id,
       n_tok AS n_tokens,
       cb // {_SEQ_BUDGET} AS seq_id,
       cb % {_SEQ_BUDGET} AS seq_offset,
       CAST(CASE WHEN n_tok = 0 THEN 0
            ELSE (cb + n_tok - 1) // {_SEQ_BUDGET} - cb // {_SEQ_BUDGET} + 1
            END AS BIGINT) AS n_seq_spans
FROM c
""",
    "text_lm_score": f"""
WITH {_TOKENS_CTE},
led AS (
  SELECT doc_id, term AS t1,
         lead(term) OVER (PARTITION BY doc_id ORDER BY position) AS t2
  FROM tokens),
b AS (SELECT doc_id, t1, t2 FROM led WHERE t2 IS NOT NULL),
c2 AS (SELECT t1, t2, count(*) AS n2 FROM b GROUP BY 1, 2),
c1 AS (SELECT t1, count(*) AS n1 FROM b GROUP BY 1),
s AS (
  SELECT b.doc_id, ln(CAST(n2 AS DOUBLE) / n1) AS lp
  FROM b JOIN c2 USING (t1, t2) JOIN c1 USING (t1)),
agg AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
         round(avg(lp), 6) AS avg_logprob
  FROM s GROUP BY doc_id)
SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
       coalesce(agg.avg_logprob, 0.0) AS avg_logprob
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
""",
    "text_scale_by_source": """
WITH b AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         CAST(n_chars AS INTEGER) AS n_chars,
         min(n_chars) OVER (PARTITION BY source) AS mn,
         max(n_chars) OVER (PARTITION BY source) AS mx
  FROM documents)
SELECT doc_id, source, n_chars,
       CASE WHEN mx = mn THEN 0.0
            ELSE round((n_chars - mn) / CAST(mx - mn AS DOUBLE), 6)
       END AS scaled
FROM b
""",
    # Golden oracle: rows precomputed with the reference's Python tokenizer
    # (DuckDB's RE2 `\w` is ASCII-only and cannot express `(?U)` itself).
    "text_tokenize_unicode": f"""
SELECT doc_id, position, term
FROM (VALUES {_UNI_EXPECTED}) AS t(doc_id, position, term)
""",
    "text_tokenize_cjk": _TOKENIZE_CJK_SQL,
    "search_bm25_cjk": _BM25_CJK_SQL,
    "text_entropy": """
WITH ch AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, length(text) AS n,
         unnest(string_split(text, '')) AS c
  FROM documents),
cc AS (SELECT doc_id, n, c, count(*) AS k FROM ch GROUP BY doc_id, n, c),
e AS (
  SELECT doc_id,
         round(-sum((k / CAST(n AS DOUBLE)) * log2(k / CAST(n AS DOUBLE))), 6)
             AS entropy
  FROM cc GROUP BY doc_id)
SELECT d.doc_id, coalesce(e.entropy, 0.0) AS entropy
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d
LEFT JOIN e USING (doc_id)
""",
    "pipeline_split_train_eval": f"""
WITH {_MIX_DOCS_CTE.replace("SELECT source,", "SELECT source, doc_id,")},
s AS (
  SELECT source,
         CASE WHEN {md5_hash64_sql('doc_id')} % 100 < 90
              THEN 'train' ELSE 'eval' END AS split,
         len(toks) AS n_tok
  FROM sdocs)
SELECT source, split, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM s GROUP BY source, split
""",
    "text_contamination": f"""
WITH {_TOKENS_CTE},
led AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
         {", ".join(f"lead(term, {j}) OVER (PARTITION BY doc_id ORDER BY position) AS t{j}"
                    for j in range(1, CONTAM_N))}
  FROM tokens),
sh AS (
  SELECT DISTINCT doc_id,
         term || ' ' || {" || ' ' || ".join(f"t{j}" for j in range(1, CONTAM_N))} AS shingle
  FROM led WHERE t{CONTAM_N - 1} IS NOT NULL),
ev AS (SELECT doc_id AS eval_doc, shingle FROM sh WHERE doc_id < {EVAL_MAX_ID}),
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {EVAL_MAX_ID})
SELECT CAST(tr.doc_id AS VARCHAR) AS doc_id,
       count(DISTINCT tr.shingle) AS n_shared_shingles,
       count(DISTINCT ev.eval_doc) AS n_eval_docs_hit
FROM tr JOIN ev USING (shingle)
GROUP BY tr.doc_id
""",
    # Same patterns, same engine-shared regex subset, same inline corpus.
    "text_redact_pii": f"""
WITH src AS (SELECT * FROM (VALUES {_PII_VALUES}) AS t(doc_id, text))
SELECT doc_id, {_PII_REDACTED_SQL} AS redacted,
       CAST(len(string_split_regex({_PII_REDACTED_SQL},
                                   '<(EMAIL|URL|PHONE)>')) - 1 AS INTEGER)
           AS n_redactions
FROM src
""",
    "text_repetition": f"""
WITH {_TOKENS_CTE},
b AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bg
  FROM docs)
SELECT doc_id, CAST(len(bg) AS INTEGER) AS n_bigrams,
       round(CASE WHEN len(bg) > 0
             THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             ELSE 0.0 END, 6) AS dup_bigram_ratio,
       round(CASE WHEN len(bg) > 0
             THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             ELSE 0.0 END, 6) > 0.5 AS is_repetitive
FROM b
""",
    "pipeline_mixture_weights": f"""
WITH {_MIX_DOCS_CTE},
per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS n_tokens
  FROM sdocs GROUP BY source),
t AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share,
         sqrt(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()) AS smooth
  FROM per)
SELECT source, n_docs, n_tokens,
       round(share, 6) AS token_share,
       round(smooth / sum(smooth) OVER (), 6) AS mix_weight
FROM t
""",
    "pipeline_shard_assign": f"""
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {md5_hash64_sql('doc_id')} AS h
  FROM documents)
SELECT doc_id, CAST(h % {N_SHARDS} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS INTEGER) AS position
FROM h
""",
    "pipeline_clean_corpus": f"""
WITH {_CLEAN_CTES}
SELECT s.doc_id, s.n_copies, p.n_tokens, p.stopword_ratio
FROM survivors s JOIN passing p USING (doc_id)
""",
    # clean → pack: survivors (ascending numeric id) laid out in the
    # packed token stream; window SUM is HUGEINT → cast BIGINT.
    "pipeline_prepare_training": f"""
WITH {_CLEAN_CTES},
t AS (
  SELECT CAST(s.doc_id AS BIGINT) AS did, p.n_tokens AS n_tok
  FROM survivors s JOIN passing p USING (doc_id)),
c AS (
  SELECT did, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
             ORDER BY did
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cb
  FROM t)
SELECT CAST(did AS VARCHAR) AS doc_id,
       n_tok AS n_tokens,
       cb // {_SEQ_BUDGET} AS seq_id,
       cb % {_SEQ_BUDGET} AS seq_offset,
       CAST(CASE WHEN n_tok = 0 THEN 0
            ELSE (cb + n_tok - 1) // {_SEQ_BUDGET} - cb // {_SEQ_BUDGET} + 1
            END AS BIGINT) AS n_seq_spans
FROM c
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


def _bpe_encode_oracle() -> str:
    """DuckDB twin of operators.textstats.bpe_encode: the same merge fold
    per distinct word, built by nesting one list_reduce per BPE_MERGES
    rule (rank order).  Elements are wrapped as single-item lists so the
    reduce accumulator can be a list; a[len(a)] is the 1-based last
    element and a[1:len(a)-1] drops it."""
    from ..operators.textstats import BPE_MERGES

    expr = "string_split(word, '')"
    for x, y in BPE_MERGES:
        expr = (
            "list_reduce(list_transform(" + expr + ", t -> [t]), "
            "(a, b) -> CASE WHEN len(a) > 0 AND a[len(a)] = '" + x + "' "
            "AND b[1] = '" + y + "' THEN list_append(a[1:len(a)-1], '"
            + x + y + "') ELSE list_concat(a, b) END)")
    return r"""
WITH dt AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(
             string_split_regex(
                 regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
             t -> t <> '') AS toks
  FROM documents),
words AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
  FROM dt),
w2 AS (SELECT doc_id, pos, toks[pos] AS word FROM words),
vocab AS (SELECT DISTINCT word FROM w2),
encoded AS (SELECT word, """ + expr + r""" AS pieces FROM vocab)
SELECT w.doc_id,
       CAST(sum(len(e.pieces)) AS BIGINT) AS n_pieces,
       string_agg(array_to_string(e.pieces, ' '), ' ' ORDER BY w.pos)
           AS pieces
FROM w2 w JOIN encoded e USING (word)
GROUP BY w.doc_id
"""


ORACLES["text_bpe_encode"] = _bpe_encode_oracle()


def _bpe_train_ctes(n: int) -> list[str]:
    """The UNROLLED training chain shared by the train and train+encode
    oracles: round k's CTEs are p{k} (adjacent-pair counts incl.
    overlaps), m{k} (argmax merge, (cnt DESC, x, y) tie-break), t{k}
    (vocabulary re-folded through m{k} via a CORRELATED list_reduce —
    the merge pair comes from the cross-joined 1-row m{k}, not a
    literal).  Every CTE is MATERIALIZED: t{k} is referenced by both
    p{k+1} and t{k+1}, and DuckDB otherwise inlines multiply-referenced
    CTEs (the same degeneration the dedup/graph oracles hit)."""
    ctes = [r"""dt AS MATERIALIZED (
  SELECT list_filter(
             string_split_regex(
                 regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
             t -> t <> '') AS toks
  FROM documents)""",
            """t0 AS MATERIALIZED (
  SELECT word, count(*) AS freq, string_split(word, '') AS toks
  FROM (SELECT unnest(toks) AS word FROM dt) GROUP BY word)"""]
    for k in range(1, n + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT toks[i] AS x, toks[i+1] AS y, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, toks, unnest(range(1, len(toks))) AS i FROM t{k-1})
  GROUP BY 1, 2)""")
        ctes.append(f"""m{k} AS MATERIALIZED (
  SELECT x, y, cnt FROM p{k} ORDER BY cnt DESC, x, y LIMIT 1)""")
        if k < n:
            ctes.append(f"""t{k} AS MATERIALIZED (
  SELECT word, freq,
         list_reduce(list_transform(t.toks, s -> [s]),
             (a, b) -> CASE WHEN len(a) > 0 AND a[len(a)] = m.x
                            AND b[1] = m.y
                       THEN list_append(a[1:len(a)-1], m.x || m.y)
                       ELSE list_concat(a, b) END) AS toks
  FROM t{k-1} t, m{k} m)""")
    return ctes


def _bpe_train_oracle(n: int) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT {k - 1} AS merge_rank, x AS lhs, y AS rhs, "
        f"x || y AS merged, cnt AS pair_count FROM m{k}"
        for k in range(1, n + 1))
    return "WITH " + ",\n".join(_bpe_train_ctes(n)) + "\n" + sel


def _bpe_train_encode_oracle(n: int) -> str:
    """Train-then-tokenize twin: the encode fold of _bpe_encode_oracle,
    but each of the n nested list_reduce rules takes its merge pair from
    the CORRELATED m{k} rows of the training chain (all n one-row m{k}
    CTEs cross-joined into the vocabulary encode) instead of literals —
    so a green row certifies that encoding with the LEARNED table
    matches Spark's bpe_learn_merges → bpe_encode composition.

    Each m{k} is wrapped in a guarded twin g{k} that emits an identity
    sentinel ('','') when the round produced no merge (corpus exhausted
    before n rounds): tokens are never empty strings, so the sentinel
    rule can never fire, matching Spark's early ``break`` in
    bpe_learn_merges.  Without the guard an empty m{k} would annihilate
    the whole cross-joined encode (zero rows) while Spark still encodes
    every doc with the shorter learned table."""
    expr = "string_split(word, '')"
    for k in range(1, n + 1):
        expr = (
            "list_reduce(list_transform(" + expr + ", s -> [s]), "
            f"(a, b) -> CASE WHEN len(a) > 0 AND a[len(a)] = g{k}.x "
            f"AND b[1] = g{k}.y THEN list_append(a[1:len(a)-1], "
            f"g{k}.x || g{k}.y) ELSE list_concat(a, b) END)")
    froms = ", ".join(f"g{k}" for k in range(1, n + 1))
    guards = [
        f"g{k} AS MATERIALIZED (\n"
        f"  SELECT x, y FROM m{k}\n"
        f"  UNION ALL\n"
        f"  SELECT '', '' WHERE (SELECT count(*) FROM m{k}) = 0)"
        for k in range(1, n + 1)]
    ctes = _bpe_train_ctes(n) + guards + [r"""dq AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(
             string_split_regex(
                 regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
             t -> t <> '') AS toks
  FROM documents)""", """wq AS MATERIALIZED (
  SELECT doc_id, pos, toks[pos] AS word FROM (
    SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
    FROM dq))""",
        "vq AS MATERIALIZED (SELECT DISTINCT word FROM wq)",
        f"eq AS MATERIALIZED (SELECT word, {expr} AS pieces "
        f"FROM vq, {froms})"]
    return ("WITH " + ",\n".join(ctes) + """
SELECT w.doc_id,
       CAST(sum(len(e.pieces)) AS BIGINT) AS n_pieces,
       string_agg(array_to_string(e.pieces, ' '), ' ' ORDER BY w.pos)
           AS pieces
FROM wq w JOIN eq e USING (word)
GROUP BY w.doc_id
""")


ORACLES["text_bpe_train"] = _bpe_train_oracle(BPE_TRAIN_MERGES)
ORACLES["text_bpe_train_encode"] = _bpe_train_encode_oracle(BPE_TRAIN_MERGES)

ORACLES["pipeline_sample_per_key"] = f"""
SELECT source, doc_id, sample_rank FROM (
  SELECT source, CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_PER_KEY_SALT}'),
                      CAST(doc_id AS VARCHAR)) AS INTEGER) AS sample_rank
  FROM documents)
WHERE sample_rank <= {SAMPLE_PER_KEY_K}
"""
