"""Sequence packing for LLM training-data pipelines (extension — not in
reference; part of the north-star training-pipeline surface).

The standard pretraining layout concatenates every document's tokens in a
deterministic corpus order and chunks the stream into fixed-size training
sequences (GPT-style "concatenate and chunk"); a document therefore starts
at a global token offset and may straddle sequence boundaries.  Computing
that layout is a weighted global cumulative sum — the classic
single-partition-window trap at scale — so this operator rides
:func:`..operators.relational.global_cumsum` (range partition → local
running sum → broadcast per-partition offsets): one range shuffle plus one
tiny broadcast, bounded per-task work at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import global_cumsum
from .textstats import token_count

SEQ_BUDGET = 512  # tokens per packed training sequence


def pack_sequences(docs: DataFrame, budget: int = SEQ_BUDGET,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns one row per document: ``(doc_id, n_tokens, seq_id, seq_offset,
    n_seq_spans)`` where ``seq_id``/``seq_offset`` locate the document's
    first token in the chunked stream (sequence index / offset within the
    sequence) and ``n_seq_spans`` counts how many training sequences the
    document touches (0 for empty documents).  Order = ascending numeric
    ``doc_id``; token count = whitespace tokenizer (the same tokenizer the
    rest of the text family uses, so counts agree with the oracles).
    """
    t = docs.select(F.col(id_col).cast("bigint").alias("__did"),
                    token_count(text_col).alias("n_tokens"))
    c = global_cumsum(t, [F.col("__did")], "n_tokens", cum_col="__cum")
    cum_before = F.col("__cum") - F.col("n_tokens")
    n_tok = F.col("n_tokens")
    first_seq = F.floor(cum_before / budget).cast("bigint")
    last_seq = F.floor((cum_before + n_tok - 1) / budget).cast("bigint")
    return c.select(
        F.col("__did").cast("string").alias("doc_id"),
        n_tok.alias("n_tokens"),
        first_seq.alias("seq_id"),
        F.pmod(cum_before, F.lit(budget)).cast("bigint").alias("seq_offset"),
        F.when(n_tok == 0, F.lit(0))
         .otherwise(last_seq - first_seq + 1)
         .cast("bigint").alias("n_seq_spans"))
