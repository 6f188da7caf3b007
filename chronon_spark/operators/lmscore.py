"""Unigram language-model scoring — corpus-probability quality signal.

The CCNet/KenLM-style filter ranks documents by how probable their
tokens are under a language model; with no external model in the
container, the corpus's OWN unigram distribution (optionally computed
on a reference slice) serves: ``logp(t) = ln((tf_t + 1) / (T + V))``
(add-one smoothing, unseen tokens get ``ln(1 / (T + V))``). Gibberish
and OOV-heavy documents score far below fluent ones. The reference
engine has no LM operator — beyond-reference training-data surface.

100 TB shape: the vocabulary (post-``min_df``) broadcasts onto the
exploded token stream — document text never rides a shuffle; the only
exchange is the per-doc mean over narrow (doc_id, logp) rows with
map-side partial aggregation. Scoring against a FIXED reference vocab
(pass ``reference``) keeps scores comparable across corpus snapshots.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.operators.textstats import tokens_sql
from chronon_spark.operators.vocab import token_doc_freq

# vocab rows above which the explicit broadcast hint is withheld: ~60-100
# bytes per framed row puts 2M rows at the low hundreds of MB — the edge
# of comfortable executor broadcast; past it the probe side joins
# sort-merge (correct, spills gracefully) instead of OOMing every
# executor on a crawl-scale token set. The count comes FREE from the
# smoothing-denominator aggregate, so the guard costs zero extra jobs.
VOCAB_BROADCAST_MAX_ROWS = 2_000_000


def unigram_logprobs(
    reference: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
) -> tuple[DataFrame, float, float, int]:
    """(vocab with ``logp``, default logp for unseen tokens,
    ln-denominator, vocab row count). Probabilities are add-one-smoothed
    over the reference's token stream; V counts the post-min_df
    vocabulary — returned so callers can size-guard broadcasting the
    vocab (the aggregate computes it anyway)."""
    vocab = token_doc_freq(reference, text_col=text_col, min_df=min_df)
    totals = vocab.agg(
        F.sum("term_freq").alias("t"), F.count("*").alias("v")
    ).first()
    denom = float(totals["t"] + totals["v"])
    out = vocab.select(
        "token",
        (F.log((F.col("term_freq") + F.lit(1.0)) / F.lit(denom))).alias("logp"),
    )
    return out, math.log(1.0 / denom), denom, int(totals["v"])


def lm_score(
    docs: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per doc: token count, mean token log-probability, and perplexity
    (``exp(-mean_logp)``) under the reference unigram model (default:
    the corpus itself). Zero-token docs score null."""
    vocab, unseen_logp, _, v_rows = unigram_logprobs(
        reference if reference is not None else docs, text_col, min_df
    )
    toks = docs.select(
        F.col(id_col), F.explode(F.expr(tokens_sql(text_col))).alias("token")
    )
    # size-guarded hint: V is known exactly (free, from the denominator
    # aggregate). Small vocab → broadcast hint, so the exploded token
    # stream never shuffles at all; crawl-scale vocab → unhinted join
    # (sort-merge; a hint is never demoted and would OOM every executor).
    vocab_side = F.broadcast(vocab) if v_rows <= VOCAB_BROADCAST_MAX_ROWS else vocab
    scored = toks.join(vocab_side, "token", "left").select(
        id_col,
        F.coalesce("logp", F.lit(float(unseen_logp))).alias("logp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("logp").alias("mean_logp"),
    )
    base = docs.select(id_col)
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.round("mean_logp", 6).alias("mean_logp"),
        F.round(F.exp(-F.col("mean_logp")), 6).alias("ppl"),
    )
