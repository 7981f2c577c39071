"""Text-analysis operators for LLM-data pipelines.

All pure column expressions (JVM-side, codegen'd) — tokenization,
quality features, fingerprinting, and a trained unigram language-ID
model built entirely from DataFrame aggregations (two shuffles:
train + score). No Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny function-word list used for quality scoring (ratio of
#: high-frequency glue words — a standard fluency heuristic).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization as a column expression.

    `split(trim(x), '\\s+')` — identical semantics to the DuckDB
    oracle's regexp_split_to_array(trim(x), '\\s+').
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. The scalable stand-in for
    a rolling hash — one pass, no shuffle, join-able for exact dedup.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token count, char count, mean
    token length, stopword ratio, punctuation count.

    Scale: narrow map-only projection — no shuffle; safe at any SF.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    return df.select(
        "*",
        n_tok.alias("token_ct"),
        F.length(F.col(text_col)).alias("char_ct"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.greatest(n_tok, F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
            / F.greatest(n_tok, F.lit(1)),
            4,
        ).alias("stopword_ratio"),
        F.regexp_count(F.col(text_col), F.lit(r"[.,;:!?]")).alias("punct_ct"),
    )


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Trained unigram language-ID: additive-smoothed Naive Bayes over
    whitespace tokens, trained on the labeled docs themselves and
    applied back to every doc.

    Plan (all built-in aggs — two shuffle rounds, no UDFs):
      1. explode tokens                       (map-only)
      2. per-(lang, token) counts + per-lang totals + vocab size
      3. score docs: tokens × langs, left-join counts,
         sum(ln((cnt+1)/(tot+V))) per (doc, lang)
      4. argmax lang per doc (row_number window, lang-name tiebreak)

    Scale: the model (lang×token counts) is dimension-table sized —
    Catalyst broadcasts it under AQE; the doc-side explode dominates
    and is embarrassingly parallel.
    """
    toks = docs.select(
        F.col(id_col), F.col(label_col), F.explode(tokens(text_col)).alias("tok")
    )
    # lang_tot and vocab derive FROM lang_tok (not from toks): all three
    # then share one identical explode+shuffle subtree, which Spark's
    # exchange reuse executes once (ReusedExchange) — deriving them from
    # toks directly would re-explode the corpus twice more.
    lang_tok = toks.groupBy(label_col, "tok").agg(F.count("*").alias("cnt"))
    lang_tot = lang_tok.groupBy(label_col).agg(F.sum("cnt").alias("tot"))
    vocab = lang_tok.select(F.countDistinct("tok").alias("v"))
    model = (
        lang_tok.join(lang_tot, label_col)
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(label_col).alias("m_lang"),
            "tok",
            F.log((F.col("cnt") + 1) / (F.col("tot") + F.col("v"))).alias("logp"),
        )
    )
    # Unseen-token fallback per lang: ln(1/(tot+V)).
    fallback = (
        lang_tot.crossJoin(F.broadcast(vocab))
        .select(
            F.col(label_col).alias("m_lang"),
            F.log(1.0 / (F.col("tot") + F.col("v"))).alias("logp0"),
        )
    )
    scored = (
        toks.select(id_col, "tok")
        .join(F.broadcast(fallback.select("m_lang")), how="cross")
        .join(F.broadcast(model), ["m_lang", "tok"], "left")
        .join(F.broadcast(fallback), "m_lang")
        .select(
            id_col,
            "m_lang",
            F.coalesce(F.col("logp"), F.col("logp0")).alias("tok_logp"),
        )
        .groupBy(id_col, "m_lang")
        .agg(F.sum("tok_logp").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("m_lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("m_lang").alias("predicted_lang"),
            F.round("score", 4).alias("score"),
        )
    )
