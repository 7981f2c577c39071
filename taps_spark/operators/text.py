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
    # Project the token array once: the three consumers below would
    # otherwise each re-run the regex split per row.
    toked = df.withColumn("_qf_toks", tokens(text_col))
    toks = F.col("_qf_toks")
    n_tok = F.size(toks)
    return toked.select(
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
    ).drop("_qf_toks")


def chunk_token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    context-window chunking step every pretraining / RAG-indexing
    pipeline runs before tokenizer packing or embedding.

    Output: one row per chunk with (id, chunk_id, start_tok,
    chunk_len, chunk_md5, chunk_text). Window starts walk 1, 1+stride,
    1+2·stride, … while ≤ token count, so consecutive chunks share
    window−stride tokens of overlap and the tail is kept (truncated,
    never padded).

    Scale: pure column expressions — tokenize, `sequence` of starts,
    `posexplode`, `slice` — all map-only inside one codegen stage; no
    shuffle, no UDF, no state. Output rows ≈ tokens/stride per doc, a
    constant-factor expansion that streams through the scan. Chunk
    identity is (id, chunk_id): deterministic on any cluster, so
    downstream dedup/embedding joins on it are stable across re-runs.
    """
    if stride < 1 or window < stride:
        raise ValueError("need window >= stride >= 1 (forward progress, full coverage)")
    toks_ = tokens(text_col)
    starts = F.sequence(F.lit(1), F.size(toks_), F.lit(stride))
    e = df.select(
        F.col(id_col),
        toks_.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start_tok"), window)
    text_out = F.array_join(chunk, " ")
    return e.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(chunk).alias("chunk_len"),
        F.md5(text_out).alias("chunk_md5"),
        text_out.alias("chunk_text"),
    )


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word n-grams over whitespace tokens.

    Guarded: Spark's `sequence(1, stop)` runs DESCENDING when
    stop < 1 (doc shorter than n tokens), so the transform is wrapped
    in a `when` that returns an empty array instead — matching the
    oracle's empty generate_series.

    Scale: map-only expression, no shuffle; output size is
    len(tokens) per row, same order as the text itself.
    """
    toks_ = tokens(col)
    n_grams = F.greatest(F.size(toks_) - (n - 1), F.lit(0))
    return F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.array_join(F.slice(toks_, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_word_ngrams(
    df: DataFrame, text_col: str, n: int, out_col: str = "grams"
) -> DataFrame:
    """Fast word n-grams as a new array column via ml.feature.NGram —
    compiled JVM transform, map-only, ~8× faster than the equivalent
    transform/slice higher-order-function expression (HOFs are
    interpreted per element). Same output: space-joined n-grams,
    empty array for docs shorter than n tokens. Prefer this on any
    hot path; `word_ngrams` remains for Column-expression composition.
    """
    from pyspark.ml.feature import NGram

    tokenized = df.withColumn("_wng_toks", tokens(text_col))
    out = NGram(n=n, inputCol="_wng_toks", outputCol=out_col).transform(tokenized)
    return out.drop("_wng_toks")


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals: type-token ratio (distinct
    tokens / tokens) and top-token ratio (mode frequency / tokens) —
    the cheap boilerplate/degenerate-text filters for pretraining
    corpora.

    Scale: computed entirely as array expressions — map-only, zero
    shuffle, unlike the explode + groupBy(doc, token) formulation
    whose token-level shuffle dwarfs the input at corpus scale. The
    mode count is O(distinct × tokens) per row JVM-side, which wins
    for natural documents (bounded distinct vocab); for degenerate
    multi-megabyte single-doc inputs, chunk the doc upstream.
    """
    # The token array must cross a projection boundary BEFORE being
    # captured in the transform lambda below: an inline split
    # expression captured in a lambda BODY re-runs the regex per outer
    # element (per distinct token here) — the same 10× trap measured
    # on the bigram query (see text_ngram_top).
    toked = df.withColumn("_rf_toks", tokens(text_col))
    toks_ = F.col("_rf_toks")
    uniq = F.array_distinct(toks_)
    n_tok = F.greatest(F.size(toks_), F.lit(1))
    top_ct = F.array_max(
        F.transform(uniq, lambda t: F.size(F.filter(toks_, lambda x: x == t)))
    )
    return toked.select(
        "*",
        F.size(toks_).alias("token_ct"),
        F.round(F.size(uniq) / n_tok, 4).alias("distinct_ratio"),
        F.round(top_ct / n_tok, 4).alias("top_token_ratio"),
    ).drop("_rf_toks")


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
    # Argmax per doc as a min-struct aggregation ((-score, lang) sorts
    # best-first with the lang-name tiebreak) instead of a row_number
    # window: a hash agg with map-side partials, no per-doc sort — at
    # scale that's one cheap shuffle instead of shuffle + sort.
    return (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("m_lang").alias("l"),
                    F.col("score").alias("s"),
                )
            ).alias("_b")
        )
        .select(
            F.col(id_col),
            F.col("_b.l").alias("predicted_lang"),
            F.round(F.col("_b.s"), 4).alias("score"),
        )
    )


def compression_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document zlib compression ratio (level 6) in exact integer
    ten-thousandths — the classic cheap quality/repetition proxy for
    pretraining corpora: boilerplate and template text compresses far
    below ~0.5, high-entropy natural prose sits near 0.6–0.9, and
    already-compressed/binary junk exceeds 1.0.

    Arrow-batched mapInPandas (zlib is C-speed; the Python stage is
    I/O-shaped, not compute-bound) — map-only, no shuffle; at scale
    the only knob is Arrow batch size vs document length. zlib output
    for a fixed level is deterministic for a given zlib version, so
    results are stable within an environment but are NOT an ANSI-SQL-
    expressible function — the registry entry is rows-only with
    property pins (tests/test_round9_invariants.py).

    Empty/null-text documents are EXCLUDED from the output (a ratio is
    undefined at n_bytes=0), so downstream n_docs counts are over
    non-empty documents, not the full documents table.
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pdm
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("ratio_tt", T.LongType(), False),
        ]
    )

    def batches(it: Iterator["pdm.DataFrame"]) -> Iterator["pdm.DataFrame"]:
        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            out = pdm.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "ratio_tt": (
                        (comp * 10000 + n // 2) // n.where(n > 0, 1)
                    ).astype("int64"),
                }
            )
            yield out[n > 0]

    return docs.select(id_col, text_col).mapInPandas(batches, schema)
