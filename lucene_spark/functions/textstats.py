"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting. All JVM-side column
expressions (whole-stage codegen) with exact DuckDB-oracle counterparts."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis import TOKEN_RE

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}
FP_MOD = 1 << 40  # keeps (h*31 + x) < 2^46, far from int64 overflow

# BPE-ish pre-tokenizer: the GPT-2 pre-merge split pattern, restricted to a
# lookahead-free ASCII form so the SAME regex runs under Java (Spark) and
# RE2 (DuckDB): contraction suffixes, space-prefixed letter/digit runs,
# space-prefixed punctuation runs, whitespace runs. Counting these matches
# approximates the pre-merge BPE piece count.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def _toks(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, analyzer tokens, BPE-ish pieces, distinct terms."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
        .cast("long")
        .alias("ws_tokens"),
        F.size(_toks(text_col)).cast("long").alias("re_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.size(F.array_distinct(_toks(text_col))).cast("long").alias("uniq_terms"),
    ).orderBy("doc_id")


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality score from alpha ratio, stopword ratio, length."""
    toks = _toks(text_col)
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    n_alpha = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[A-Za-z]"), 0)
    ).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    quality = (
        F.lit(0.5) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    ).orderBy("doc_id")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language heuristic; ties resolve in the fixed order
    en > es > de > fr (deterministic)."""
    toks = _toks(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("es", "de", "fr"):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    sel = [F.col(id_col).cast("long").alias("doc_id")]
    sel += [scores[lg].alias(f"score_{lg}") for lg in LANG_MARKERS]
    sel += [best.alias("lang_guess")]
    return df.select(*sel).orderBy("doc_id")


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint of the token stream:
    h = fold(h*31 + md5_32(token)) mod 2^40 — identical arithmetic is
    expressible in DuckDB (list_reduce)."""
    toks = _toks(text_col)
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % FP_MOD,
    )
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FP_MOD,
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), fp.alias("fingerprint")
    ).orderBy("doc_id")


def lm_quality(
    docs: "DataFrame",
    model: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Language-model quality scoring (the CCNet-style 'perplexity
    filter' of a training-data pipeline) over the FreeTextSuggester
    bigram model (functions/suggest.build_free_text, grams=2): per doc,
    the mean log2 stupid-backoff probability of its bigrams —
    P(w2|w1) = cnt(w1␟w2)/cnt(w1) when the bigram is known, else
    ALPHA * cnt(w2)/total (ALPHA = 0.4), else ALPHA/total for unseen
    words — and perplexity = 2^(-mean). Lower perplexity = more
    corpus-natural text; filter on a threshold.

    Shape: explode doc bigrams once, three broadcast-or-shuffle
    equi-joins against the model (bigram, w1, w2), one aggregation. No
    Python in the hot path. → (doc_id, n_bigrams, avg_logprob,
    perplexity)"""
    from .suggest import FREE_TEXT_ALPHA, FREE_TEXT_SEP

    uni = model.filter(~F.col("gram").contains(FREE_TEXT_SEP))
    total = uni.agg(F.sum("cnt")).collect()[0][0] or 1
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    bi = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("__t"), i).alias("w1"),
                        F.element_at(F.col("__t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    big = model.filter(F.col("gram").contains(FREE_TEXT_SEP)).select(
        F.split(F.col("gram"), FREE_TEXT_SEP)[0].alias("w1"),
        F.split(F.col("gram"), FREE_TEXT_SEP)[1].alias("w2"),
        F.col("cnt").alias("c12"),
    )
    u1 = uni.select(F.col("gram").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("gram").alias("w2"), F.col("cnt").alias("c2"))
    alpha = float(FREE_TEXT_ALPHA)
    joined = (
        bi.join(big, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
    )
    prob = (
        F.when(
            F.col("c12").isNotNull() & F.col("c1").isNotNull(),
            F.col("c12").cast("double") / F.col("c1").cast("double"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(alpha) * F.col("c2").cast("double") / F.lit(float(total)),
        )
        .otherwise(F.lit(alpha) / F.lit(float(total)))
    )
    return (
        joined.select("doc_id", (F.log2(prob)).alias("__lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("__lp").alias("avg_logprob"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "avg_logprob",
            F.pow(F.lit(2.0), -F.col("avg_logprob")).alias("perplexity"),
        )
    )
