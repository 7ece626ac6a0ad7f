"""Payloads — the reference's ``queries/payloads`` module
(PayloadScoreQuery.java, {Sum,Min,Max,Average}PayloadFunction.java) plus
the analysis side (DelimitedPayloadTokenFilter: whitespace tokens carrying
``term|payload`` suffixes, split at the LAST delimiter, float-decoded).

Spark-first shape: payloads live as a SIDECAR table
``(doc_id, pos, term, payload)`` — the per-position parallel stream the
reference stores next to postings, here a parquet table partitionable by
term so a payload query is one equi-join + aggregate. Parsing and
aggregation are pure Catalyst (no UDFs): the token split, last-delimiter
break, float decode, and the payload functions are all column
expressions inside whole-stage codegen.

Semantics (PayloadScoreQuery.PayloadSpanScorer):

- matching docs = docs whose span matches, payload-bearing or not;
  ``payloadsSeen`` counts only positions that actually carry a payload
- docScore: sum/min/max = the aggregate (fn default 1.0 when no payloads
  seen); average = sum/seen (1.0 when none)
- negative docScore -> 0 (the scorer's guard)
- includeSpanScore multiplies by the wrapped span query's score — pass
  the span scores frame in (the caller owns the searcher)

The span operand is a single term or an ordered term chain of ANY length
with slop (SpanNearQuery ordered): matched spans are NearSpansOrdered's
greedy chains (for each start position, each later clause advances to its
minimal position past the previous clause; match iff width - (n-1) <=
slop), and the payloads of EVERY chain position feed the function —
PayloadSpanCollector collects each subspan's payload per matched span.
The chain is built as n-1 doc-equi-joins + min_by aggregates, pure
Catalyst. Unparsable payload suffixes decode to absent instead of the
FloatEncoder's exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_delimited_payloads(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "|",
    lowercase: bool = True,
) -> DataFrame:
    """DelimitedPayloadTokenFilter over a WhitespaceTokenizer (the
    reference's canonical payload chain): whitespace-split tokens, break
    each at its LAST delimiter (DelimitedPayloadTokenFilter.java scans
    from the end), decode the suffix as a float payload (absent when no
    delimiter or non-numeric). Returns (doc_id, pos, term, payload)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    out = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    suffix = F.substring_index(F.col("tok"), delimiter, -1)
    has_delim = F.instr(F.col("tok"), delimiter) > 0
    term = F.when(
        has_delim,
        F.expr(
            f"substring(tok, 1, length(tok) - length("
            f"substring_index(tok, '{delimiter}', -1)) - 1)"
        ),
    ).otherwise(F.col("tok"))
    if lowercase:
        term = F.lower(term)
    # try_cast: a non-numeric suffix decodes to absent (the FloatEncoder
    # exception envelope), and ANSI mode must not abort the scan
    payload = F.when(has_delim, suffix.try_cast("double")).otherwise(F.lit(None))
    return out.select(
        "doc_id",
        F.col("pos").cast("int"),
        term.alias("term"),
        payload.alias("payload"),
    )


_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.sum,  # docScore divides by payloads_seen below
}


def payload_score(
    payloads: DataFrame,
    terms,
    function: str = "sum",
    span_scores: DataFrame | None = None,
    slop: int = 0,
) -> DataFrame:
    """PayloadScoreQuery over the sidecar table: ``terms`` is a single
    term (SpanTermQuery) or an ordered term chain of any length
    (SpanNearQuery ordered, ``slop`` gaps allowed); every matched chain
    position's payload feeds the function (the PayloadSpanCollector
    contract, queries/payloads/PayloadScoreQuery.java). Returns
    (doc_id, score); with ``span_scores`` (doc_id, score) the result is
    spanScore * payloadScore restricted to docs in both frames
    (includeSpanScore)."""
    if function not in _AGGS:
        raise ValueError(f"unknown payload function {function!r}")
    if isinstance(terms, str):
        rows = payloads.filter(F.col("term") == terms)
    elif len(terms) >= 2:
        # greedy NearSpansOrdered chains (matchers.ordered_chain_spans
        # semantics): per start position q0, clause i advances to its
        # minimal position past q_{i-1}; n-1 equi-joins + min_by, pure JVM
        n = len(terms)
        cur = payloads.filter(F.col("term") == terms[0]).select(
            "doc_id",
            F.col("pos").alias("q0"),
            F.col("payload").alias("pl0"),
        )
        for i, t in enumerate(terms[1:], start=1):
            nxt = payloads.filter(F.col("term") == t).select(
                "doc_id",
                F.col("pos").alias("_np"),
                F.col("payload").alias("_npl"),
            )
            keep = cur.columns
            cur = (
                cur.join(nxt, "doc_id")
                .filter(F.col("_np") > F.col(f"q{i - 1}"))
                .groupBy(*keep)
                .agg(
                    F.min("_np").alias(f"q{i}"),
                    F.min_by("_npl", "_np").alias(f"pl{i}"),
                )
            )
        spans = cur.filter(
            (F.col(f"q{n - 1}") - F.col("q0") - (n - 1)) <= int(slop)
        )
        rows = spans.select(
            "doc_id",
            F.explode(F.array(*[F.col(f"pl{i}") for i in range(n)])).alias(
                "payload"
            ),
        )
    else:
        raise ValueError("payload span operand: term or >=2-term chain")
    agg = rows.groupBy("doc_id").agg(
        _AGGS[function]("payload").alias("ps"),
        F.count("payload").alias("seen"),  # counts non-null payloads only
    )
    if function == "avg":
        val = F.when(
            F.col("seen") > 0, F.col("ps") / F.col("seen")
        ).otherwise(F.lit(1.0))
    else:
        # fn docScore default when no payloads were seen is 1.0
        val = F.when(F.col("seen") > 0, F.col("ps")).otherwise(F.lit(1.0))
    score = F.when(val >= 0, val).otherwise(F.lit(0.0))  # negative -> 0
    out = agg.select("doc_id", score.alias("score"))
    if span_scores is not None:
        sp = span_scores.select(
            "doc_id", F.col("score").alias("__span")
        )
        out = out.join(sp, "doc_id").select(
            "doc_id", (F.col("score") * F.col("__span")).alias("score")
        )
    return out
