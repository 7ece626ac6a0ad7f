"""Snippet highlighting — the analog of the reference's highlighter module
(lucene/highlighter: Highlighter/UnifiedHighlighter), re-expressed with a
deterministic, SQL-reproducible passage definition:

- match   = first case-insensitive substring occurrence of any query term
  (substring, not token-accurate — documented divergence from the
  token-stream-driven Lucene highlighter);
- passage = ``window`` characters of ORIGINAL text on each side of that
  first match (clamped at the document edges);
- markup  = every case-insensitive term occurrence inside the passage is
  wrapped in the given tags, original casing preserved.

Runs as one Arrow-batched pass over (id, text); no shuffle.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def highlight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    window: int = 40,
    tags: Tuple[str, str] = ("<b>", "</b>"),
) -> DataFrame:
    """(doc_id, snippet) for every doc containing at least one term."""
    terms = [t.lower() for t in terms]
    pat = re.compile(
        "(" + "|".join(re.escape(t) for t in terms) + ")", re.IGNORECASE
    )
    open_t, close_t = tags

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            text = pdf[text_col].astype(str)
            low = text.str.lower()
            best = np.full(len(pdf), np.iinfo(np.int64).max, dtype=np.int64)
            best_len = np.zeros(len(pdf), dtype=np.int64)
            for t in terms:
                pos = low.str.find(t).to_numpy(dtype=np.int64)
                hit = (pos >= 0) & (pos < best)
                best[hit] = pos[hit]
                best_len[hit] = len(t)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            keep = best < np.iinfo(np.int64).max
            out_ids, out_snips = [], []
            for i in np.nonzero(keep)[0]:
                s = text.iloc[int(i)]
                p, tl = int(best[i]), int(best_len[i])
                raw = s[max(0, p - window): p + tl + window]
                out_ids.append(int(ids[i]))
                out_snips.append(pat.sub(open_t + r"\1" + close_t, raw))
            yield pd.DataFrame({"doc_id": out_ids, "snippet": out_snips})

    return df.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, snippet string"
    )


def unified_highlight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    window_tokens: int = 16,
    tags: Tuple[str, str] = ("<b>", "</b>"),
) -> DataFrame:
    """Token-accurate passage highlighting — the UnifiedHighlighter model
    (highlighter/.../uhighlight/UnifiedHighlighter.java + PassageScorer.java)
    with a deterministic SQL-reproducible spec:

    - tokens/positions come from the ANALYSIS CHAIN (TOKEN_RE), not substring
      search, so matches are whole tokens at token offsets;
    - passages = fixed windows of ``window_tokens`` analysis positions;
    - passage score = Σ over DISTINCT matched query terms of the BM25 idf
      ln(1 + (N - df + 0.5)/(df + 0.5)) — PassageScorer's idf weighting;
    - best passage per doc by (score desc, passage index asc); snippet =
      the passage's tokens joined by spaces with every matched token
      wrapped in ``tags``.

    Pure JVM column expressions end-to-end (no Python UDF): tokenize ->
    posexplode -> windowed idf aggregation -> best-passage row_number ->
    sorted-struct array_join.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..analysis import TOKEN_RE

    terms = [t.lower() for t in terms]
    open_t, close_t = tags
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    ).withColumn("passage", F.floor(F.col("pos") / window_tokens).cast("int"))
    stats = df.agg(F.count("*").cast("double").alias("n"))
    dfreq = (
        toks.filter(F.col("term").isin(terms))
        .select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
    )
    psc = (
        toks.join(F.broadcast(dfreq.select("term", "idf")), "term")
        .select("doc_id", "passage", "term", "idf")
        .distinct()  # unique matched terms per passage
        .groupBy("doc_id", "passage")
        .agg(F.sum("idf").alias("score"))
    )
    best = psc.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("passage"))
        ),
    ).filter(F.col("rk") == 1)
    wrapped = F.when(
        F.col("term").isin(terms),
        F.concat(F.lit(open_t), F.col("term"), F.lit(close_t)),
    ).otherwise(F.col("term"))
    snip = (
        toks.join(best.select("doc_id", "passage", "score"), ["doc_id", "passage"])
        .withColumn("tok", wrapped)
        .groupBy("doc_id", "passage", "score")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("snippet")
        )
    )
    return snip.select(
        "doc_id",
        F.col("passage").cast("int"),
        F.round("score", 6).alias("score"),
        "snippet",
    ).orderBy("doc_id")
