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
