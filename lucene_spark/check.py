"""Index integrity validation — the CheckIndex analog
(index/CheckIndex.java, 3,875 LoC in the reference) as a distributed
runtime tool: every invariant is verified with DataFrame aggregations or a
single Arrow decode pass, so it runs at full index scale.

Checks (each FATAL on violation):
1. postings blocks decode; doc_ids strictly increasing; last_doc/count agree
2. block sum_freq equals the decoded freq sum; freqs >= 1
3. impacts form a strictly increasing (freq, norm) pareto staircase
4. terms table doc_freq/total_term_freq equal the postings block sums
5. docs table: norm byte == SmallFloat.intToByte4(length); doc_ids dense
6. collection stats equal the docs table aggregates
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import codec
from .build import Index
from .smallfloat import int_to_byte4


def check_index(index: Index, deep: bool = True) -> dict:
    """Validate the index; returns a report dict, raises ValueError with the
    first violated invariant. ``deep=False`` skips the block-decode pass
    (metadata-only checks, cheap even on huge indexes)."""
    report: dict = {}

    # --- 1+2+3: per-block decode pass (distributed, one Arrow sweep) ---
    if deep:
        def audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bad = []
            n_blocks = 0
            n_postings = 0
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    n_blocks += 1
                    docs, freqs, _norms = codec.decode_block_row(row)
                    n_postings += len(docs)
                    if len(docs) != row.count:
                        bad.append((row.term, row.segment_id, row.block_id, "count"))
                    elif np.any(np.diff(docs) <= 0):
                        bad.append((row.term, row.segment_id, row.block_id, "order"))
                    elif docs[-1] != row.last_doc:
                        bad.append((row.term, row.segment_id, row.block_id, "last_doc"))
                    elif np.any(freqs < 1):
                        bad.append((row.term, row.segment_id, row.block_id, "freq<1"))
                    elif int(freqs.sum()) != row.sum_freq:
                        bad.append((row.term, row.segment_id, row.block_id, "sum_freq"))
                    elif len(row.imp_freqs) == 0 or (
                        len(row.imp_freqs) > 1
                        and (
                            np.any(np.diff(row.imp_freqs) <= 0)
                            or np.any(np.diff(row.imp_norms) <= 0)
                        )
                    ):
                        bad.append((row.term, row.segment_id, row.block_id, "impacts"))
                yield pd.DataFrame(
                    {
                        "n_blocks": [n_blocks],
                        "n_postings": [n_postings],
                        "bad": [str(bad[:5]) if bad else ""],
                        "n_bad": [len(bad)],
                    }
                )
                bad, n_blocks, n_postings = [], 0, 0

        agg = (
            index.postings.mapInPandas(
                audit, schema="n_blocks long, n_postings long, bad string, n_bad long"
            )
            .agg(
                F.sum("n_blocks").alias("blocks"),
                F.sum("n_postings").alias("postings"),
                F.sum("n_bad").alias("n_bad"),
                F.max("bad").alias("sample_bad"),
            )
            .collect()[0]
        )
        report["blocks"] = int(agg["blocks"] or 0)
        report["postings"] = int(agg["postings"] or 0)
        if int(agg["n_bad"] or 0):
            raise ValueError(
                f"check_index: {agg['n_bad']} corrupt blocks, e.g. {agg['sample_bad']}"
            )

    # --- 4: terms table vs postings sums ---
    derived = index.postings.groupBy("term").agg(
        F.sum("count").cast("long").alias("df2"),
        F.sum("sum_freq").alias("ttf2"),
    )
    mism = (
        index.terms.join(derived, "term", "full_outer")
        .filter(
            F.col("doc_freq").isNull()
            | F.col("df2").isNull()
            | (F.col("doc_freq") != F.col("df2"))
            | (F.col("total_term_freq") != F.col("ttf2"))
        )
        .count()
    )
    if mism:
        raise ValueError(f"check_index: {mism} terms disagree with postings sums")
    report["terms"] = index.terms.count()

    # --- 5: norms quantization + dense doc_ids ---
    norm_udf = F.pandas_udf(
        lambda s: pd.Series(int_to_byte4(s.to_numpy(dtype=np.int64))), "int"
    )
    eff_len = F.col("length") - F.coalesce(F.col("num_overlap"), F.lit(0))
    bad_norms = index.docs.filter(
        F.col("norm") != norm_udf(eff_len)
    ).count()
    if bad_norms:
        raise ValueError(f"check_index: {bad_norms} docs with wrong norm byte")
    d = index.docs.agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.countDistinct("doc_id").alias("nd"),
        F.sum("length").alias("sttf"),
    ).collect()[0]
    if int(d["n"]) and not (
        int(d["lo"]) == 0
        and int(d["hi"]) == int(d["n"]) - 1
        and int(d["nd"]) == int(d["n"])
    ):
        raise ValueError(
            f"check_index: doc_ids not dense 0..n-1 (n={d['n']}, lo={d['lo']}, hi={d['hi']})"
        )
    report["docs"] = int(d["n"])

    # --- 6: collection stats ---
    if index.stats.doc_count != int(d["n"]) or index.stats.sum_total_term_freq != int(
        d["sttf"] or 0
    ):
        raise ValueError(
            "check_index: CollectionStats disagree with docs table "
            f"({index.stats} vs n={d['n']}, sttf={d['sttf']})"
        )
    report["ok"] = True
    return report
