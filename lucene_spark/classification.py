"""Classification over the inverted index — the reference's
``classification/`` module re-expressed for Spark's batch execution model.

Two classifiers, matching the reference semantics operator-for-operator:

- :class:`SimpleNaiveBayesClassifier`
  (classification/SimpleNaiveBayesClassifier.java): multinomial naive
  Bayes with add-one smoothing over index statistics. Per class ``c`` and
  input token multiset ``w1..wn``::

      score(c) = ln(docFreq(c)) - ln(docsWithClass)
               + sum_i ln( (hits(w_i, c) + 1)
                           / (avgUniqueTerms * docFreq(c) + docsWithClass) )

  where ``hits(w, c)`` counts documents of class c containing w
  (SimpleNaiveBayesClassifier.getWordFreqForClass) and
  ``avgUniqueTerms = sumDocFreq / docCount`` of the text field
  (getTextTermFreqForClass). Scores are softmax-normalized to 0..1
  (normClassificationResults) exactly as the reference does.

- :class:`KNearestNeighborClassifier`
  (classification/KNearestNeighborClassifier.java): MoreLikeThis top-k
  neighbors voted by class. Per class in the top docs
  (buildListFromTopDocs)::

      score(c) = sum_{doc in topk, class(doc)=c} (score(doc)/maxScore) / k

  with the reference's small-result correction (× k/sumdoc when fewer
  than k neighbors carry a class). The MLT term selection is this repo's
  established MoreLikeThis analog (Searcher.more_like_this — tf·idf
  ranked disjunction; the reference additionally carries per-term
  interestingness boosts, available via more_like_this(boost_terms=True)
  — the reference kNN classifier uses the boost=false default, as here).

Scale notes (the classify unit is a whole DataFrame of inputs, not one
string): input tokenization is an Arrow-batched pandas pass; per-(word,
class) hit counts come from one postings decode of the batch vocabulary
joined against the class column and aggregated — a single shuffle keyed
by term; everything downstream is JVM column arithmetic + one window per
input. The batch vocabulary is collected to the driver to address the
postings (bounded by distinct words per classify batch — the same
envelope as Monitor.match_batch's presearcher vocabulary).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _tokenize_inputs(inputs: DataFrame, id_col: str, text_col: str, chain: str):
    """(tokens, totals): tokens = (input_id, word, cnt) with multiplicity,
    totals = (input_id, n_tokens) including zero-token inputs."""
    from .analysis import flat_tokenize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flat, counts = flat_tokenize(pdf[text_col], chain=chain)
            ids = np.repeat(pdf[id_col].to_numpy(np.int64), counts)
            yield pd.DataFrame({"input_id": ids, "word": flat.astype(object)})

    toks = inputs.mapInPandas(run, schema="input_id long, word string")
    tokens = toks.groupBy("input_id", "word").agg(F.count("*").alias("cnt"))
    totals = inputs.select(
        F.col(id_col).cast("long").alias("input_id")
    ).join(
        toks.groupBy("input_id").agg(F.count("*").alias("n_tokens")),
        "input_id",
        "left",
    ).fillna({"n_tokens": 0})
    return tokens, totals


def _ranked(out: DataFrame) -> DataFrame:
    w = Window.partitionBy("input_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("class")
    )
    return (
        out.withColumn("score", F.round(F.col("score"), 6))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("input_id", "rank", "class", "score")
        .orderBy("input_id", "rank")
    )


class SimpleNaiveBayesClassifier:
    """Multinomial NB over index stats (SimpleNaiveBayesClassifier.java).

    ``classes_df`` maps doc_id -> class (the stored class field); rows
    with a null class are excluded everywhere, like docs without the
    class field in the reference.
    """

    def __init__(
        self,
        searcher,
        classes_df: DataFrame,
        class_col: str = "lang",
        doc_id_col: str = "doc_id",
    ):
        self.searcher = searcher
        self.classes = (
            classes_df.filter(F.col(class_col).isNotNull())
            .select(
                F.col(doc_id_col).cast("long").alias("doc_id"),
                F.col(class_col).cast("string").alias("class"),
            )
        )
        idx = searcher.index
        # per-class doc counts (docFreq of each class term) — tiny
        rows = self.classes.groupBy("class").count().collect()
        self.class_counts = {r["class"]: int(r["count"]) for r in rows}
        self.docs_with_class = sum(self.class_counts.values())
        # text-field stats: sumDocFreq = #(term, doc) pairs, docCount =
        # docs with >= 1 token (Terms.getSumDocFreq / getDocCount)
        agg = idx.terms.agg(
            F.sum("doc_freq").alias("sdf")
        ).collect()[0]
        self.sum_doc_freq = int(agg["sdf"] or 0)
        self.doc_count_text = int(idx.docs.filter(F.col("length") > 0).count())
        self.avg_unique = (
            self.sum_doc_freq / self.doc_count_text if self.doc_count_text else 0.0
        )

    def classify_df(
        self, inputs: DataFrame, id_col: str = "input_id", text_col: str = "text"
    ) -> DataFrame:
        """(input_id, rank, class, score): softmax-normalized NB
        probabilities for every class, rank 1 = assigned class."""
        sp = inputs.sparkSession
        chain = self.searcher.index.config.chain
        tokens, totals = _tokenize_inputs(inputs, id_col, text_col, chain)
        tokens = tokens.persist()
        words = [r["word"] for r in tokens.select("word").distinct().collect()]

        cls = sp.createDataFrame(
            [(c, n) for c, n in sorted(self.class_counts.items())],
            "class string, class_docs long",
        )
        if words:
            hits = (
                self.searcher.decode_raw(words)
                .select("term", "doc_id")
                .join(self.classes, "doc_id")
                .groupBy(F.col("term").alias("word"), "class")
                .agg(F.count("*").alias("hits"))
            )
        else:
            hits = sp.createDataFrame([], "word string, class string, hits long")

        # sum_i cnt * ln(hits+1) per (input, class); words with no hits in
        # a class contribute ln(1)=0, so the left join's nulls drop out
        per_word = (
            tokens.crossJoin(F.broadcast(cls.select("class")))
            .join(F.broadcast(hits), ["word", "class"], "left")
            .fillna({"hits": 0})
            .groupBy("input_id", "class")
            .agg(
                F.sum(
                    F.col("cnt") * F.log(F.col("hits") + F.lit(1.0))
                ).alias("lhits")
            )
        )
        n_cls = float(self.docs_with_class)
        scored = (
            totals.crossJoin(F.broadcast(cls))
            .join(per_word, ["input_id", "class"], "left")
            .fillna({"lhits": 0.0})
            .withColumn(
                "score",
                # ln prior + sum ln(hits+1) - n_tokens * ln(den_c)
                F.log(F.col("class_docs").cast("double"))
                - F.lit(math.log(n_cls))
                + F.col("lhits")
                - F.col("n_tokens")
                * F.log(
                    F.lit(self.avg_unique) * F.col("class_docs") + F.lit(n_cls)
                ),
            )
        )
        # softmax per input (normClassificationResults): exp(x - logsumexp)
        wi = Window.partitionBy("input_id")
        mx = F.max("score").over(wi)
        lse = mx + F.log(F.sum(F.exp(F.col("score") - mx)).over(wi))
        out = scored.withColumn("score", F.exp(F.col("score") - lse)).select(
            "input_id", "class", "score"
        )
        res = _ranked(out)
        tokens.unpersist()
        return res


class KNearestNeighborClassifier:
    """MLT top-k neighbor vote (KNearestNeighborClassifier.java)."""

    def __init__(
        self,
        searcher,
        classes_df: DataFrame,
        class_col: str = "lang",
        doc_id_col: str = "doc_id",
        k: int = 10,
        max_query_terms: int = 5,
        min_doc_freq: int = 2,
    ):
        self.searcher = searcher
        self.classes = (
            classes_df.filter(F.col(class_col).isNotNull())
            .select(
                F.col(doc_id_col).cast("long").alias("doc_id"),
                F.col(class_col).cast("string").alias("class"),
            )
        )
        self.k = k
        self.max_query_terms = max_query_terms
        self.min_doc_freq = min_doc_freq

    def classify(self, texts: Sequence[str]) -> DataFrame:
        """(input_id, rank, class, score) for each input text (input_id =
        position in ``texts``). One MLT search per text (query building is
        driver-side, as in the reference), executed as a single unioned
        plan; the vote is pure column arithmetic.

        Rank protocol: neighbors are the top k by (score rounded to 6
        decimals desc, doc_id asc) among docs with a class — the
        reference's MUST class-field-exists clause — and the vote uses
        the rounded scores, so both engines see the same neighbor set."""
        parts = []
        for i, text in enumerate(texts):
            q = self.searcher.more_like_this(
                text,
                max_query_terms=self.max_query_terms,
                min_doc_freq=self.min_doc_freq,
            )
            sc = self.searcher.search(q, self.k + 8, prune=False)
            parts.append(
                sc.select(
                    F.lit(i).cast("long").alias("input_id"), "doc_id", "score"
                )
            )
        allsc = parts[0]
        for p in parts[1:]:
            allsc = allsc.unionByName(p)
        wn = Window.partitionBy("input_id").orderBy(
            F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
        )
        top = (
            allsc.join(self.classes, "doc_id")
            .withColumn("score", F.round(F.col("score"), 6))
            .withColumn("nrank", F.row_number().over(wn))
            .filter(F.col("nrank") <= self.k)
        )
        wi = Window.partitionBy("input_id")
        top = top.withColumn("max_score", F.max("score").over(wi)).withColumn(
            "sumdoc", F.count("*").over(wi)
        )
        # sum(score/maxScore)/k, corrected to /sumdoc when sumdoc < k
        # (buildListFromTopDocs: (count * normBoost)/k then * k/sumdoc)
        out = (
            top.groupBy("input_id", "class")
            .agg(
                (
                    F.sum(F.col("score") / F.col("max_score"))
                    / F.least(F.first("sumdoc"), F.lit(self.k))
                ).alias("score")
            )
        )
        return _ranked(out)
