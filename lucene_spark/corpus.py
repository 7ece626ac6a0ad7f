"""Deterministic synthetic source-code corpus generator + integrity check.

Implements FIXTURES.md §1: an Iceberg-style table of source-code files
(repo, path, commit, lang, content) with

- Zipf(1.1)-weighted language keywords (hot-term skew),
- camelCase / snake_case identifiers from a seeded vocabulary (exercises the
  code-aware word-delimiter chain),
- rare unique tokens (docFreq == 1 — singleton pulsing),
- numbers and punctuation (UAX#29 ALPHANUM/NUM rules).

Generation is distributed (spark.range -> JVM-side columnar exprs would be
ideal, but content assembly needs seeded randomness per row, so it runs as a
mapInPandas over id ranges — deterministic per doc_index regardless of
partitioning) and the per-row invariant is sha256(content) equality against
the sidecar table (BASELINE.json input_hint), checked before indexing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

KEYWORDS = [
    "def", "return", "if", "else", "import", "class", "self", "for", "in",
    "while", "try", "except", "public", "void", "static", "final", "new",
    "int", "string", "val", "var", "object", "extends", "override", "lazy",
]
EXTS = ["py", "java", "scala", "md"]
LANGS = {"py": "python", "java": "java", "scala": "scala", "md": "markdown"}

_NOUNS = [
    "index", "writer", "reader", "segment", "block", "term", "doc", "field",
    "merge", "query", "score", "norm", "posting", "buffer", "codec", "store",
    "token", "filter", "stream", "batch", "shard", "vector", "graph", "heap",
    "cache", "pool", "lock", "flush", "commit", "delta",
]
_VERBS = [
    "get", "set", "add", "remove", "build", "write", "read", "open", "close",
    "next", "advance", "seek", "encode", "decode", "pack", "split", "count",
]


def _identifier_vocab(n: int, rng: np.ndarray) -> list:
    """~n deterministic camelCase/snake_case identifiers."""
    out = []
    i = 0
    while len(out) < n:
        v = _VERBS[i % len(_VERBS)]
        a = _NOUNS[(i * 7 + 3) % len(_NOUNS)]
        b = _NOUNS[(i * 13 + 5) % len(_NOUNS)]
        if i % 3 == 0:
            out.append(f"{v}{a.capitalize()}{b.capitalize()}")  # camelCase
        elif i % 3 == 1:
            out.append(f"{v}_{a}_{b}")  # snake_case
        else:
            out.append(f"{a.capitalize()}{b.capitalize()}{i % 97}")  # ClassName42
        i += 1
    return out[:n]


IDENTIFIERS = _identifier_vocab(5000, None)


_KW = np.array(KEYWORDS)
_IDS = np.array(IDENTIFIERS)
_KW_CUM = None
_SEPS = np.array([" = ", "(", ", ", ": ", " + "])


def _kw_cum() -> np.ndarray:
    global _KW_CUM
    if _KW_CUM is None:
        p = 1.0 / np.arange(1, len(_KW) + 1, dtype=np.float64) ** 1.1
        _KW_CUM = np.cumsum(p / p.sum())
    return _KW_CUM


def _gen_row(i: int, seed: int = 42) -> tuple:
    """One deterministic corpus row; depends only on (seed, i).

    Uses a cheap splitmix-style LCG stream instead of default_rng (whose
    construction dominates at millions of rows) — still fully deterministic.
    """
    state = (seed * 1_000_003 + i) & 0xFFFFFFFFFFFFFFFF

    def nxt() -> int:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return state >> 11

    def rint(lo: int, hi: int) -> int:  # [lo, hi)
        return lo + nxt() % (hi - lo)

    repo = f"org{i % 7}/proj{i % 23}"
    ext = EXTS[i % len(EXTS)]
    module = _NOUNS[i % len(_NOUNS)]
    path = f"src/{module}/file{i:08d}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    cum = _kw_cum()
    parts = []
    for _ in range(rint(5, 40)):
        toks = []
        for _ in range(rint(1, 4)):  # Zipf keywords
            u = (nxt() & 0xFFFFFF) / float(1 << 24)
            toks.append(_KW[int(np.searchsorted(cum, u))])
        for _ in range(rint(1, 4)):  # identifiers
            toks.append(_IDS[nxt() % len(_IDS)])
        if nxt() % 10 < 3:
            toks.append(str(nxt() % 100000))
        # deterministic in-place shuffle (Fisher-Yates)
        for j in range(len(toks) - 1, 0, -1):
            k = nxt() % (j + 1)
            toks[j], toks[k] = toks[k], toks[j]
        sep = _SEPS[nxt() % len(_SEPS)]
        parts.append(sep.join(toks) + (")" if sep == "(" else ";"))
    if nxt() % 100 < 15:
        parts.append(f"rare_{i}_{nxt() % (1 << 30)}")  # singleton token
    return (repo, path, commit, LANGS[ext], "\n".join(parts))


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int = 32
) -> DataFrame:
    """Distributed deterministic generation: content depends only on
    (seed, doc_index), never on partitioning."""
    base = spark.range(0, n_docs, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                rows = [_gen_row(int(i), seed) for i in pdf["id"].to_numpy()]
                yield pd.DataFrame(
                    rows, columns=["repo", "path", "commit", "lang", "content"]
                )

    return base.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


def sha256_sidecar(corpus: DataFrame) -> DataFrame:
    """(repo, path, sha256) integrity sidecar."""
    return corpus.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha256")
    )


def verify_sha256(corpus: DataFrame, sidecar: DataFrame, strict: bool = False) -> int:
    """Per-row invariant (BASELINE.json input_hint): sha256(content) equality
    against the sidecar. Returns the number of mismatching rows (0 = ok);
    raises if any row is missing or mismatched.

    Default mode is join-free: each side is reduced to (row_count,
    Σ xxhash64(repo, path, sha256)) with map-side partial aggregation — no
    shuffle of corpus bytes. Any single-row difference on either side changes
    the 64-bit sum (collision odds ~n²/2⁶⁴), so every row's sha256 is still
    what is being checked. ``strict=True`` keeps the full_outer join that
    pinpoints offending rows (used in tests / debugging)."""
    actual = corpus.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha256")
    )
    if not strict:
        def digest(df: DataFrame):
            r = df.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.xxhash64("repo", "path", "sha256").cast("decimal(38,0)")
                ).alias("h"),
            ).collect()[0]
            return int(r["n"]), int(r["h"] or 0)

        na, ha = digest(actual)
        nb, hb = digest(sidecar.select("repo", "path", "sha256"))
        if (na, ha) != (nb, hb):
            raise ValueError(
                f"corpus integrity check failed: digest mismatch "
                f"({na},{ha:x}) vs ({nb},{hb:x}); rerun strict=True to locate rows"
            )
        return 0
    joined = actual.withColumnRenamed("sha256", "actual").join(
        sidecar, ["repo", "path"], "full_outer"
    )
    bad = joined.filter(
        F.col("actual").isNull()
        | F.col("sha256").isNull()
        | (F.col("actual") != F.col("sha256"))
    ).count()
    if bad:
        raise ValueError(f"corpus integrity check failed: {bad} rows mismatch")
    return 0
