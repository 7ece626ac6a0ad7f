"""Autocomplete suggester — the suggest/Lookup.java contract
(Lookup.lookup(key, num) -> ranked (key, weight) completions): a prefix scan
of the index terms table with weight = docFreq, ranked weight desc then key
asc. The terms Parquet is written term-sorted, so the prefix predicate
prunes row groups at scan time — the role of the suggester FST's prefix
seek (suggest/.../suggest/fst/FSTCompletionLookup.java), re-expressed as
predicate pushdown."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def suggest_prefix(terms: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions of ``prefix`` from an Index.terms table."""
    return (
        terms.filter(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def suggest_infix(terms: DataFrame, query: str, k: int = 10) -> DataFrame:
    """AnalyzingInfixSuggester.lookup analog: suggestions CONTAINING the
    analyzed query as a substring (the reference matches any token
    position in the suggestion text, not just the start), weight-ranked.
    A substring predicate can't prune row groups like the prefix seek,
    which mirrors the reference's separate infix index structure — here
    it's a plain scan filter."""
    return (
        terms.filter(F.col("term").contains(query))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def suggest_fuzzy(
    terms: DataFrame,
    key: str,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    k: int = 10,
) -> DataFrame:
    """FuzzySuggester analog (suggest/analyzing/FuzzySuggester.java): a
    suggestion matches when SOME PREFIX of it lies within ``max_edits``
    OSA edits (transpositions, the reference default) of the key — the
    fuzzy automaton concatenated with the anything-suffix. Reference
    defaults kept: the first ``non_fuzzy_prefix`` chars are exact (pushed
    to the scan), keys shorter than ``min_fuzzy_length`` fall back to the
    exact prefix lookup. The prefix check is vectorized per Arrow batch
    (2*max_edits+1 banded OSA rows)."""
    if len(key) < min_fuzzy_length:
        return suggest_prefix(terms, key, k)
    cand = terms.filter(F.col("term").startswith(key[:non_fuzzy_prefix]))
    n, d = len(key), int(max_edits)

    @F.pandas_udf("boolean")
    def _match(col: pd.Series) -> pd.Series:
        import numpy as np

        from ..editdist import osa_distances

        vals = col.to_numpy(dtype=object)
        ok = np.zeros(len(vals), dtype=bool)
        for L in range(max(0, n - d), n + d + 1):
            prefixes = [t[:L] for t in vals]
            ok |= osa_distances(prefixes, key) <= d
        return pd.Series(ok)

    return (
        cand.filter(_match(F.col("term")))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def spell_suggest(
    terms: DataFrame,
    word: str,
    num_sug: int = 5,
    max_edits: int = 2,
    min_prefix: int = 1,
    accuracy: float = 0.5,
    min_doc_freq: int = 0,
    suggest_mode: str = "not_in_index",
    distance: str = "internal",
    dtype=None,
) -> DataFrame:
    """DirectSpellChecker.suggestSimilar
    (suggest/spell/DirectSpellChecker.java): candidate dictionary terms
    within ``max_edits`` OSA edits (FuzzyTermsEnum transpositions=true),
    scored 1 - d / min(|word|, |candidate|) (the FuzzyQuery boost the
    reference uses as the score), filtered by ``accuracy`` (default 0.5)
    and docFreq > ``min_doc_freq``, the exact word excluded, ranked
    score desc then freq desc (SuggestWordScoreComparator) then term asc
    as the deterministic final tie. ``suggest_mode`` 'not_in_index'
    (the reference default) returns nothing when the word itself is
    indexed; 'always' always suggests. Reference defaults kept
    (maxEdits 2, minPrefix 1); the maxInspections candidate-pool cap is
    not needed — every banded candidate is scored distributively.

    ``distance`` selects the StringDistance (DirectSpellChecker.
    setDistance): 'internal' = the FuzzyTermsEnum boost (default);
    'jaro_winkler' / 'ngram' / 'lucene_levenshtein' rescore the SAME
    OSA-banded candidate set with that similarity
    (DirectSpellChecker.java:501-505: score = distance.getDistance when
    a non-internal distance is set)."""
    if suggest_mode not in ("not_in_index", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    if distance != "internal":
        from ..strdist import DISTANCES

        if distance not in DISTANCES:
            raise ValueError(f"unknown distance {distance!r}")
    if suggest_mode == "not_in_index":
        if terms.filter(F.col("term") == word).limit(1).count() > 0:
            return terms.sparkSession.createDataFrame(
                [], "key string, weight long, score double"
            )
    cand = terms.filter(F.col("term") != word)
    if min_prefix > 0:
        cand = cand.filter(F.col("term").startswith(word[: min_prefix]))
    # length band: OSA >= |len difference|, pushable JVM-side
    cand = cand.filter(
        (F.length("term") >= len(word) - max_edits)
        & (F.length("term") <= len(word) + max_edits)
    )
    n, d = len(word), int(max_edits)

    dist_name = distance

    @F.pandas_udf("double")
    def _score(col: pd.Series) -> pd.Series:
        import numpy as np

        from ..editdist import osa_distances

        vals = col.to_numpy(dtype=object)
        dist = osa_distances(list(vals), word).astype(np.float64)
        if dist_name == "internal":
            lens = np.array([min(n, len(t)) for t in vals], dtype=np.float64)
            score = 1.0 - dist / np.maximum(lens, 1.0)
        else:
            from ..strdist import DISTANCES

            fn = DISTANCES[dist_name]
            dt = np.float32 if dtype is None else dtype
            score = np.array(
                [fn(word, t, dtype=dt) for t in vals], dtype=np.float64
            )
        score[dist > d] = -1.0  # candidates stay OSA-banded either way
        return pd.Series(score)

    return (
        cand.withColumn("score", _score(F.col("term")))
        .filter(
            (F.col("score") >= float(accuracy))
            & (F.col("doc_freq") > int(min_doc_freq))
        )
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("weight"), F.asc("key"))
        .limit(num_sug)
    )


def word_break_suggest(
    terms: DataFrame,
    word: str,
    max_suggestions: int = 5,
    min_break_length: int = 1,
    min_freq: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks
    (suggest/spell/WordBreakSpellChecker.java, maxChanges=1 — the
    reference default, a single split): every split point where BOTH
    halves are dictionary terms with freq >= minSuggestionFrequency,
    ranked by NUM_CHANGES_THEN_MAX_FREQUENCY (all single-change here, so
    max(leftFreq, rightFreq) desc; split position asc as the
    deterministic tie). The split candidates are a driver-built frame of
    len(word)-1 rows joined twice against the terms table — two tiny
    broadcast hash joins."""
    sp = terms.sparkSession
    lo, hi = min_break_length, len(word) - min_break_length
    splits = [(i, word[:i], word[i:]) for i in range(lo, hi + 1)]
    if not splits:
        return sp.createDataFrame(
            [], "left_term string, right_term string, left_freq long, right_freq long"
        )
    cand = sp.createDataFrame(splits, "i int, l string, r string")
    dfx = terms.select("term", F.col("doc_freq").cast("long").alias("w"))
    out = (
        F.broadcast(cand)
        .join(dfx.withColumnRenamed("term", "l").withColumnRenamed("w", "lf"), "l")
        .join(dfx.withColumnRenamed("term", "r").withColumnRenamed("w", "rf"), "r")
        .filter((F.col("lf") >= min_freq) & (F.col("rf") >= min_freq))
    )
    return (
        out.orderBy(F.desc(F.greatest("lf", "rf")), F.asc("i"))
        .select(
            F.col("l").alias("left_term"),
            F.col("r").alias("right_term"),
            F.col("lf").alias("left_freq"),
            F.col("rf").alias("right_freq"),
        )
        .limit(max_suggestions)
    )


def word_combine_suggest(
    terms: DataFrame,
    words,
    max_combine_length: int = 20,
    min_freq: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations: adjacent input-word
    pairs whose CONCATENATION is a dictionary term with freq >=
    minSuggestionFrequency AND >= the most frequent included word (the
    reference's 'same or better frequency than the most-popular included
    term' gate). Returns (index, combined, freq) ordered by index."""
    sp = terms.sparkSession
    pairs = [
        (i, words[i], words[i + 1], words[i] + words[i + 1])
        for i in range(len(words) - 1)
        if len(words[i] + words[i + 1]) <= max_combine_length
    ]
    if not pairs:
        return sp.createDataFrame([], "idx int, combined string, freq long")
    cand = sp.createDataFrame(pairs, "idx int, a string, b string, combined string")
    dfx = terms.select("term", F.col("doc_freq").cast("long").alias("w"))
    out = (
        F.broadcast(cand)
        .join(dfx.withColumnRenamed("term", "combined").withColumnRenamed("w", "cf"), "combined")
        .join(dfx.withColumnRenamed("term", "a").withColumnRenamed("w", "af"), "a", "left")
        .join(dfx.withColumnRenamed("term", "b").withColumnRenamed("w", "bf"), "b", "left")
        .fillna({"af": 0, "bf": 0})
        .filter(
            (F.col("cf") >= min_freq)
            & (F.col("cf") >= F.greatest("af", "bf"))
        )
    )
    return (
        out.select("idx", "combined", F.col("cf").alias("freq"))
        .orderBy("idx")
    )


def word_break_suggest_multi(
    terms: DataFrame,
    word: str,
    max_changes: int = 2,
    max_suggestions: int = 5,
    min_break_length: int = 1,
    min_freq: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks with maxChanges > 1 (the
    recursive right-part re-break, generateBreakUpSuggestions): every
    composition of the word into 2..max_changes+1 dictionary parts (each
    with freq >= minSuggestionFrequency and length >=
    minBreakWordLength), ranked NUM_CHANGES_THEN_MAX_FREQUENCY —
    changes asc, max part freq desc, then the joined decomposition asc
    as the deterministic tie. Split-point tuples enumerate driver-side
    (len(word) choose changes — tiny), parts resolve in one broadcast
    join + count/min aggregate. Returns (parts, num_changes, max_freq)
    with parts space-joined."""
    import itertools

    sp = terms.sparkSession
    L = len(word)
    rows = []
    sid = 0
    for c in range(1, max_changes + 1):
        for pts in itertools.combinations(range(1, L), c):
            bounds = (0,) + pts + (L,)
            parts = [word[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
            if any(len(p) < min_break_length for p in parts):
                continue
            for idx, p in enumerate(parts):
                rows.append((sid, c, len(parts), idx, p))
            sid += 1
    if not rows:
        return sp.createDataFrame(
            [], "parts string, num_changes int, max_freq long"
        )
    cand = sp.createDataFrame(
        rows, "sid int, c int, np int, idx int, part string"
    )
    dfx = terms.select(
        F.col("term").alias("part"), F.col("doc_freq").cast("long").alias("w")
    )
    joined = F.broadcast(cand).join(dfx, "part")
    ok = (
        joined.groupBy("sid", "c", "np")
        .agg(
            F.count("*").alias("matched"),
            F.min("w").alias("minf"),
            F.max("w").alias("max_freq"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("idx", "part"))
                ).getField("part"),
                " ",
            ).alias("parts"),
        )
        .filter((F.col("matched") == F.col("np")) & (F.col("minf") >= min_freq))
    )
    return (
        ok.select("parts", F.col("c").alias("num_changes"), "max_freq")
        .orderBy("num_changes", F.desc("max_freq"), "parts")
        .limit(max_suggestions)
    )


# ---------------- FreeTextSuggester (stupid backoff ngram LM) ----------

FREE_TEXT_SEP = "\x1e"  # FreeTextSuggester.DEFAULT_SEPARATOR (0x1e)
FREE_TEXT_ALPHA = 0.4  # FreeTextSuggester.ALPHA


def build_free_text(
    docs: DataFrame, text_col: str = "text", grams: int = 2
) -> DataFrame:
    """FreeTextSuggester.build (suggest/analyzing/FreeTextSuggester.java:
    213-300): tokenize each doc, emit every 1..grams-length shingle
    (ShingleFilter with the 0x1e separator), count occurrences corpus-wide.
    Shingles never cross doc boundaries. Pure JVM column expressions
    (regexp tokenizer + slice/aggregate) — one shuffle for the count.
    → (gram string, cnt long)"""
    if grams < 1:
        raise ValueError("grams must be >= 1")
    from ..analysis import TOKEN_RE

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
    )
    parts = []
    base = docs.select(toks.alias("__t")).filter(F.size("__t") > 0)
    for n in range(1, grams + 1):
        grams_col = F.transform(
            F.sequence(F.lit(1), F.size("__t") - F.lit(n - 1)),
            lambda i: F.array_join(
                F.slice(F.col("__t"), i, n), FREE_TEXT_SEP
            ),
        )
        parts.append(
            base.filter(F.size("__t") >= n)
            .select(F.explode(grams_col).alias("gram"))
        )
    allg = parts[0]
    for p in parts[1:]:
        allg = allg.unionByName(p)
    return allg.groupBy("gram").agg(F.count("*").cast("long").alias("cnt"))


def free_text_lookup(
    model: DataFrame,
    key: str,
    num: int = 10,
    grams: int = 2,
    analyze=None,
) -> list:
    """FreeTextSuggester.lookup (FreeTextSuggester.java:400-560): stupid
    backoff over the gram levels. The last ``grams-1`` tokens form the
    context; a trailing separator in ``key`` means 'predict the next
    word' (lastTokenEnded shifts every context down a slot). Per level
    (highest order first): grams extending the context prefix, best
    ``num`` by (count desc, gram asc), skipping final words already
    suggested by a higher level; score = backoff * count / contextCount
    with backoff *= 0.4 per level (also when the context is absent).
    Results sort by (score desc, key asc), truncated to ``num``.

    The model is a distributed table; each level's candidate fetch is one
    startswith-filtered orderBy/limit job (prefix pushed to the scan),
    collected because num is tiny. Returns [(text, score)] with tokens
    joined by a space in ``text``. For online/QPS use, wrap the model in
    :class:`FreeTextSuggester`, which serves warm lookups with ZERO Spark
    jobs from a driver-resident copy (the reference serves from an in-RAM
    FST, FreeTextSuggester.java:400)."""
    # totTokens = total unigram occurrences
    tot = (
        model.filter(~F.col("gram").contains(FREE_TEXT_SEP))
        .agg(F.sum("cnt"))
        .collect()[0][0]
        or 0
    )

    def fetch(token: str, limit: int) -> list:
        return [
            (r["gram"], int(r["cnt"]))
            for r in (
                model.filter(F.col("gram").startswith(token))
                # completions stay within the final word (the TopNSearcher
                # rejects paths through another separator)
                .filter(
                    ~F.expr(
                        f"substring(gram, {len(token) + 1})"
                    ).contains(FREE_TEXT_SEP)
                )
                .orderBy(F.desc("cnt"), F.asc("gram"))
                .limit(limit)
                .collect()
            )
        ]

    def ctx_count(ctx: str) -> int:
        return int(model.filter(F.col("gram") == ctx).collect()[0]["cnt"])

    return _stupid_backoff(key, num, grams, analyze, tot, fetch, ctx_count)


def _stupid_backoff(
    key: str, num: int, grams: int, analyze, tot: int, fetch, ctx_count
) -> list:
    """The backoff walk shared by the distributed and driver-cached
    lookups. ``fetch(token, limit)`` returns up to ``limit`` (gram, cnt)
    pairs with prefix ``token`` and no separator past it, ordered by
    (cnt desc, gram asc); ``ctx_count(ctx)`` is the exact count of the
    context gram (which always exists when any extension does)."""
    if analyze is None:
        from ..analysis import standard_analyze

        analyze = standard_analyze
    toks = analyze(key)
    if not toks:
        raise ValueError("no tokens produced by analyzer")
    last_tokens: list = [None] * grams
    for g in range(1, grams + 1):
        if len(toks) >= g:
            last_tokens[g - 1] = FREE_TEXT_SEP.join(toks[-g:])
    last_ended = key != key.rstrip() or (
        len(key) > 0 and not key[-1].isalnum() and key[-1] != "_"
    )
    if last_ended:
        for i in range(grams - 1, 0, -1):
            if last_tokens[i - 1] is not None:
                last_tokens[i] = last_tokens[i - 1] + FREE_TEXT_SEP
        last_tokens[0] = ""

    backoff = 1.0
    seen: set = set()
    results: list = []
    for gram in range(grams - 1, -1, -1):
        token = last_tokens[gram]
        if token is None or (token == "" and len(key) > 0):
            continue
        cands = fetch(token, num + len(seen))
        if not cands:  # no gram extends this prefix: prefixOutput null
            backoff *= FREE_TEXT_ALPHA
            continue
        # context = everything before the last separator; the context
        # gram always exists when the prefix does (all orders stored)
        cc = tot
        sep_at = token.rfind(FREE_TEXT_SEP)
        if sep_at >= 0:
            cc = ctx_count(token[:sep_at])
        added = 0
        for full, cnt in cands:
            if added >= num:
                break
            last_word = full.rsplit(FREE_TEXT_SEP, 1)[-1]
            if last_word in seen:
                continue
            seen.add(last_word)
            score = backoff * float(cnt) / float(cc)
            results.append((full.replace(FREE_TEXT_SEP, " "), score))
            added += 1
        backoff *= FREE_TEXT_ALPHA
    results.sort(key=lambda kv: (-kv[1], kv[0]))
    return results[:num]


class FreeTextSuggester:
    """Driver-cached FreeTextSuggester serving path. The reference answers
    lookups from an in-RAM FST (suggest/analyzing/FreeTextSuggester.java:
    400-560); the analog here snapshots the (gram, cnt) model to the driver
    at construction — capacity-gated by LUCENE_SPARK_DRIVER_META_MAX like
    every other driver cache (see prune._driver_meta_max) — so a warm
    lookup runs ZERO Spark jobs: prefix ranges are two bisects on the
    gram-sorted snapshot, context counts are exact bisect hits. Above the
    cap the snapshot is skipped (fetch stops at cap+1 rows) and lookups
    fall back to the distributed `free_text_lookup` path, which stays the
    right tier for models that cannot fit on one machine."""

    def __init__(self, model: DataFrame, grams: int = 2, analyze=None):
        from ..prune import _driver_meta_max

        self.model = model
        self.grams = int(grams)
        self.analyze = analyze
        self._grams_arr = None
        self._cnt = None
        self._tot = 0
        cap = _driver_meta_max()
        rows = model.limit(cap + 1).collect() if cap > 0 else []
        if cap > 0 and len(rows) <= cap:
            pairs = sorted((r["gram"], int(r["cnt"])) for r in rows)
            self._grams_arr = [g for g, _ in pairs]
            self._cnt = [c for _, c in pairs]
            self._tot = sum(
                c for g, c in pairs if FREE_TEXT_SEP not in g
            )

    @property
    def cached(self) -> bool:
        return self._grams_arr is not None

    def _fetch(self, token: str, limit: int) -> list:
        import bisect

        g, c = self._grams_arr, self._cnt
        lo = bisect.bisect_left(g, token) if token else 0
        # prefix successor: token with its last char bumped bounds the
        # prefix range (exact unless the last char is U+10FFFF)
        hi = (
            bisect.bisect_left(g, token[:-1] + chr(ord(token[-1]) + 1))
            if token and ord(token[-1]) < 0x10FFFF
            else len(g)
        )
        cands = [
            (g[i], c[i])
            for i in range(lo, hi)
            if g[i].startswith(token)
            and FREE_TEXT_SEP not in g[i][len(token):]
        ]
        cands.sort(key=lambda kv: (-kv[1], kv[0]))
        return cands[:limit]

    def _ctx_count(self, ctx: str) -> int:
        import bisect

        i = bisect.bisect_left(self._grams_arr, ctx)
        return self._cnt[i]

    def lookup(self, key: str, num: int = 10) -> list:
        if not self.cached:
            return free_text_lookup(
                self.model, key, num=num, grams=self.grams, analyze=self.analyze
            )
        return _stupid_backoff(
            key, num, self.grams, self.analyze, self._tot,
            self._fetch, self._ctx_count,
        )
