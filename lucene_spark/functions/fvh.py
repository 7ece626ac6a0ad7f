"""FastVectorHighlighter (highlighter/vectorhighlight/): term-vector
(offset) driven highlighting — FieldTermStack (query-term occurrences
with char offsets), FieldPhraseList (greedy trie match over the stack,
longest valid prefix fallback, no-overlap dedup), BaseFragListBuilder's
windowing ported literally (margin 6, minFragCharSize = 3*margin,
acceptPhrase, the two-step spanStart/spanEnd recentering,
BaseFragListBuilder.java:36-75) and SimpleFieldFragList scoring
(fragment score = Σ matched-phrase boosts). Queries: TermQuery and
PhraseQuery — slop validated per adjacent pair (isValidTermOrPhrase,
FieldQuery.java:459-476) and overlapping same-slop phrases expanded to
their merged span (FieldQuery.expand, :176-260); snippets wrap matches
in ``tag_pre``/``tag_post`` like BaseFragmentsBuilder.makeFragment.

Typically applied to the TOP-K docs (join the hits first) — the kernel
is one Arrow-batched pass over (doc_id, text); offsets come from
re-tokenizing with spans, the moral equivalent of reading the
offsets-enabled term vector."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..analysis import _TOKEN_PATTERN
from ..query import PhraseQuery, Query, TermQuery

MARGIN_DEFAULT = 6
MIN_FRAG_CHAR_SIZE_FACTOR = 3


def _expand_queries(queries: Sequence[Query]) -> List[Query]:
    """FieldQuery.expand (FieldQuery.java:176-260): same-slop PhraseQuery
    pairs whose terms overlap suffix-to-prefix also register their merged
    phrase, so e.g. {"b c", "c d"} highlights a contiguous "b c d" as one
    span. Mirrors checkOverlap exactly: for every split point i >= 1 of
    src, the tail src[i:] must equal the head of dest and dest must
    extend past it (src.length - i < dest.length); the merged phrase
    keeps the pair's slop and — a reference quirk worth preserving —
    always carries boost 1 (FieldQuery.java:255-257 wraps in
    BoostQuery(pq, 1f))."""
    out: List[Query] = list(queries)
    phrases = [q for q in queries if isinstance(q, PhraseQuery)]
    seen = {(tuple(q.terms), int(q.slop)) for q in phrases}

    def check_overlap(src, dest, slop):
        for i in range(1, len(src)):
            overlap = True
            for j in range(i, len(src)):
                if (j - i) < len(dest) and src[j] != dest[j - i]:
                    overlap = False
                    break
            if overlap and len(src) - i < len(dest):
                merged = tuple(src) + tuple(dest[len(src) - i:])
                key = (merged, slop)
                if key not in seen:
                    seen.add(key)
                    out.append(
                        PhraseQuery(terms=merged, slop=slop, boost=1.0)
                    )

    for ai, a in enumerate(phrases):
        for b in phrases[ai + 1:]:
            if int(a.slop) != int(b.slop):
                continue
            check_overlap(list(a.terms), list(b.terms), int(a.slop))
            check_overlap(list(b.terms), list(a.terms), int(b.slop))
    return out


def _build_trie(queries: Sequence[Query]) -> dict:
    """QueryPhraseMap analog: nested {term: [children, boost-or-None,
    slop]} (markTerminal stores the phrase's slop with the boost,
    FieldQuery.java:427-432)."""
    root: dict = {}
    for q in queries:
        if isinstance(q, TermQuery):
            path, boost, slop = (q.term,), q.boost, 0
        elif isinstance(q, PhraseQuery):
            path, boost, slop = tuple(q.terms), q.boost, int(q.slop)
        else:
            raise NotImplementedError(
                f"FVH supports TermQuery/PhraseQuery, got {type(q).__name__}"
            )
        node = root
        child = None
        for t in path:
            if t not in node:
                node[t] = [{}, None, 0]
            child = node[t]
            node = child[0]
        # markTerminal(slop, boost) — FieldQuery.java:427-432
        child[1] = float(boost)
        child[2] = slop
    return root


def _phrase_infos(tokens: List[Tuple[str, int, int, int]], trie: dict):
    """FieldPhraseList.java:15-65: greedy longest trie match over the
    query-term stack; fall back to the longest valid prefix; skip
    overlapping matches (addIfNoOverlap). tokens = (term, pos, start,
    end) of QUERY terms only, position order. Returns [(start, end,
    boost)]."""
    infos: List[Tuple[int, int, float]] = []
    i = 0
    n = len(tokens)
    while i < n:
        term, pos, _s, _e = tokens[i]
        if term not in trie:
            i += 1
            continue
        # extend the candidate while the trie continues — position gaps
        # are NOT checked here; isValidTermOrPhrase validates them
        # against the terminal's slop (FieldQuery.java:459-476)
        cand = [tokens[i]]
        node = trie[term]
        j = i + 1
        while j < n:
            t2 = tokens[j][0]
            if t2 not in node[0]:
                break
            node = node[0][t2]
            cand.append(tokens[j])
            j += 1

        def _valid(nd, c):
            if nd[1] is None:
                return False
            if len(c) == 1:
                return True
            pos = c[0][1]
            for _t, npos, _s, _e in c[1:]:
                if abs(npos - pos - 1) > nd[2]:
                    return False
                pos = npos
            return True

        # longest valid prefix that is a terminal
        while cand:
            nd = trie[cand[0][0]]
            valid = True
            for t3, _p, _s3, _e3 in cand[1:]:
                if t3 not in nd[0]:
                    valid = False
                    break
                nd = nd[0][t3]
            ok = valid and _valid(nd, cand)
            node = nd
            if ok:
                start = cand[0][2]
                end = cand[-1][3]
                boost = node[1]
                if not infos or start >= infos[-1][1]:  # addIfNoOverlap
                    infos.append((start, end, boost, len(cand)))
                    i += len(cand)
                else:
                    i += 1
                break
            cand.pop()
        else:
            i += 1
    return infos


def _frag_list(infos, frag_char_size: int, margin: int):
    """BaseFragListBuilder.createFieldFragList (:36-75), literal port.
    Returns [(span_start, span_end, [infos...])]."""
    min_frag = max(1, margin * MIN_FRAG_CHAR_SIZE_FACTOR)
    if frag_char_size < min_frag:
        raise ValueError(f"fragCharSize({frag_char_size}) is too small")
    frags = []
    start_offset = 0
    qi = 0
    n = len(infos)
    while qi < n:
        info = infos[qi]
        if info[0] < start_offset:
            qi += 1
            continue
        wpil = []
        cur_start = info[0]
        cur_end = info[1]
        span_start = max(cur_start - margin, start_offset)
        span_end = max(cur_end, span_start + frag_char_size)
        if _accept(info, cur_end - cur_start, frag_char_size):
            wpil.append(info)
        qi += 1
        while qi < n:
            nxt = infos[qi]
            if nxt[1] <= span_end:
                cur_end = nxt[1]
                if _accept(nxt, cur_end - cur_start, frag_char_size):
                    wpil.append(nxt)
                qi += 1
            else:
                break
        if not wpil:
            continue
        match_len = cur_end - cur_start
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = cur_start - new_margin
        if span_start < start_offset:
            span_start = start_offset
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        frags.append((span_start, span_end, wpil))
    return frags


def _accept(info, match_length: int, frag_char_size: int) -> bool:
    # acceptPhrase (BaseFragListBuilder.java:77-79): single-term infos
    # always accepted; multi-term phrases only when the accumulated match
    # fits the fragment
    return info[3] <= 1 or match_length <= frag_char_size


def fvh_highlight(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    queries: Sequence[Query],
    frag_char_size: int = 100,
    margin: int = MARGIN_DEFAULT,
    top_n: int = 1,
    tag_pre: str = "<b>",
    tag_post: str = "</b>",
    sort_by_score: bool = True,
) -> DataFrame:
    """→ (doc_id, frag_no, frag_start, frag_end, score, snippet): the
    ``top_n`` best fragments per matching doc — best = highest total
    boost then earliest (ScoreOrderFragmentsBuilder), or positional
    order when ``sort_by_score`` is False (SimpleFragmentsBuilder)."""
    trie = _build_trie(_expand_queries(queries))
    qterms = set()

    def walk(node, path):
        for t, child in node.items():
            qterms.add(t)
            walk(child[0], path + (t,))

    walk(trie, ())
    fcs, mg, tn = int(frag_char_size), int(margin), int(top_n)

    def run(it):
        for pdf in it:
            out = {
                "doc_id": [], "frag_no": [], "frag_start": [],
                "frag_end": [], "score": [], "snippet": [],
            }
            for did, text in zip(pdf[doc_id_col], pdf[text_col]):
                if text is None:
                    continue
                toks = []
                pos = 0
                for m in _TOKEN_PATTERN.finditer(text):
                    t = m.group().lower()
                    if t in qterms:
                        toks.append((t, pos, m.start(), m.end()))
                    pos += 1
                if not toks:
                    continue
                infos = _phrase_infos(toks, trie)
                if not infos:
                    continue
                frags = _frag_list(infos, fcs, mg)
                if sort_by_score:
                    scored = sorted(
                        enumerate(frags),
                        key=lambda kv: (-sum(i[2] for i in kv[1][2]), kv[0]),
                    )[:tn]
                else:
                    scored = list(enumerate(frags))[:tn]
                for rank, (idx, (fs, fe, wpil)) in enumerate(scored):
                    fe_c = min(fe, len(text))
                    parts = []
                    cur = fs
                    for s, e, _b, _n in wpil:
                        parts.append(text[cur:s])
                        parts.append(tag_pre + text[s:e] + tag_post)
                        cur = e
                    parts.append(text[cur:fe_c])
                    out["doc_id"].append(int(did))
                    out["frag_no"].append(rank)
                    out["frag_start"].append(int(fs))
                    out["frag_end"].append(int(fe))
                    out["score"].append(float(sum(i[2] for i in wpil)))
                    out["snippet"].append("".join(parts))
            yield pd.DataFrame(out)

    return docs.select(
        F.col(doc_id_col), F.col(text_col)
    ).mapInPandas(
        run,
        "doc_id long, frag_no int, frag_start long, frag_end long, "
        "score double, snippet string",
    )
