"""Exact substring dedup: suffix-array per-partition tool + the
corpus-level exact driver's kernel pieces.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") removes every substring of >= L tokens that occurs more than
once in the corpus, found with a single-machine suffix array. At
10^12-turn scale one machine cannot hold the array, so this module
splits the problem the Spark way:

  - WITHIN a partition: `repeated_intervals` builds a real suffix array
    (numpy prefix-doubling, Kasai LCP) over the partition's concatenated
    token stream and returns the exact maximal intervals whose L-token
    windows repeat — the classic tool, unchanged, just scoped to a task.
    `partition_repeats` runs it under mapInPandas.
  - ACROSS partitions: queries.py's `dedup_substr_exact` finds the same
    intervals corpus-wide with the shuffle-friendly equivalence
    "a substring of >= L tokens repeats iff each of its L-token windows
    repeats": window hashes (8 bytes/row, never the text) shuffle once,
    candidate hash groups are re-verified against the TRUE window text
    (so hash collisions cannot fabricate a duplicate — the answer is
    exact, the hash only prunes), and surviving positions merge into
    maximal intervals with one per-doc window pass.

Both produce Lee-et-al semantics; the SA form additionally catches
repeats *within* the same document at full fidelity in one pass and is
the right kernel when a partition is one tenant's corpus.
"""

from __future__ import annotations

import numpy as np


def suffix_array(a: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence by prefix doubling
    (O(n log^2 n) with numpy lexsort — no comparison-callback Python).
    Returns positions sorted by suffix order."""
    a = np.asarray(a, dtype=np.int64)
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks = values themselves (any order-preserving map works)
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]) with -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # recompute ranks: increment where the (pair) key changes
        r1, r2 = rank[order], second[order]
        changed = np.ones(n, dtype=np.int64)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all distinct: done
            return order
        k <<= 1
        if k >= n:
            return np.lexsort((idx, rank))


def lcp_array(a: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1],
    sa[i] (lcp[0] = 0). The h-decrement loop is O(n) total; the inner
    extension is per-position but bounded by the same O(n) amortization
    Kasai proves — fine for a task-sized partition."""
    a = np.asarray(a, dtype=np.int64)
    n = len(a)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and a[i + h] == a[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def repeated_intervals(token_docs: list[list[str]], min_tokens: int
                       ) -> list[tuple[int, int, int]]:
    """Exact maximal repeated intervals over a list of token sequences:
    (doc_index, start_tok, end_tok) 1-based inclusive, where every
    min_tokens-window inside [start, end] occurs at least twice in the
    whole input (any doc, including the same one). Suffix-array exact —
    no hashing anywhere."""
    if not token_docs:
        return []
    # factorize tokens to ints; separate docs with unique sentinels so
    # no match crosses a doc boundary
    vocab: dict[str, int] = {}
    seq: list[int] = []
    doc_of: list[int] = []
    pos_of: list[int] = []
    sent = -1
    for di, toks in enumerate(token_docs):
        if di > 0:
            seq.append(sent)   # unique negative per boundary
            doc_of.append(-1)
            pos_of.append(-1)
            sent -= 1
        for pi, t in enumerate(toks):
            seq.append(vocab.setdefault(t, len(vocab)))
            doc_of.append(di)
            pos_of.append(pi + 1)
    a = np.asarray(seq, dtype=np.int64)
    n = len(a)
    if n == 0:
        return []
    sa = suffix_array(a)
    lcp = lcp_array(a, sa)
    # position p's window repeats iff LCP with either SA neighbor >= w
    # (suffixes sharing a >= w prefix are SA-adjacent through a chain of
    # lcp >= w entries, so checking both neighbors is exhaustive)
    w = min_tokens
    cov_sa = np.zeros(n, dtype=bool)
    ge = lcp >= w
    cov_sa |= ge                       # shares >= w with previous suffix
    cov_sa[:-1] |= ge[1:]              # ... or with the next one
    covered = np.zeros(n, dtype=bool)
    covered[sa] = cov_sa
    # merge covered window-start positions into maximal intervals with
    # the same island rule as the corpus-level query: windows at p and
    # p' overlap-or-touch iff p' <= p + w, so a gap > w breaks the run.
    # (A suffix shorter than w inside its doc can't be covered: LCP never
    # crosses the unique sentinels, so lcp >= w implies w real tokens.)
    from collections import defaultdict
    cov_pos: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        if covered[i] and doc_of[i] >= 0:
            cov_pos[doc_of[i]].append(pos_of[i])
    out: list[tuple[int, int, int]] = []
    for di in sorted(cov_pos):
        ps = sorted(cov_pos[di])
        s = prev = ps[0]
        for p in ps[1:]:
            if p > prev + w:
                out.append((di, s, prev + w - 1))
                s = p
            prev = p
        out.append((di, s, prev + w - 1))
    return out


def partition_repeats(docs, min_tokens: int = 8):
    """Distributed wrapper: run the exact SA kernel per partition.

    `docs` is a DataFrame with (doc_id, text); output one row per
    maximal intra-partition repeated interval (doc_id, start_tok,
    end_tok). Results depend on which docs share a partition — callers
    wanting corpus-global exactness either repartition a tenant's docs
    together or run queries.py's dedup_substr_exact, which reconciles
    across partitions. Arrow-batched mapInPandas; the SA kernel is pure
    numpy."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("start_tok", T.LongType()),
        T.StructField("end_tok", T.LongType()),
    ])

    def run(pdfs):
        import pandas as pd
        ids: list[int] = []
        toks: list[list[str]] = []
        for pdf in pdfs:
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                ids.append(int(did))
                toks.append([t for t in (txt or "").split(" ") if t])
        if not ids:
            return
        ivs = repeated_intervals(toks, min_tokens)
        yield pd.DataFrame(
            {"doc_id": [ids[d] for d, _s, _e in ivs],
             "start_tok": [s for _d, s, _e in ivs],
             "end_tok": [e for _d, _s, e in ivs]})

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)
