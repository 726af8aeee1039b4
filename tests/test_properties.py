"""Property-based tests (hypothesis): the engine's semantic rules hold
for arbitrary inputs, not just the curated fixtures.

Strategy notes: one shared SparkSession (conftest), small row counts
(Spark job dispatch dominates), deadline disabled (JVM warmup makes
wall-clock flaky), and examples capped to keep the suite fast.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rivulus_spark import DataType, LazyFrame, MixedTypesError, col, lit

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])

ints = st.integers(min_value=-2**40, max_value=2**40)
floats = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12)


@given(data=st.lists(st.one_of(ints, st.none()), min_size=1, max_size=8))
@SET
def test_int_column_roundtrip(spark, data):
    lf = LazyFrame.from_dataframe(spark, {"x": data})
    assert [r.x for r in lf.collect()] == data
    if any(v is not None for v in data):
        assert dict(lf.logical_schema)["x"] is DataType.INT64


@given(data=st.lists(st.one_of(ints, floats, st.none()),
                     min_size=1, max_size=8))
@SET
def test_mixed_numeric_promotes_to_float(spark, data):
    has_int = any(isinstance(v, int) for v in data)
    has_float = any(isinstance(v, float) for v in data)
    if not (has_int and has_float):
        return
    lf = LazyFrame.from_dataframe(spark, {"x": data})
    assert dict(lf.logical_schema)["x"] is DataType.FLOAT64
    got = [r.x for r in lf.collect()]
    for g, v in zip(got, data):
        assert (g is None) == (v is None)
        if v is not None:
            assert g == pytest.approx(float(v))


@given(data=st.lists(st.one_of(ints, st.text(max_size=5)),
                     min_size=2, max_size=8))
@SET
def test_int_string_mix_rejected(spark, data):
    has_int = any(isinstance(v, int) for v in data)
    has_str = any(isinstance(v, str) for v in data)
    if not (has_int and has_str):
        return
    with pytest.raises(MixedTypesError):
        LazyFrame.from_dataframe(spark, {"x": data})


@given(xs=st.lists(ints, min_size=1, max_size=8), threshold=ints)
@SET
def test_filter_matches_python_semantics(spark, xs, threshold):
    lf = LazyFrame.from_dataframe(spark, {"x": xs})
    got = sorted(r.x for r in lf.filter(col("x") > threshold).collect())
    assert got == sorted(v for v in xs if v > threshold)


@given(xs=st.lists(ints, min_size=1, max_size=8),
       ys=st.lists(ints, min_size=1, max_size=8))
@SET
def test_int_arithmetic_matches_python(spark, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    lf = LazyFrame.from_dataframe(spark, {"x": xs, "y": ys})
    out = lf.select((col("x") + col("y")).alias("s"),
                    (col("x") * lit(2)).alias("d")).collect()
    assert [r.s for r in out] == [a + b for a, b in zip(xs, ys)]
    assert [r.d for r in out] == [a * 2 for a in xs]


@given(texts=st.lists(
    st.text(alphabet=st.characters(codec="ascii",
                                   categories=("L", "N", "P", "Z")),
            max_size=60),
    min_size=1, max_size=6))
@SET
def test_pii_scrub_idempotent_and_clean(spark, texts):
    """Scrubbing is idempotent, and a scrubbed text contains no
    remaining PII matches (counts over scrubbed output are all 0)."""
    from rivulus_spark.operators import clean

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = df.select("doc_id", clean.pii_scrub("text").alias("text"))
    twice = once.select("doc_id", clean.pii_scrub("text").alias("text"))
    assert ({(r.doc_id, r.text) for r in once.collect()}
            == {(r.doc_id, r.text) for r in twice.collect()})
    residue = clean.pii_counts(once).agg({"n_pii": "sum"}).head()[0]
    assert residue in (0, None)


@given(keys=st.lists(st.integers(min_value=0, max_value=10**9),
                     min_size=1, max_size=40, unique=True))
@SET
def test_assign_splits_total_and_disjoint(spark, keys):
    """Every key gets exactly one split, and membership depends only
    on the key (stable under union with other keys)."""
    from rivulus_spark.operators import sample

    splits = {"a": 0.5, "b": 0.3, "c": 0.2}
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    full = {r.k: r.split for r in
            sample.assign_splits(df, splits, "k").collect()}
    assert set(full) == set(keys)
    half = spark.createDataFrame([(k,) for k in keys[::2]], "k long")
    sub = {r.k: r.split for r in
           sample.assign_splits(half, splits, "k").collect()}
    assert all(full[k] == v for k, v in sub.items())


@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=40),
       n=st.integers(min_value=1, max_value=6))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distributed_rank_matches_global_window(spark, vals, n):
    """add_ntile_percent_rank must equal Spark's own unpartitioned
    window for ANY data (duplicates, negatives, any n) — the unique
    tie-break id makes both totals deterministic."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rivulus_spark.operators import rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long")
    got = {r.id: (r.tile, round(r.pr, 12)) for r in
           rank.add_ntile_percent_rank(df, ["v", "id"], n=n,
                                       n_buckets=4).collect()}
    w = Window.orderBy("v", "id")
    want = {r.id: (r.tile, round(r.pr, 12)) for r in df.select(
        "id", F.ntile(n).over(w).cast("long").alias("tile"),
        F.percent_rank().over(w).alias("pr")).collect()}
    assert got == want


@given(n=st.integers(min_value=1, max_value=10 ** 12))
@settings(max_examples=200, deadline=None)
def test_adaptive_lsh_params_invariants(n):
    """For ANY corpus size: every band holds real bits (no zero-plane
    band -> no constant-key cross join), per-band widths differ by at
    most one bit (remainder distribution), MEAN occupancy is pinned
    near the target away from the width floor/cap (the r7 blended
    layout — no 2x sawtooth between width steps), and bands stay in
    [4, 16]."""
    from rivulus_spark.operators import similarity

    n_planes, bands = similarity.adaptive_lsh_params(n)
    widths = similarity.band_widths(n_planes, bands)
    assert sum(widths) == n_planes and len(widths) == bands
    assert 4 <= bands <= 16
    assert all(4 <= w <= 15 for w in widths)
    assert max(widths) - min(widths) <= 1
    occ = sum(n / 2 ** w for w in widths) / bands
    if min(widths) > 4 and max(widths) < 15:
        assert 0.8 * 8 <= occ <= 1.25 * 8
    else:
        assert occ <= 1.25 * 8 or max(widths) == 15


@given(n=st.integers(min_value=1, max_value=10 ** 12))
@settings(max_examples=200, deadline=None)
def test_adaptive_ann_params_invariants(n):
    """Bits bounded-occupancy (or at cap); the radius satisfies the
    r8 multiprobe recall model — design-point recall >= target, OR one
    more radius step would bust the mask budget — and the probe mask
    set is distinct with the exact Hamming-ball cardinality."""
    import math

    from rivulus_spark.operators import similarity

    bits, radius = similarity.adaptive_ann_params(n)
    assert 4 <= bits <= 15
    assert (n >> bits) <= 16 or bits == 15
    assert 1 <= radius <= bits
    n_masks = sum(math.comb(bits, i) for i in range(radius + 1))
    assert n_masks <= 600
    p_dis = math.acos(0.85) / math.pi
    assert (similarity._hamming_le(bits, p_dis, radius) >= 0.9
            or radius == bits
            or n_masks + math.comb(bits, radius + 1) > 600)
    masks = similarity.probe_masks(bits, radius)
    assert len(masks) == len(set(masks)) == n_masks
    assert all(0 <= m < (1 << bits) for m in masks)


@given(n_bits=st.integers(min_value=1, max_value=60),
       max_hamming=st.integers(min_value=0, max_value=16))
@settings(max_examples=200, deadline=None)
def test_simhash_band_layout_covers_all_bits(n_bits, max_hamming):
    """The remainder-distributed band layout partitions [0, n_bits)
    exactly: every band holds >=1 real bit (the guard rejects the
    rest), widths differ by at most 1, and bands are disjoint."""
    n_bands = max_hamming + 1
    if n_bands > n_bits:
        return  # operator raises; covered by unit test
    base_w, rem = divmod(n_bits, n_bands)
    widths = [base_w + 1 if j < rem else base_w for j in range(n_bands)]
    assert sum(widths) == n_bits
    assert all(w >= 1 for w in widths)
    assert max(widths) - min(widths) <= 1


# ---------------------------------------------------------------------
# round-7 operators
# ---------------------------------------------------------------------

words = st.sampled_from(["a", "b", "c", "ab", "the", "xy"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=6)


@given(texts=docs_strategy)
@SET
def test_repeated_spans_match_bruteforce(spark, texts):
    """repeated_spans == a brute-force Python replay of the spec on
    arbitrary tiny corpora: k-gram multiset counts, >= 2 occurrences
    anywhere, per-doc interval merge of [pos, pos+k-1] windows."""
    from collections import Counter

    from rivulus_spark.operators.dedup import repeated_spans

    k = 2
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.n_repeated_grams)
           for r in repeated_spans(df, k=k, min_repeats=2).collect()}

    toks = {i: (t.split() if t.strip() else []) for i, t in enumerate(texts)}
    counts = Counter()
    for ws in toks.values():
        for i in range(len(ws) - k + 1):
            counts[" ".join(ws[i:i + k])] += 1
    want = set()
    for d, ws in toks.items():
        hits = [i for i in range(len(ws) - k + 1)
                if counts[" ".join(ws[i:i + k])] >= 2]
        run = []
        for p in hits:
            if run and p <= run[-1][1] + 1:  # touches/overlaps coverage
                run[-1] = (run[-1][0], max(run[-1][1], p + k - 1),
                           run[-1][2] + 1)
            else:
                run.append((p, p + k - 1, 1))
            if len(run) >= 2 and run[-2][1] + 1 >= run[-1][0]:
                a, b = run.pop(-2), run.pop()
                run.append((a[0], max(a[1], b[1]), a[2] + b[2]))
        for s, e, n in run:
            want.add((d, s, e, n))
    assert got == want


@given(keys=st.lists(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=40, unique=True),
       probes=st.lists(st.integers(min_value=0, max_value=10**6),
                       min_size=1, max_size=40))
@SET
def test_bloom_never_drops_members(spark, keys, probes):
    """For ANY key set: every member survives the probe (the exactness
    of prefilter+verify rests on this); non-member survivors are
    allowed (false positives), never required."""
    from rivulus_spark.operators.bloom import (bloom_build, bloom_dims,
                                               bloom_prefilter)

    kdf = spark.createDataFrame([(k,) for k in keys], "h long")
    m, nh = bloom_dims(len(keys))
    bf = bloom_build(kdf, "h", m, nh)
    pdf = spark.createDataFrame([(p,) for p in probes], "h long")
    kept = {r.h for r in bloom_prefilter(pdf, "h", bf).collect()}
    assert set(probes) & set(keys) <= kept


@given(n=st.integers(min_value=1, max_value=60),
       shards=st.integers(min_value=1, max_value=5))
@SET
def test_global_shuffle_is_a_permutation(spark, n, shards):
    """For any n and shard count: positions within each shard are
    exactly 0..size-1, shard sizes differ by <= 1, and every key
    appears exactly once."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rivulus_spark.operators.sample import global_shuffle

    df = spark.range(0, n).select(F.col("id").alias("doc_id"))
    rows = global_shuffle(df, "doc_id", n_shards=shards,
                          seed="p").collect()
    assert sorted(r.doc_id for r in rows) == list(range(n))
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard_id].append(r.pos_in_shard)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) - min(sizes) <= 1
    for v in by_shard.values():
        assert sorted(v) == list(range(len(v)))


@given(texts=st.lists(
    st.lists(st.sampled_from(["ab", "aab", "abab", "ba", "bb", "a"]),
             min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=5))
@SET
def test_bpe_train_then_encode_matches_reference(spark, texts):
    """The full tokenizer loop on arbitrary tiny corpora: distributed
    training + encoding equals a single-threaded reference (dict
    trainer, greedy-leftmost apply in rank order) — same tie-break,
    same min-length contract, same per-doc piece counts."""
    from rivulus_spark.operators import bpe

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    merges_df = bpe.train_merges_from_docs(df, n_merges=3)
    got_merges = [(r.lhs, r.rhs, r.pair_count) for r in
                  merges_df.orderBy("merge_rank").collect()]

    # reference trainer (word table, min_len=2 — word_freqs contract)
    freqs = {}
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                freqs[w] = freqs.get(w, 0) + 1
    syms = {w: list(w) for w in freqs}
    ref_merges = []
    for _ in range(3):
        pc = {}
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + f
        if not pc:
            break
        (l, r), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ref_merges.append((l, r, c))
        for w, s in syms.items():
            out = [s[0]]
            for tok in s[1:]:
                if out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    assert got_merges == ref_merges

    # reference encode over ALL words (encode has no min-length gate)
    def apply(word):
        s = list(word)
        for l, r in [(m[0], m[1]) for m in ref_merges]:
            if len(s) < 2:
                break
            out = [s[0]]
            for tok in s[1:]:
                if out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            s = out
        return s

    want = {}
    for d, t in enumerate(texts):
        ws = t.split()
        if ws:
            want[d] = (len(ws), sum(len(apply(w)) for w in ws))
    got = {r.doc_id: (r.n_tokens, r.n_pieces) for r in
           bpe.encode_docs_with_merges(df, merges_df).collect()}
    assert got == want


# ---------------------------------------------------------------------
# round-8 operators
# ---------------------------------------------------------------------

@given(texts=docs_strategy,
       w=st.integers(min_value=1, max_value=5))
@SET
def test_winnow_matches_sequential_reference(spark, texts, w):
    """winnow_fingerprints == the textbook sequential winnower
    (rightmost minimal k-gram hash per w-window, whole-doc window for
    short docs) for ANY corpus and window width — positions, hashes,
    and equal-hash tie handling all exact."""
    import hashlib

    from rivulus_spark.operators.dedup import winnow_fingerprints

    k = 2
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.h))

    want: dict = {}
    for d, t in enumerate(texts):
        ws_ = t.split()
        grams = [" ".join(ws_[i:i + k]) for i in range(len(ws_) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 2**32
              for g in grams]
        if not hs:
            continue
        sel = set()
        ends = range(w - 1, len(hs)) if len(hs) >= w else [len(hs) - 1]
        for e in ends:
            lo = max(0, e - w + 1)
            win = hs[lo:e + 1]
            m = min(win)
            pos = lo + max(i for i, h in enumerate(win) if h == m)
            sel.add((pos, m))
        want[d] = sel
    assert got == want


@given(texts=docs_strategy)
@SET
def test_duplication_scores_match_bruteforce(spark, texts):
    """duplication_scores == a Python replay: per doc, the fraction of
    its DISTINCT k-shingles whose corpus doc-frequency is >= 2
    (floor-truncated to 3 decimals)."""
    import math as m
    from collections import Counter

    from rivulus_spark.operators.dedup import duplication_scores

    k = 2
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.dup_shingles, r.dup_frac)
           for r in duplication_scores(df, k=k).collect()}

    sets = {}
    for d, t in enumerate(texts):
        ws_ = t.split()
        s = {" ".join(ws_[i:i + k]) for i in range(len(ws_) - k + 1)}
        if s:
            sets[d] = s
    freq = Counter(sh for s in sets.values() for sh in s)
    want = {}
    for d, s in sets.items():
        dup = sum(1 for sh in s if freq[sh] >= 2)
        want[d] = (len(s), dup, m.floor(dup * 1000 / len(s)) / 1000)
    assert got == want


@given(texts=docs_strategy)
@SET
def test_pmi_matches_bruteforce(spark, texts):
    """pmi_collocations == a Python replay (same ln-sum order, floor6,
    rank by floored PMI desc then bigram) for ANY corpus, including
    empty-string docs (Spark's split(trim(x)) yields [''] — the replay
    must model that token)."""
    import math as m
    import re
    from collections import Counter

    from rivulus_spark.operators.text import pmi_collocations

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.bigram: (r.pair_count, r.pmi, r.rank) for r in
           pmi_collocations(df, k=1000, min_count=1).collect()}

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    uni, bg = Counter(), Counter()
    for t in texts:
        toks = ws.split(t.strip(" "))
        uni.update(toks)
        bg.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    n, mm = sum(uni.values()), sum(bg.values())
    want = {}
    for g, c in bg.items():
        x, y = g.split(" ", 1)
        v = (m.log(c) - m.log(mm) - m.log(uni[x]) - m.log(uni[y])
             + 2.0 * m.log(n))
        want[g] = (c, m.floor(v * 1_000_000) / 1_000_000)
    order = sorted(want, key=lambda g: (-want[g][1], g))
    want = {g: (want[g][0], want[g][1], i + 1)
            for i, g in enumerate(order)}
    assert got == want


@given(texts=docs_strategy)
@SET
def test_overlap_severity_matches_bruteforce(spark, texts):
    """overlap_severity == a Python replay: per train doc (odd ids),
    the floor3 fraction of its distinct k-shingles present in the eval
    (even ids) shingle union; untouched docs emit no row."""
    import math as m
    import re

    from rivulus_spark.operators.contamination import overlap_severity

    k = 2
    df = list(enumerate(texts))
    train = [(i, t) for i, t in df if i % 2 == 1]
    ev = [(i, t) for i, t in df if i % 2 == 0]
    if not train or not ev:
        return
    sdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(ev, "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_shared, r.overlap_frac)
           for r in overlap_severity(sdf, edf, k=k).collect()}

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def sh(t):
        toks = ws.split(t.strip(" "))
        return {" ".join(toks[i:i + k])
                for i in range(len(toks) - k + 1)}

    ev_set = set().union(*(sh(t) for _, t in ev)) if ev else set()
    want = {}
    for i, t in train:
        s = sh(t)
        shared = len(s & ev_set)
        if s and shared:
            want[i] = (len(s), shared,
                       m.floor(shared * 1000 / len(s)) / 1000)
    assert got == want


@given(texts=st.lists(
    st.text(alphabet=" \t\n\x0b\f\rabλ中.", min_size=0, max_size=24),
    min_size=1, max_size=6),
    lam_seed=st.integers(min_value=0, max_value=2**31))
@SET
def test_dsir_weight_expr_matches_python_reference(spark, texts, lam_seed):
    """The DSIR serving path (tokens + bigrams -> md5 bucket -> dense
    lam-array index -> exact integer sum -> one division) == a pure
    Python replay, on adversarial whitespace/unicode text and a RANDOM
    integer lam table. Injecting the table (instead of fitting it)
    removes the ln seam entirely, so every mismatch is a real
    tokenization/hashing/indexing/accumulation bug, never a 1-ulp
    float flake. Pins the split semantics the batch path inherits:
    SQL trim strips SPACES only, and Spark's split runs with
    limit=-1, which KEEPS leading and trailing empty fields (unlike
    Java String.split's default) — i.e. Python re.split exactly."""
    import hashlib
    import math as m
    import re

    from rivulus_spark.operators import dsir

    b = 64
    rnd = __import__("random").Random(lam_seed)
    lam_rows = [(i, rnd.randint(-10**10, 10**10)) for i in range(b)
                if rnd.random() < 0.8]
    default = rnd.randint(-10**10, 10**10)
    dense = [default] * b
    for i, v in lam_rows:
        dense[i] = v

    def spark_tokens(text):
        return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))

    def ref_weight(text):
        toks = spark_tokens(text)
        grams = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
        s = sum(dense[int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                      % b] for g in grams)
        return m.floor(s / len(grams) / 1000.0) / 1_000_000

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    expr = dsir.dsir_weight_expr(lam_rows, default, n_buckets=b)
    got = {r.doc_id: r.w for r in
           df.select("doc_id", expr.alias("w")).collect()}
    want = {i: ref_weight(t) for i, t in enumerate(texts)}
    assert got == want
