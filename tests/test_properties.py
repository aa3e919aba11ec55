"""Property-based spot checks (SURVEY §5.4): algebraic identities that must
hold for ANY input, exercised on small hypothesis-generated frames. Kept to
few examples per property — each example is a Spark job."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=30)
pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), st.integers(min_value=-1000, max_value=1000)),
    min_size=1,
    max_size=30,
)


@given(left=keys, right=keys)
@settings(**SETTINGS)
@pytest.mark.slow
def test_semi_union_anti_is_identity(spark, left, right):
    l_df = spark.createDataFrame([(k,) for k in left] or [(None,)], "k int").where(F.col("k").isNotNull())
    r_df = spark.createDataFrame([(k,) for k in right] or [(None,)], "k int").where(F.col("k").isNotNull())
    semi = {r.k for r in l_df.join(r_df, "k", "left_semi").collect()}
    anti = {r.k for r in l_df.join(r_df, "k", "left_anti").collect()}
    assert semi | anti == set(left)
    assert not (semi & anti)
    assert semi == set(left) & set(right)


@given(rows=pairs)
@settings(**SETTINGS)
def test_window_top1_equals_groupby_max(spark, rows):
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "k int, v int")
    w = Window.partitionBy("k").orderBy(F.desc("v"))
    top1 = {
        (r.k, r.v)
        for r in df.withColumn("rn", F.row_number().over(w)).where("rn = 1").select("k", "v").collect()
    }
    gmax = {(r.k, r.mx) for r in df.groupBy("k").agg(F.max("v").alias("mx")).collect()}
    assert top1 == gmax


@given(rows=pairs)
@settings(**SETTINGS)
def test_rollup_margin_equals_reaggregation(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    out = df.rollup("k").agg(F.sum("v").alias("s")).collect()
    grand = [r.s for r in out if r.k is None and True]
    # k is never None in input, so exactly one all-None margin row exists
    assert sum(v for _, v in rows) in grand


@given(a=keys, b=keys)
@settings(**SETTINGS)
@pytest.mark.slow
def test_union_all_vs_distinct_counts(spark, a, b):
    a_df = spark.createDataFrame([(k,) for k in a] or [(None,)], "k int").where(F.col("k").isNotNull())
    b_df = spark.createDataFrame([(k,) for k in b] or [(None,)], "k int").where(F.col("k").isNotNull())
    assert a_df.unionAll(b_df).count() == len(a) + len(b)
    assert a_df.union(b_df).distinct().count() == len(set(a) | set(b))


@given(rows=pairs, k=st.integers(min_value=2, max_value=7))
@settings(**SETTINGS)
@pytest.mark.slow
def test_exact_ntile_scores_matches_window_ntile(spark, rows, k):
    """The distributed exact-ntile decomposition (userportrait/ranking.py)
    must be bitwise-equal to ntile(k) OVER (ORDER BY v, uid) for ANY data —
    heavy ties, n < k, skewed values — not just the certified fixtures."""
    from pyspark.sql import Window

    from userportrait.ranking import exact_ntile_scores

    uniq = [(i, v) for i, (_, v) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "uid int, v int")
    got = {
        (r.uid, r.score)
        for r in exact_ntile_scores(df, [(F.col("v"), "uid", "score")], k=k, npart=4).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("uid"))
    want = {
        (r.uid, r.score)
        for r in df.select("uid", F.ntile(k).over(w).alias("score")).collect()
    }
    assert got == want


@given(
    base=st.text(alphabet="abcdef ", min_size=40, max_size=80),
    mutations=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_minhash_similarity_tracks_jaccard(spark, base, mutations):
    """The 16-signature MinHash agreement fraction must track true shingle
    Jaccard: identical docs agree on all 16 signatures; lightly mutated
    docs agree on at least as many signatures as heavily unrelated ones
    (driver-side recomputation of the exact same md5 hash family)."""
    import hashlib

    def shingles(t):
        t = t if len(t) >= 5 else t + "x" * (5 - len(t))
        return {t[i : i + 5] for i in range(len(t) - 4)}

    def sigs(t):
        sh = shingles(t)
        return [
            min(hashlib.md5(f"{s}|{x}".encode()).hexdigest() for x in sh)
            for s in range(16)
        ]

    other = base[:len(base) - mutations] + "zzzz"[: mutations or 0]
    a, b = sigs(base), sigs(base)
    assert sum(x == y for x, y in zip(a, b)) == 16  # identical -> all agree
    c = sigs(other)
    agree = sum(x == y for x, y in zip(a, c))
    sa, sc = shingles(base), shingles(other)
    jac = len(sa & sc) / len(sa | sc)
    # agreement/16 is an unbiased estimator of jaccard; with 16 samples allow
    # a wide but non-vacuous band
    assert abs(agree / 16 - jac) <= 0.5, (agree, jac)


day_sets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=25)),
    min_size=1,
    max_size=40,
)


@given(pairs=day_sets)
@settings(**SETTINGS)
def test_gaps_islands_streak_matches_bruteforce(spark, pairs):
    """The gaps-and-islands decomposition (island = dayno - row_number) must
    equal the brute-force longest-consecutive-run for ANY (user, day) set."""
    from pyspark.sql import Window

    df = spark.createDataFrame(list(set(pairs)), "user_id int, dayno int")
    w = Window.partitionBy("user_id").orderBy("dayno")
    streaks = (
        df.withColumn("grp", F.col("dayno") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("best"))
    )
    got = {r.user_id: r.best for r in streaks.collect()}
    by_user = {}
    for u, d in set(pairs):
        by_user.setdefault(u, set()).add(d)
    for u, days in by_user.items():
        best = cur = 1
        prev = None
        for d in sorted(days):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, cur)
            prev = d
        assert got[u] == best, (u, sorted(days), got[u], best)


@given(pairs=day_sets)
@settings(**SETTINGS)
def test_transition_counts_match_bruteforce(spark, pairs):
    """lag-window transition counting must equal a sequential walk of each
    user's ordered event list, for ANY sequence (incl. dup timestamps
    resolved by the unique event_id tie-break)."""
    from pyspark.sql import Window

    rows = [(i, u, t % 3) for i, (u, t) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "event_id int, user_id int, et int")
    w = Window.partitionBy("user_id").orderBy("event_id")
    got = {
        (r.prev, r.et): r.n
        for r in df.select("et", F.lag("et").over(w).alias("prev"))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "et")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expect = {}
    by_user = {}
    for i, u, t in rows:
        by_user.setdefault(u, []).append((i, t))
    for u, seq in by_user.items():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    assert got == expect


texts = st.lists(
    st.text(alphabet="abcd ", min_size=5, max_size=40),
    min_size=2,
    max_size=8,
)


@given(docs=texts)
@settings(**SETTINGS)
@pytest.mark.slow
def test_jaccard_kernel_matches_bruteforce(spark, docs):
    """The array_intersect Jaccard kernel (r8 rewrite of
    _jaccard_on_candidates) must equal a brute-force python computation of
    distinct-5-gram-shingle Jaccard on EVERY candidate pair, for arbitrary
    short texts — guards the kernel swap against off-by-one shingle windows,
    empty-intersection handling, and duplicate-shingle miscounts."""
    from userportrait.ops.llm_dedup import JACCARD_MIN, _jaccard_on_candidates

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    cand_rows = [(a, b) for a in range(len(docs)) for b in range(a + 1, len(docs))]
    cand = spark.createDataFrame(cand_rows, "doc_a long, doc_b long")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _jaccard_on_candidates(d, cand).collect()
    }

    def shingles(t):
        n = max(len(t) - 4, 1)
        return {t[i : i + 5] for i in range(n)}

    # Spark's F.round is HALF_UP; python round() is banker's — quantize
    # explicitly so a tie like 17/32 = 0.53125 can't flake the compare.
    from decimal import ROUND_HALF_UP, Decimal

    want = {}
    for a, b in cand_rows:
        sa, sb = shingles(docs[a]), shingles(docs[b])
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= JACCARD_MIN:
            want[(a, b)] = float(
                Decimal(repr(jac)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
            )
    assert got == want


zpairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**9), st.integers(min_value=0, max_value=10**9)),
    min_size=1,
    max_size=20,
)


@given(rows=zpairs)
@settings(**SETTINGS)
def test_zorder_morton_matches_bruteforce(spark, rows):
    """sink_zorder_layout's SQL bit-interleave must equal a reference
    Morton encoder for any key pair (mod-1024 keys, 20-bit codes)."""
    from userportrait.ops.quality import _z_expr_spark

    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = [
        r.z
        for r in df.select(F.expr(_z_expr_spark()).cast("bigint").alias("z")).collect()
    ]

    def morton(k1, k2):
        k1, k2, z = k1 % 1024, k2 % 1024, 0
        for i in range(10):
            z |= ((k1 >> i) & 1) << (2 * i + 1)
            z |= ((k2 >> i) & 1) << (2 * i)
        return z

    assert got == [morton(a, b) for a, b in rows]


edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
    min_size=1,
    max_size=20,
).filter(lambda es: any(a != b for a, b in es))


@given(edges=edges_strategy)
@settings(**SETTINGS)
@pytest.mark.slow
def test_lpa_sweeps_match_khop_bfs(spark, edges):
    """graph_label_propagation's sweep loop must assign every node the min
    node id within its 3-hop neighborhood — checked against an independent
    pure-python BFS on arbitrary random graphs."""
    from userportrait.ops.quality import lpa_min_label_sweeps

    es = [(a, b) for a, b in edges if a != b]
    sym_rows = [(a, b) for a, b in es] + [(b, a) for a, b in es]
    sym = spark.createDataFrame(sym_rows, "src long, dst long")
    caches = []
    got = {r.node: r.label for r in lpa_min_label_sweeps(sym, 3, caches).collect()}
    for c in caches:  # don't accumulate cached blocks across examples
        c.unpersist()

    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node in adj:
        frontier, seen = {node}, {node}
        for _ in range(3):
            frontier = {n for f in frontier for n in adj[f]} - seen
            seen |= frontier
        assert got[node] == min(seen), node


boxes = st.tuples(
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
)
points = st.lists(
    st.tuples(st.integers(min_value=0, max_value=1023), st.integers(min_value=0, max_value=1023)),
    min_size=1,
    max_size=50,
)


@given(box=boxes, pts=points)
@settings(max_examples=50, deadline=None)
def test_z_box_ranges_cover_exactly(box, pts):
    """z_box_ranges is an EXACT cover: a point's Morton code falls inside
    the range union iff the point is inside the box — for any box and any
    point. (Pure python, no Spark: 50 examples are cheap.)"""
    from userportrait.zcurve import z_box_ranges, z_encode

    a, b, c, d = box
    x0, x1, y0, y1 = min(a, b), max(a, b), min(c, d), max(c, d)
    ranges = z_box_ranges(x0, x1, y0, y1)
    assert all(lo <= hi for lo, hi in ranges)
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    for x, y in pts:
        z = z_encode(x, y)
        inside_box = x0 <= x <= x1 and y0 <= y <= y1
        inside_ranges = any(lo <= z <= hi for lo, hi in ranges)
        assert inside_box == inside_ranges, (x, y, z)


@given(box=boxes)
@settings(max_examples=25, deadline=None)
def test_coarsened_ranges_are_a_superset(box):
    from userportrait.zcurve import coarsen_ranges, z_box_ranges

    a, b, c, d = box
    exact = z_box_ranges(min(a, b), max(a, b), min(c, d), max(c, d))
    coarse = coarsen_ranges(exact, 8)
    assert len(coarse) <= max(8, 1)
    # every exact range is contained in some coarse range
    for lo, hi in exact:
        assert any(clo <= lo and hi <= chi for clo, chi in coarse)


@given(box=boxes, pts=points)
@settings(max_examples=50, deadline=None)
def test_hilbert_box_ranges_cover_exactly(box, pts):
    """hilbert_box_ranges is an EXACT cover: a point's Hilbert index falls
    inside the range union iff the point is inside the box — this also
    proves the corner-entry construction (cell range = min corner d +
    size²-1) the cover relies on. (Pure python, no Spark.)"""
    from userportrait.hilbert import hilbert_box_ranges, hilbert_xy2d

    a, b, c, d = box
    x0, x1, y0, y1 = min(a, b), max(a, b), min(c, d), max(c, d)
    ranges = hilbert_box_ranges(x0, x1, y0, y1)
    assert all(lo <= hi for lo, hi in ranges)
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    for x, y in pts:
        h = hilbert_xy2d(x, y)
        inside_box = x0 <= x <= x1 and y0 <= y <= y1
        inside_ranges = any(lo <= h <= hi for lo, hi in ranges)
        assert inside_box == inside_ranges, (x, y, h)


def test_hilbert_curve_is_bijective_and_local():
    """hilbert_xy2d at small bit widths: a bijection onto [0, 4^bits) whose
    consecutive indices are ALWAYS grid-adjacent (Manhattan distance 1) —
    the no-diagonal-jumps locality property that distinguishes the layout
    from Morton order, where consecutive codes can jump across the grid."""
    from userportrait.hilbert import hilbert_xy2d

    for bits in (2, 3, 4):
        n = 1 << bits
        seen = {}
        for x in range(n):
            for y in range(n):
                dd = hilbert_xy2d(x, y, bits)
                assert 0 <= dd < n * n and dd not in seen
                seen[dd] = (x, y)
        for dd in range(n * n - 1):
            (xa, ya), (xb, yb) = seen[dd], seen[dd + 1]
            assert abs(xa - xb) + abs(ya - yb) == 1


def test_hilbert_covers_no_wider_than_zorder():
    """The headline locality claim, measured: across a grid of box shapes,
    the Hilbert cover never needs more ranges than the Morton cover needs
    on the same box family in aggregate (per-box either may win; the sum
    is what the BETWEEN-count budget sees)."""
    from userportrait.hilbert import hilbert_box_ranges
    from userportrait.zcurve import z_box_ranges

    boxes_ = [
        (x0, x0 + w, y0, y0 + h)
        for x0 in (0, 100, 511, 700)
        for y0 in (0, 37, 512, 900)
        for w, h in ((10, 10), (100, 30), (300, 300), (1023, 5))
        if x0 + w <= 1023 and y0 + h <= 1023
    ]
    n_h = sum(len(hilbert_box_ranges(*bx)) for bx in boxes_)
    n_z = sum(len(z_box_ranges(*bx)) for bx in boxes_)
    assert n_h <= n_z, (n_h, n_z)


events_seq = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.integers(min_value=0, max_value=50),         # ts (seconds)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=30,
)


@given(seq=events_seq)
@settings(**SETTINGS)
@pytest.mark.slow
def test_funnel_stage_chain_matches_sequential_walk(spark, seq):
    """The batch min-view/min-later-click/min-later-purchase chain (the
    stream_funnel_stages oracle algebra) must equal a sequential
    event-time walk of each user's stream applying the strict-progression
    state machine — for ANY event sequence, including ties (strict '>'
    makes tie order irrelevant) and stage events arriving 'out of order'
    in time. This is the equivalence the streaming op's incremental update
    relies on."""
    rows = [(u, t, e) for u, t, e in seq]
    df = spark.createDataFrame(rows, "user_id int, us long, event_type string")
    v = df.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("us").alias("v"))
    c = (
        df.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") > F.col("v"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c"))
    )
    p = (
        df.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") > F.col("c"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p"))
    )
    got = {
        r.user_id: (3 if r.p is not None else 2 if r.c is not None else 1)
        for r in v.join(c, "user_id", "left").join(p, "user_id", "left").collect()
    }

    # sequential strict-progression walk, sorted by (ts, type) like the op
    state: dict[int, list] = {}
    for u, t, e in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        vv, cc, pp = state.get(u, (None, None, None))
        if e == "view":
            if vv is None:
                vv = t
        elif e == "click":
            if cc is None and vv is not None and t > vv:
                cc = t
        elif e == "purchase":
            if pp is None and cc is not None and t > cc:
                pp = t
        state[u] = (vv, cc, pp)
    want = {
        u: (3 if pp is not None else 2 if cc is not None else 1)
        for u, (vv, cc, pp) in state.items()
        if vv is not None
    }
    assert got == want


@given(
    bounds=st.tuples(
        st.one_of(st.none(), st.integers(0, 63)),
        st.one_of(st.none(), st.integers(0, 63)),
        st.one_of(st.none(), st.integers(0, 63)),
        st.one_of(st.none(), st.integers(0, 63)),
    )
)
@settings(max_examples=60, deadline=None)
def test_onesided_covers_are_exact(bounds):
    """z/hilbert one-sided covers (VERDICT r9 missing #3): for ANY mix of
    open and closed sides, the clamped box cover contains exactly the
    curve indices of the points satisfying the (possibly one-sided)
    predicate — enumerated exhaustively on a 64x64 grid."""
    from userportrait.hilbert import hilbert_box_ranges, hilbert_xy2d
    from userportrait.zcurve import z_box_ranges, z_encode

    bits = 6
    dom = 2**bits - 1
    x_lo, x_hi, y_lo, y_hi = bounds
    bx = (
        0 if x_lo is None else x_lo,
        dom if x_hi is None else x_hi,
        0 if y_lo is None else y_lo,
        dom if y_hi is None else y_hi,
    )
    for ranges, enc in (
        (z_box_ranges(*bx, bits=bits), z_encode),
        (hilbert_box_ranges(*bx, bits=bits), hilbert_xy2d),
    ):
        covered = set()
        for lo, hi in ranges:
            covered.update(range(lo, hi + 1))
        want = {
            enc(x, y, bits)
            for x in range(dom + 1)
            for y in range(dom + 1)
            if bx[0] <= x <= bx[1] and bx[2] <= y <= bx[3]
        }
        assert covered == want


asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id
        st.integers(min_value=0, max_value=10),     # ts (seconds, ties likely)
        st.booleans(),                              # is_purchase (query side)
    ),
    min_size=1,
    max_size=25,
)


@given(rows=asof_events)
@settings(**SETTINGS)
def test_asof_forward_matches_bruteforce(spark, rows):
    """join_asof_forward's union+window construction vs the obviously
    correct form: for each purchase, the candidate with the smallest
    (ts, event_id) among same-user non-purchase events with STRICTLY
    larger ts — equal-ts candidates must never match (the role-ordering
    subtlety the op's window encodes)."""
    from userportrait.ops.joins import asof_forward_frame

    data = [
        (i, u, ts, "purchase" if is_p else "view")
        for i, (u, ts, is_p) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        [(i, u, float(ts), et) for i, u, ts, et in data],
        "event_id long, user_id long, ts double, event_type string",
    ).select(
        "event_id", "user_id", F.timestamp_seconds("ts").alias("ts"), "event_type"
    )
    got = {r.event_id: r.next_event_id for r in asof_forward_frame(ev).collect()}
    for qid, qu, qts, qet in data:
        if qet != "purchase":
            continue
        cands = [
            (ts, i) for i, u, ts, et in data if u == qu and et != "purchase" and ts > qts
        ]
        expect = min(cands)[1] if cands else None
        assert got[qid] == expect, (qid, got[qid], expect)


overlap_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),            # audience
        st.integers(min_value=0, max_value=40),      # member id
    ),
    min_size=1,
    max_size=40,
)


@given(rows=overlap_rows)
@settings(**SETTINGS)
def test_audience_overlap_matches_set_algebra(spark, rows):
    """tag_audience_overlap's bitmap identity (|A∩B| = |A|+|B|−|A∪B| per
    bucket) vs Python set intersection, on arbitrary membership frames —
    including audiences missing from some buckets (the null-skipping sum
    branch)."""
    from userportrait.ops.portrait import audience_overlap_frame

    fact = spark.createDataFrame(rows, "st string, member long")
    got = {
        (r.st_a, r.st_b): (r.n_a, r.n_b, r.n_inter) for r in audience_overlap_frame(fact).collect()
    }
    sets: dict[str, set] = {}
    for stt, m in rows:
        sets.setdefault(stt, set()).add(m)
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            assert got[(a, b)] == (
                len(sets[a]),
                len(sets[b]),
                len(sets[a] & sets[b]),
            ), (a, b, got.get((a, b)))
    assert len(got) == len(names) * (len(names) - 1) // 2


scd2_dim_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),                          # key
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),    # old bal
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
scd2_batch_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda t: t[0],
)


@given(dim=scd2_dim_rows, batch=scd2_batch_rows)
@settings(**SETTINGS)
@pytest.mark.slow
def test_scd2_merge_is_null_safe_and_replay_idempotent(spark, dim, batch):
    """scd2_merge_frame's NULL-payload semantics (the r11 VERDICT #3 class):
    'changed' must be IS DISTINCT FROM — a NULL payload over a non-NULL
    balance VERSIONS the row (and vice versa), NULL over NULL does not —
    and replaying the identical batch onto the merged state is a no-op
    (the new current version carries new_bal, so <=> holds)."""
    from collections import Counter

    from userportrait.ops.streaming import scd2_merge_frame

    eff = F.lit("2000-01-01").cast("timestamp")
    cur = spark.createDataFrame(
        [
            (k, float(b) if b is not None else None, 1, None, None, True)
            for k, b in dim
        ],
        "c_custkey long, c_acctbal double, version int, "
        "valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    bdf = spark.createDataFrame(
        [(k, float(b) if b is not None else None) for k, b in batch] or [(None, None)],
        "k long, new_bal double",
    ).where(F.col("k").isNotNull())
    merged = scd2_merge_frame(cur, bdf, eff)
    rows = merged.collect()
    bmap = dict(batch)
    for k, old in dim:
        # Python's != on Optional[int] IS the IS DISTINCT FROM reference.
        changed = k in bmap and bmap[k] != old
        got = sorted(
            (r.version, r.c_acctbal, r.is_current)
            for r in rows
            if r.c_custkey == k
        )
        old_f = float(old) if old is not None else None
        if changed:
            new_f = float(bmap[k]) if bmap[k] is not None else None
            assert got == [(1, old_f, False), (2, new_f, True)], (k, got)
        else:
            assert got == [(1, old_f, True)], (k, got)
    replay = scd2_merge_frame(merged, bdf, eff).collect()
    assert Counter(map(tuple, replay)) == Counter(map(tuple, rows))


@given(rows=asof_events)
@settings(**SETTINGS)
def test_asof_nearest_matches_bruteforce(spark, rows):
    """join_asof_nearest's two-carry construction vs the obviously
    correct form: for each purchase, the same-user non-purchase event
    minimizing (|Δts|, direction backward-first, then the per-side
    carry tie-break: backward keeps the LARGEST event_id at its ts,
    forward the SMALLEST) — equal-ts candidates excluded on both sides
    (the strictness both sibling ops share)."""
    from userportrait.ops.joins import asof_nearest_frame

    data = [
        (i, u, ts, "purchase" if is_p else "view")
        for i, (u, ts, is_p) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        [(i, u, float(ts), et) for i, u, ts, et in data],
        "event_id long, user_id long, ts double, event_type string",
    ).select(
        "event_id", "user_id", F.timestamp_seconds("ts").alias("ts"), "event_type"
    )
    got = {r.event_id: r.nearest_event_id for r in asof_nearest_frame(ev).collect()}
    for qid, qu, qts, qet in data:
        if qet != "purchase":
            continue
        cands = [
            (abs(ts - qts), ts > qts, -i if ts < qts else i)
            for i, u, ts, et in data
            if u == qu and et != "purchase" and ts != qts
        ]
        if cands:
            d, fwd, signed = min(cands)
            expect = signed if fwd else -signed
        else:
            expect = None
        assert got[qid] == expect, (qid, got[qid], expect)


wpct_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),                 # group
        st.integers(min_value=-5, max_value=5),      # x (ties likely)
        st.integers(min_value=1, max_value=4),       # weight
    ),
    min_size=1,
    max_size=30,
)


@given(rows=wpct_rows)
@settings(**SETTINGS)
def test_weighted_percentile_matches_bruteforce(spark, rows):
    """agg_weighted_percentile's cumulative-weight construction vs the
    obviously correct form: expand each row into `w` copies of x, sort,
    and take the element where the running count first reaches p·total
    (lower-bound definition). Exercises duplicate x values (the
    per-(group,x) pre-aggregate), threshold ties (2·cum == tot exactly),
    and single-row groups."""
    from userportrait.ops.aggregates import weighted_percentile_frame

    df = spark.createDataFrame(
        [(g, float(x), w) for g, x, w in rows], "flag string, x double, w long"
    )
    got = {r.flag: (r.p50_weighted, r.p90_weighted) for r in weighted_percentile_frame(df).collect()}
    by_group = {}
    for g, x, w in rows:
        by_group.setdefault(g, []).extend([float(x)] * w)
    for g, xs in by_group.items():
        xs.sort()
        n = len(xs)
        # smallest x with cum >= p*tot: index ceil(p*n) - 1, exact in ints
        p50 = xs[-(-n // 2) - 1]        # ceil(n/2)
        p90 = xs[-(-9 * n // 10) - 1]   # ceil(9n/10)
        assert got[g] == (p50, p90), (g, got[g], (p50, p90), xs)


snap_cmds = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=5)),
        st.tuples(st.just("cow_drop"), st.integers(0, 9)),
        st.tuples(st.just("rollback"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@given(cmds=snap_cmds, keep_cut=st.integers(min_value=1, max_value=6))
@settings(**SETTINGS)
@pytest.mark.slow
def test_snapshot_protocol_matches_model(spark, cmds, keep_cut):
    """Model-based check of the snapshot commit protocol: an arbitrary
    command sequence (append / full-COW value-drop / file-level rollback
    of the newest commit) runs both against the real manifest machinery
    and a pure-Python per-version row-multiset model; EVERY historical
    version must read back exactly its model state (immutability under
    all later commits), and an expire at a random horizon must leave
    disk == live references exactly (no stranded files, no over-delete)
    with every surviving version still bit-faithful."""
    import os
    from collections import Counter

    from userportrait.ops.scans import (
        _scratch,
        _snapshot_commit,
        _snapshot_expire,
        _snapshot_manifest,
        _snapshot_read,
    )

    root = _scratch("snapshot_prop")
    all_files = {0: []}
    own_files: dict[int, list] = {}
    own_rows: dict[int, Counter] = {}
    model = {0: Counter()}
    ver = 0
    for cmd, arg in cmds:
        prev_files, prev_rows = all_files[ver], model[ver]
        ver += 1
        if cmd == "append":
            df = spark.createDataFrame([(v,) for v in arg], "val long").coalesce(1)
            fl = _snapshot_commit(spark, root, ver, df, prev_files, "append")
            all_files[ver] = fl
            own_files[ver] = [f for f in fl if f not in prev_files]
            own_rows[ver] = Counter(arg)
            model[ver] = prev_rows + Counter(arg)
        elif cmd == "cow_drop":
            surviving = prev_rows.copy()
            surviving.pop(arg, None)
            df = spark.createDataFrame(
                [(v,) for v in surviving.elements()], "val long"
            ).coalesce(1)
            fl = _snapshot_commit(spark, root, ver, df, [], "cow")
            all_files[ver] = fl
            own_files[ver] = fl
            own_rows[ver] = surviving
            model[ver] = surviving
        else:  # rollback: drop the parent's OWN files from the manifest
            drop_f = set(own_files.get(ver - 1, []))
            fl = _snapshot_commit(
                spark, root, ver, None, [f for f in prev_files if f not in drop_f], "rollback"
            )
            all_files[ver] = fl
            own_files[ver] = []
            own_rows[ver] = Counter()
            model[ver] = prev_rows - own_rows.get(ver - 1, Counter())

    def check(v):
        files = _snapshot_manifest(root, v)["files"]
        if not files:
            assert not model[v], (v, model[v])
            return
        got = sorted(r.val for r in _snapshot_read(spark, root, v).collect())
        assert got == sorted(model[v].elements()), v

    for v in range(1, ver + 1):
        check(v)

    keep_from = min(keep_cut, ver)
    _snapshot_expire(root, keep_from=keep_from)
    live: set = set()
    for v in range(keep_from, ver + 1):
        live |= set(_snapshot_manifest(root, v)["files"])
        check(v)
    import glob as _g

    on_disk = {
        os.path.relpath(p, root)
        for p in _g.glob(os.path.join(root, "data", "*", "part-*.parquet"))
    }
    assert on_disk == live
