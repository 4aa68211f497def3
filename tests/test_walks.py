"""Random-walk corpus + skip-gram pairs vs pure-Python walk oracles."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sparkgraph.algorithms.walks import (
    AFFINE_MOD,
    AFFINE_S,
    AFFINE_V,
    AFFINE_W,
    indexed_adjacency,
    random_walks,
    skipgram_pairs,
)
from sparkgraph.graph import Graph

from tests.fixtures import GRAPH_MAIN
from tests.oracles import symmetrize


def _graph(spark, pairs):
    return Graph(spark.createDataFrame(pairs, "src long, dst long"))


def _adj_oracle(pairs):
    """vertex -> dst-sorted neighbor list on the simple undirected view."""
    adj: dict[int, set[int]] = {}
    for s, d in symmetrize(pairs):
        adj.setdefault(s, set()).add(d)
    return {v: sorted(ns) for v, ns in adj.items()}


def _walks_oracle(pairs, walk_len, mix):
    adj = _adj_oracle(pairs)
    trace = []
    for start in adj:
        cur = start
        trace.append((start, 0, cur))
        for s in range(1, walk_len + 1):
            ns = adj[cur]
            cur = ns[mix(start, s, cur) % len(ns)]
            trace.append((start, s, cur))
    return sorted(trace)


def _affine(walk_id, step, vertex):
    return (vertex * AFFINE_V + walk_id * AFFINE_W + step * AFFINE_S) % AFFINE_MOD


def test_indexed_adjacency_ranks_and_degrees(spark):
    adj = {(r.src, r.idx): (r.dst, r.deg) for r in indexed_adjacency(_graph(spark, GRAPH_MAIN)).collect()}
    oracle = _adj_oracle(GRAPH_MAIN)
    assert len(adj) == sum(len(ns) for ns in oracle.values())
    for v, ns in oracle.items():
        for i, d in enumerate(ns):
            assert adj[(v, i)] == (d, len(ns))


def test_affine_walks_match_python_oracle(spark):
    walk_len = 8
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(_graph(spark, GRAPH_MAIN), walk_len, mixer="affine").collect()
    )
    assert got == _walks_oracle(GRAPH_MAIN, walk_len, _affine)


def test_xxhash_walks_are_valid_and_partitioning_independent(spark):
    walk_len = 6
    g1 = _graph(spark, GRAPH_MAIN)
    t1 = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(g1, walk_len, mixer="xxhash").collect()
    )
    g2 = Graph(
        spark.createDataFrame(GRAPH_MAIN, "src long, dst long").repartition(7),
        num_partitions=3,
    )
    t2 = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(g2, walk_len, mixer="xxhash").collect()
    )
    assert t1 == t2  # choice is a pure function of (walk_id, step, vertex)
    adj = _adj_oracle(GRAPH_MAIN)
    by_walk: dict[int, dict[int, int]] = {}
    for w, s, v in t1:
        by_walk.setdefault(w, {})[s] = v
    assert set(by_walk) == set(adj)
    for w, steps in by_walk.items():
        assert steps[0] == w and len(steps) == walk_len + 1
        for s in range(1, walk_len + 1):
            assert steps[s] in adj[steps[s - 1]]  # every hop is a real edge


def test_weighted_walks_match_python_oracle(spark):
    from sparkgraph.algorithms.walks import weighted_random_walks

    walk_len = 6
    wpairs = [(s, d, float(1 + (s + d) % 3)) for s, d in GRAPH_MAIN]
    g = Graph(spark.createDataFrame(wpairs, "src long, dst long, weight double"))
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in weighted_random_walks(g, walk_len, mixer="affine").collect()
    )

    # python replay: per vertex, neighbors sorted by dst, w slots each
    slots: dict[int, list[int]] = {}
    w_of: dict[tuple[int, int], int] = {}
    for s, d, w in wpairs:
        w_of[(s, d)] = w_of.get((s, d), 0) + int(w)
        w_of[(d, s)] = w_of.get((d, s), 0) + int(w)
    verts = sorted({v for e in GRAPH_MAIN for v in e})
    for v in verts:
        ns = sorted(d for (u, d) in w_of if u == v)
        slots[v] = [d for d in ns for _ in range(w_of[(v, d)])]
    trace = []
    for start in verts:
        cur = start
        trace.append((start, 0, cur))
        for s in range(1, walk_len + 1):
            sl = slots[cur]
            cur = sl[_affine(start, s, cur) % len(sl)]
            trace.append((start, s, cur))
    assert got == sorted(trace)

    # degenerate weights reduce exactly to the unweighted walk
    g1 = _graph(spark, GRAPH_MAIN)
    uw = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in weighted_random_walks(g1, walk_len, mixer="affine").collect()
    )
    assert uw == _walks_oracle(GRAPH_MAIN, walk_len, _affine)


def test_weighted_walks_reject_fractional_weights(spark):
    import pytest

    from sparkgraph.algorithms.walks import weighted_random_walks

    g = Graph(
        spark.createDataFrame([(1, 2, 0.5)], "src long, dst long, weight double")
    )
    with pytest.raises(ValueError, match="integer weights"):
        weighted_random_walks(g, 2)


def test_skipgram_pairs_match_trace_recount(spark):
    walk_len, window = 6, 2
    walks = random_walks(_graph(spark, GRAPH_MAIN), walk_len, mixer="affine")
    got = {
        (r.center, r.context): r.n_cooc
        for r in skipgram_pairs(walks, window=window).collect()
    }
    trace = _walks_oracle(GRAPH_MAIN, walk_len, _affine)
    by_walk: dict[int, dict[int, int]] = {}
    for w, s, v in trace:
        by_walk.setdefault(w, {})[s] = v
    want: Counter = Counter()
    for steps in by_walk.values():
        for sa, va in steps.items():
            for sb, vb in steps.items():
                if sa != sb and abs(sa - sb) <= window:
                    want[(va, vb)] += 1
    assert got == dict(want)


def _node2vec_oracle(pairs, walk_len, p, q, mix):
    """Pure-Python second-order replay: integer slot expansion of the
    {1/p, 1, 1/q} node2vec weights, dst-ordered slots, affine pick."""
    from fractions import Fraction
    from math import lcm

    a_ret, a_out = 1 / Fraction(str(p)), 1 / Fraction(str(q))
    scale = lcm(a_ret.denominator, a_out.denominator)
    w_ret, w_in, w_out = int(a_ret * scale), int(scale), int(a_out * scale)
    adj = _adj_oracle(pairs)
    trace = []
    for start in adj:
        trace.append((start, 0, start))
        ns = adj[start]
        prev, cur = start, ns[mix(start, 1, start) % len(ns)]
        trace.append((start, 1, cur))
        for s in range(2, walk_len + 1):
            slots = []
            for x in adj[cur]:
                w = w_ret if x == prev else (w_in if x in adj[prev] else w_out)
                slots.extend([x] * w)
            nxt = slots[mix(start, s, cur) % len(slots)]
            prev, cur = cur, nxt
            trace.append((start, s, cur))
    return sorted(trace)


def test_node2vec_affine_matches_python_oracle(spark):
    from sparkgraph.algorithms.walks import node2vec_walks

    walk_len, p, q = 6, 2, 3
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            _graph(spark, GRAPH_MAIN), walk_len, p=p, q=q, mixer="affine"
        ).collect()
    )
    assert got == _node2vec_oracle(GRAPH_MAIN, walk_len, p, q, _affine)


def test_node2vec_fractional_pq_and_validity(spark):
    from sparkgraph.algorithms.walks import node2vec_walks

    walk_len, p, q = 5, 0.25, 2
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            _graph(spark, GRAPH_MAIN), walk_len, p=p, q=q, mixer="affine"
        ).collect()
    )
    assert got == _node2vec_oracle(GRAPH_MAIN, walk_len, p, q, _affine)
    adj = _adj_oracle(GRAPH_MAIN)
    by_walk: dict[int, dict[int, int]] = {}
    for w, s, v in got:
        by_walk.setdefault(w, {})[s] = v
    for w, steps in by_walk.items():
        assert steps[0] == w and len(steps) == walk_len + 1
        for s in range(1, walk_len + 1):
            assert steps[s] in adj[steps[s - 1]]  # every hop is a real edge


def test_node2vec_unit_pq_reduces_to_first_order(spark):
    """p = q = 1 makes all three weights equal, so the slot table collapses
    to one dst-ranked slot per neighbor — bit-identical to random_walks."""
    from sparkgraph.algorithms.walks import node2vec_walks

    walk_len = 6
    g = _graph(spark, GRAPH_MAIN)
    n2v = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(g, walk_len, p=1, q=1, mixer="affine").collect()
    )
    first = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(g, walk_len, mixer="affine").collect()
    )
    assert n2v == first


def test_node2vec_max_degree_caps_hubs(spark):
    """Graphs whose max degree exceeds ``max_degree`` no longer raise: every
    hub keeps its max_degree smallest-id neighbors (unweighted tie order)
    and the walks replay EXACTLY on that capped graph — hop 1, the slot
    table, and the in-neighborhood test all see the same capped adjacency."""
    from sparkgraph.algorithms.walks import node2vec_walks

    cap, walk_len, p, q = 2, 5, 2, 3

    def _capped_oracle():
        from fractions import Fraction
        from math import lcm

        a_ret, a_out = 1 / Fraction(str(p)), 1 / Fraction(str(q))
        scale = lcm(a_ret.denominator, a_out.denominator)
        w_ret, w_in, w_out = int(a_ret * scale), int(scale), int(a_out * scale)
        adj = {v: ns[:cap] for v, ns in _adj_oracle(GRAPH_MAIN).items()}
        trace = []
        for start in adj:
            trace.append((start, 0, start))
            ns = adj[start]
            prev, cur = start, ns[_affine(start, 1, start) % len(ns)]
            trace.append((start, 1, cur))
            for s in range(2, walk_len + 1):
                slots = []
                for x in adj[cur]:
                    w = w_ret if x == prev else (w_in if x in adj[prev] else w_out)
                    slots.extend([x] * w)
                nxt = slots[_affine(start, s, cur) % len(slots)]
                prev, cur = cur, nxt
                trace.append((start, s, cur))
        return sorted(trace)

    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            _graph(spark, GRAPH_MAIN), walk_len, p=p, q=q,
            mixer="affine", max_degree=cap,
        ).collect()
    )
    assert got == _capped_oracle()
    # every hop is an edge of the CAPPED graph (strictly fewer choices than
    # the full graph for the degree-3+ vertices)
    adj = {v: set(ns[:cap]) for v, ns in _adj_oracle(GRAPH_MAIN).items()}
    by_walk: dict[int, dict[int, int]] = {}
    for w, s, v in got:
        by_walk.setdefault(w, {})[s] = v
    for w, steps in by_walk.items():
        for s in range(1, walk_len + 1):
            assert steps[s] in adj[steps[s - 1]]


def _node2vec_weighted_oracle(wpairs, walk_len, p, q, mix):
    """Weighted second-order replay: slot weight = alpha_pq(prev, x) *
    w(cur, x); hop 1 weight-proportional first-order."""
    from fractions import Fraction
    from math import lcm

    a_ret, a_out = 1 / Fraction(str(p)), 1 / Fraction(str(q))
    scale = lcm(a_ret.denominator, a_out.denominator)
    w_ret, w_in, w_out = int(a_ret * scale), int(scale), int(a_out * scale)
    w: dict = {}
    for s, d, x in wpairs:
        if s == d:
            continue
        w[(s, d)] = w.get((s, d), 0) + int(x)
        w[(d, s)] = w.get((d, s), 0) + int(x)
    adj: dict = {}
    for (s, d) in w:
        adj.setdefault(s, set()).add(d)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    trace = []
    for start in sorted(adj):
        trace.append((start, 0, start))
        slots = [x for x in adj[start] for _ in range(w[(start, x)])]
        prev, cur = start, slots[mix(start, 1, start) % len(slots)]
        trace.append((start, 1, cur))
        for s in range(2, walk_len + 1):
            slots = []
            for x in adj[cur]:
                b = w_ret if x == prev else (w_in if x in adj[prev] else w_out)
                slots.extend([x] * (b * w[(cur, x)]))
            nxt = slots[mix(start, s, cur) % len(slots)]
            prev, cur = cur, nxt
            trace.append((start, s, cur))
    return sorted(trace)


def test_node2vec_weighted_matches_python_oracle(spark):
    from sparkgraph.algorithms.walks import node2vec_walks
    from sparkgraph.graph import Graph

    walk_len, p, q = 5, 2, 3
    wpairs = [(s, d, float(1 + (s + d) % 3)) for s, d in GRAPH_MAIN]
    g = Graph(spark.createDataFrame(wpairs, "src long, dst long, weight double"))
    got = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            g, walk_len, p=p, q=q, mixer="affine", weighted=True
        ).collect()
    )
    assert got == _node2vec_weighted_oracle(wpairs, walk_len, p, q, _affine)
    # unit weights reduce exactly to the unweighted path
    g1 = spark.createDataFrame(
        [(s, d, 1.0) for s, d in GRAPH_MAIN], "src long, dst long, weight double"
    )
    uw = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            Graph(g1), walk_len, p=p, q=q, mixer="affine", weighted=True
        ).collect()
    )
    plain = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in node2vec_walks(
            _graph(spark, GRAPH_MAIN), walk_len, p=p, q=q, mixer="affine"
        ).collect()
    )
    assert uw == plain

    import pytest as _pytest

    gf = Graph(spark.createDataFrame([(1, 2, 0.5)], "src long, dst long, weight double"))
    with _pytest.raises(ValueError, match="integer weights"):
        node2vec_walks(gf, 3, weighted=True)


def test_walks_affine_mixer_survives_xxhash64_range_ids(spark):
    """Regression: the affine next-hop mixer must not overflow int64 on
    full-range vertex/walk ids (pmod bound, cf. louvain.PARITY_BOUND)."""
    from sparkgraph.algorithms.walks import random_walks
    from sparkgraph.graph import Graph
    from sparkgraph.io.edgelist import edges_from_pairs

    verts = sorted({v for e in GRAPH_MAIN for v in e})
    base = 7_000_000_000_000_000_000
    big = {v: base + v * 13 for v in verts}
    big[verts[1]] = -8_123_456_789_012_345_678
    pairs = [(big[s], big[d]) for s, d in GRAPH_MAIN]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    trace = random_walks(g, 4, mixer="affine").collect()
    assert len(trace) == 5 * len(adj)  # steps 0..4 for every start
    by_walk = {}
    for r in trace:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.vertex
    for w, steps in by_walk.items():
        assert steps[0] == w
        for s in range(1, 5):
            assert steps[s] in adj[steps[s - 1]], (w, s)  # real edges only
    g.unpersist()
