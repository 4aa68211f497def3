"""Synchronous modularity-gain moving vs a pure-Python integer replay."""

from __future__ import annotations

from collections import defaultdict

from sparkgraph.algorithms.louvain import louvain_move
from sparkgraph.graph import Graph
from sparkgraph.io.edgelist import edges_from_pairs

from tests.fixtures import GRAPH_MAIN
from tests.oracles import symmetrize


def _louvain_oracle(pairs, rounds):
    sym = symmetrize(pairs)
    deg = defaultdict(int)
    nbrs = defaultdict(list)
    for s, d in sym:
        deg[s] += 1
        nbrs[s].append(d)
    two_m = len(sym)
    label = {v: v for v in deg}
    prev_moved = None
    for r in range(1, rounds + 1):
        ctot = defaultdict(int)
        for v in deg:
            ctot[label[v]] += deg[v]
        new = {}
        moved = 0
        for v in deg:
            if (((v * 2654435761) >> 4) + r) % 2 != 0:  # mixed-parity guard
                new[v] = label[v]
                continue
            kvc = defaultdict(int)
            for u in nbrs[v]:
                if u != v:
                    kvc[label[u]] += 1
            cands = set(kvc) | {label[v]}
            best = None
            for c in sorted(cands):
                gain = two_m * kvc.get(c, 0) - deg[v] * (
                    ctot[c] - (deg[v] if c == label[v] else 0)
                )
                if best is None or gain > best[0]:
                    best = (gain, c)
            new[v] = best[1]
            moved += new[v] != label[v]
        label = new
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
    return label


def test_louvain_matches_python_replay(spark):
    for rounds in (1, 3, 6):
        g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
        got = {r.id: r.label for r in louvain_move(g, rounds=rounds).state.collect()}
        assert got == _louvain_oracle(GRAPH_MAIN, rounds), rounds
        g.unpersist()


def test_louvain_finds_planted_communities(spark):
    # two 5-cliques joined by one bridge edge. One-level moving plateaus at a
    # genuine local optimum (each clique split in two — the exact reason
    # Louvain has a coarsening phase); the multi-level algorithm collapses
    # each clique into one community.
    from sparkgraph.algorithms.louvain import louvain

    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs.append((0, 10))
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = louvain(g, rounds_per_level=8, max_levels=3)
    got = {r.id: r.label for r in res.state.collect()}
    left = {got[v] for v in range(5)}
    right = {got[v] for v in range(10, 15)}
    assert len(left) == 1 and len(right) == 1 and left != right
    from sparkgraph.algorithms.structure import modularity

    q = modularity(g, res.state).collect()[0][0]
    assert q > 0.3  # two dense blocks + one bridge: strong community structure
    g.unpersist()


def _louvain_multilevel_oracle(pairs, rounds, levels):
    """Weighted multi-level replay mirroring algorithms.louvain.louvain."""
    sym = symmetrize(pairs)
    w = defaultdict(int)
    for s, d in sym:
        w[(s, d)] += 1
    mapping = {v: v for e in w for v in e}

    def move(wtab, rounds):
        deg = defaultdict(int)
        for (s, d), x in wtab.items():
            deg[s] += x
        two_m = sum(wtab.values())
        label = {v: v for v in deg}
        prev_moved = None
        for r in range(1, rounds + 1):
            ctot = defaultdict(int)
            for v in deg:
                ctot[label[v]] += deg[v]
            new, moved = {}, 0
            for v in deg:
                if (((v * 2654435761) >> 4) + r) % 2 != 0:  # mixed-parity guard
                    new[v] = label[v]
                    continue
                kvc = defaultdict(int)
                for (s, d), x in wtab.items():
                    if s == v and d != v:
                        kvc[label[d]] += x
                cands = set(kvc) | {label[v]}
                best = None
                for c in sorted(cands):
                    gain = two_m * kvc.get(c, 0) - deg[v] * (
                        ctot[c] - (deg[v] if c == label[v] else 0)
                    )
                    if best is None or gain > best[0]:
                        best = (gain, c)
                new[v] = best[1]
                moved += new[v] != label[v]
            label = new
            if moved == 0 and prev_moved == 0:
                break
            prev_moved = moved
        return label

    for _ in range(levels):
        label = move(w, rounds)
        mapping = {orig: label[cur] for orig, cur in mapping.items()}
        if all(c == v for v, c in label.items()):
            break
        neww = defaultdict(int)
        for (s, d), x in w.items():
            neww[(label[s], label[d])] += x
        w = neww
    return mapping


def test_louvain_multilevel_matches_python_replay(spark):
    from sparkgraph.algorithms.louvain import louvain

    for rounds, levels in ((3, 2), (4, 3)):
        g = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
        got = {
            r.id: r.label
            for r in louvain(g, rounds_per_level=rounds, max_levels=levels).state.collect()
        }
        assert got == _louvain_multilevel_oracle(GRAPH_MAIN, rounds, levels), (rounds, levels)
        g.unpersist()


def test_louvain_multilevel_merges_clique_ring(spark):
    """Ring of 6 triangles bridged in a cycle: level 1 collapses each
    triangle; deeper levels may merge adjacent triangles — the final
    partition must still be triangle-aligned and beat singletons."""
    pairs = []
    for t in range(6):
        a, b, c = 3 * t, 3 * t + 1, 3 * t + 2
        pairs += [(a, b), (b, c), (a, c)]
    pairs += [(3 * t + 2, (3 * (t + 1)) % 18) for t in range(6)]  # bridges
    from sparkgraph.algorithms.louvain import louvain
    from sparkgraph.algorithms.structure import modularity

    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    res = louvain(g, rounds_per_level=6, max_levels=3)
    got = {r.id: r.label for r in res.state.collect()}
    # every triangle ends up wholly inside one community
    for t in range(6):
        assert len({got[3 * t], got[3 * t + 1], got[3 * t + 2]}) == 1, t
    q = modularity(g, res.state).collect()[0][0]
    assert q > 0.5
    g.unpersist()


def test_weighted_louvain_matches_weighted_replay(spark):
    from sparkgraph.algorithms.louvain import louvain_move

    wpairs = [(s, d, float(1 + (s + d) % 3)) for s, d in GRAPH_MAIN]
    g = Graph(spark.createDataFrame(wpairs, "src long, dst long, weight double"))
    got = {
        r.id: r.label
        for r in louvain_move(g, rounds=4, weighted=True).state.collect()
    }
    # weighted python replay: expand symmetrized weights into the move loop
    w = defaultdict(int)
    for s, d, x in wpairs:
        w[(s, d)] += int(x)
        w[(d, s)] += int(x)
    deg = defaultdict(int)
    for (s, d), x in w.items():
        deg[s] += x
    two_m = sum(w.values())
    label = {v: v for v in deg}
    prev_moved = None
    for r in range(1, 5):
        ctot = defaultdict(int)
        for v in deg:
            ctot[label[v]] += deg[v]
        new, moved = {}, 0
        for v in deg:
            if (((v * 2654435761) >> 4) + r) % 2 != 0:
                new[v] = label[v]
                continue
            kvc = defaultdict(int)
            for (s, d), x in w.items():
                if s == v and d != v:
                    kvc[label[d]] += x
            best = None
            for c in sorted(set(kvc) | {label[v]}):
                gain = two_m * kvc.get(c, 0) - deg[v] * (
                    ctot[c] - (deg[v] if c == label[v] else 0)
                )
                if best is None or gain > best[0]:
                    best = (gain, c)
            new[v] = best[1]
            moved += new[v] != label[v]
        label = new
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
    assert got == label
    # unit weights reduce exactly to the unweighted path
    g1 = Graph(edges_from_pairs(spark, GRAPH_MAIN), num_partitions=4)
    uw = {r.id: r.label for r in louvain_move(g1, rounds=4).state.collect()}
    g2 = Graph(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in GRAPH_MAIN], "src long, dst long, weight double"
        )
    )
    ww = {r.id: r.label for r in louvain_move(g2, rounds=4, weighted=True).state.collect()}
    assert uw == ww


def test_louvain_survives_xxhash64_range_ids(spark):
    """Regression: the parity guard must not overflow int64 under ANSI mode
    on full-range (incl. negative) xxhash64 vertex ids — the ids ingest.py
    actually produces. Before PARITY_BOUND, `id * 2654435761` raised
    ARITHMETIC_OVERFLOW for |id| > ~3.5e9."""
    base = 7_000_000_000_000_000_000  # near int64 max after +small offsets
    verts = sorted({v for e in GRAPH_MAIN for v in e})
    big = {v: base + v * 13 for v in verts}
    big[verts[0]] = -8_123_456_789_012_345_678  # negative, like xxhash64
    big[verts[5]] = -4_611_686_018_427_387_911
    pairs = [(big[s], big[d]) for s, d in GRAPH_MAIN]
    g = Graph(edges_from_pairs(spark, pairs), num_partitions=4)
    got = {r.id: r.label for r in louvain_move(g, rounds=4).state.collect()}

    # replay with the bounded guard: pmod(id, 2^31) before the Knuth mix
    # (Python's % with a positive modulus IS pmod, matching F.pmod)
    sym = symmetrize(pairs)
    deg, nbrs = defaultdict(int), defaultdict(list)
    for s, d in sym:
        deg[s] += 1
        nbrs[s].append(d)
    two_m = len(sym)
    label = {v: v for v in deg}
    prev_moved = None
    for r in range(1, 5):
        ctot = defaultdict(int)
        for v in deg:
            ctot[label[v]] += deg[v]
        new, moved = {}, 0
        for v in deg:
            if ((((v % 2**31) * 2654435761) >> 4) + r) % 2 != 0:
                new[v] = label[v]
                continue
            kvc = defaultdict(int)
            for u in nbrs[v]:
                if u != v:
                    kvc[label[u]] += 1
            best = None
            for c in sorted(set(kvc) | {label[v]}):
                gain = two_m * kvc.get(c, 0) - deg[v] * (
                    ctot[c] - (deg[v] if c == label[v] else 0)
                )
                if best is None or gain > best[0]:
                    best = (gain, c)
            new[v] = best[1]
            moved += new[v] != label[v]
        label = new
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
    assert got == label
    g.unpersist()


def test_weighted_louvain_rejects_fractional(spark):
    import pytest as _pytest

    from sparkgraph.algorithms.louvain import louvain_move

    g = Graph(spark.createDataFrame([(1, 2, 0.5)], "src long, dst long, weight double"))
    with _pytest.raises(ValueError, match="integer weights"):
        louvain_move(g, weighted=True)


def test_louvain_recovers_sbm_planted_blocks(spark):
    """Planted-partition recovery: on an SBM with strong assortativity the
    multi-level Louvain must put an overwhelming majority of each block
    into a single community, and distinct blocks into distinct ones."""
    from collections import Counter

    from sparkgraph.algorithms.louvain import louvain
    from sparkgraph.io.synth import sbm_edges

    n_blocks, bs = 4, 25
    e = sbm_edges(spark, n_blocks, bs, p_in=0.5, p_out=0.02, seed=7)
    g = Graph(e, num_partitions=4)
    res = louvain(g, rounds_per_level=6, max_levels=3)
    got = {r.id: r.label for r in res.state.collect()}
    majors = []
    for b in range(n_blocks):
        labs = Counter(got[v] for v in range(b * bs, (b + 1) * bs) if v in got)
        lab, cnt = labs.most_common(1)[0]
        assert cnt >= 0.8 * sum(labs.values()), (b, labs)
        majors.append(lab)
    assert len(set(majors)) == n_blocks  # blocks map to distinct communities
    g.unpersist()
