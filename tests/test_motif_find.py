"""Motif pattern matching (algorithms/motifs.find) against hand enumeration."""

import pytest

from sparkgraph.algorithms.motifs import find


def _edges(spark, pairs, weights=None):
    if weights is None:
        rows = [(int(s), int(d)) for s, d in pairs]
        return spark.createDataFrame(rows, "src long, dst long")
    rows = [(int(s), int(d), float(w)) for (s, d), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


# directed test graph: triangle 1→2→3→1, chord 1→3, pendant 3→4, self-loop 5→5
PAIRS = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (5, 5)]


def test_single_edge_binding(spark):
    out = find(_edges(spark, PAIRS), "(a)-[e]->(b)")
    rows = {(r.a, r.b, r.e.src, r.e.dst, r.e.weight) for r in out.collect()}
    assert rows == {(s, d, s, d, 1.0) for s, d in PAIRS}
    assert set(out.columns) == {"a", "b", "e"}


def test_two_hop_join(spark):
    out = find(_edges(spark, PAIRS), "(a)-[]->(b); (b)-[]->(c)")
    got = {(r.a, r.b, r.c) for r in out.collect()}
    want = {
        (s1, d1, d2) for s1, d1 in PAIRS for s2, d2 in PAIRS if d1 == s2
    }
    assert got == want


def test_directed_triangle(spark):
    out = find(_edges(spark, PAIRS), "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    got = {(r.a, r.b, r.c) for r in out.collect()}
    # rotations of 1→2→3→1, plus the self-loop 5 bound three times
    assert got == {(1, 2, 3), (2, 3, 1), (3, 1, 2), (5, 5, 5)}


def test_negation_open_wedge(spark):
    out = find(_edges(spark, PAIRS), "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = {(r.a, r.b, r.c) for r in out.collect()}
    closed = {(s, d) for s, d in PAIRS}
    want = {
        (s1, d1, d2)
        for s1, d1 in PAIRS
        for s2, d2 in PAIRS
        if d1 == s2 and (s1, d2) not in closed
    }
    assert got == want
    assert (1, 2, 3) not in got  # chord 1→3 closes it


def test_self_loop_term(spark):
    out = find(_edges(spark, PAIRS), "(a)-[]->(a)")
    assert [(r.a,) for r in out.collect()] == [(5,)]


def test_anonymous_vertex_not_exposed(spark):
    out = find(_edges(spark, PAIRS), "(a)-[]->(); ()-[]->(a)")
    assert set(out.columns) == {"a"}
    # a needs outgoing AND incoming edges: 1, 2, 3 (and 5 via its loop)
    assert {r.a for r in out.collect()} == {1, 2, 3, 5}


def test_parallel_edges_multiply(spark):
    out = find(_edges(spark, [(1, 2), (1, 2), (2, 3)]), "(a)-[]->(b); (b)-[]->(c)")
    assert out.count() == 2  # two parallel 1→2 edges, one 2→3


def test_weight_carried_in_edge_struct(spark):
    e = _edges(spark, [(1, 2), (2, 3)], weights=[0.5, 2.0])
    out = find(e, "(a)-[e1]->(b); (b)-[e2]->(c)")
    r = out.collect()[0]
    assert (r.e1.weight, r.e2.weight) == (0.5, 2.0)


def test_disconnected_pattern_cross_joins(spark):
    out = find(_edges(spark, [(1, 2), (3, 4)]), "(a)-[]->(b); (c)-[]->(d)")
    assert out.count() == 4  # 2 edges × 2 edges


def test_parse_errors(spark):
    e = _edges(spark, PAIRS)
    with pytest.raises(ValueError, match="unparseable"):
        find(e, "(a)->(b)")
    with pytest.raises(ValueError, match="negated term cannot name"):
        find(e, "(a)-[]->(b); !(a)-[x]->(b)")
    with pytest.raises(ValueError, match="both vertices named"):
        find(e, "(a)-[]->(b); !(a)-[]->()")
    with pytest.raises(ValueError, match="new vertex names"):
        find(e, "(a)-[]->(b); !(a)-[]->(z)")
    with pytest.raises(ValueError, match="duplicate edge name"):
        find(e, "(a)-[e]->(b); (b)-[e]->(c)")
    with pytest.raises(ValueError, match="at least one positive"):
        find(e, "!(a)-[]->(b)")
    with pytest.raises(ValueError, match="both a vertex and an edge"):
        find(e, "(a)-[b]->(b)")
