"""Motif (graph-pattern) finding compiled to relational joins.

Added link-graph surface (no reference analogue — the reference ships fixed
vertex programs only, master/api: SURVEY.md §2A): a GraphFrames-style
``find("(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)")`` that compiles a motif
pattern into a chain of equi-joins on the directed edge table plus
``left_anti`` joins for negated terms. The public semantics follow the
GraphFrames motif API (Dave et al., GraphFrames: An Integrated API for
Mixing Graph and Relational Queries, GRADES 2016):

  * ``(a)-[e]->(b)`` — a directed edge bound to vertex names ``a``/``b`` and
    edge name ``e``; the result carries one LONG column per named vertex and
    one ``struct(src, dst, weight)`` column per named edge.
  * ``()`` / ``[]`` — anonymous vertex / edge: joined on but not exposed;
    each anonymous occurrence is independent.
  * ``!(a)-[]->(b)`` — negated term: the pair (a, b) must NOT be an edge.
    Negated terms cannot name the edge and cannot introduce new vertex
    names (both GraphFrames rules), because there is no binding to expose.
  * Names may repeat across terms (shared names express the join);
    ``(a)-[]->(a)`` matches self-loops.

Scale: every positive term is ONE equi-join on vertex ids against the edge
table — the scatter-join discipline of the rest of the engine. Terms are
reordered greedily so each join shares at least one bound vertex with the
accumulated result (no accidental cross joins); genuinely disconnected
pattern components fall back to an explicit ``crossJoin`` with a logged
warning, as in GraphFrames. Worst-case output size is the motif count
itself, which no plan can beat; skewed hub vertices are handled by AQE's
skew-join splitting (enabled in :func:`sparkgraph.session.get_spark`).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("sparkgraph")

_TERM_RE = re.compile(
    r"^(?P<neg>!)?\s*\(\s*(?P<a>\w*)\s*\)\s*-\s*\[\s*(?P<e>\w*)\s*\]\s*->"
    r"\s*\(\s*(?P<b>\w*)\s*\)$"
)


@dataclass(frozen=True)
class _Term:
    a: str  # vertex name or "" (anonymous)
    b: str
    e: str  # edge name or "" (anonymous)
    neg: bool


def _parse(pattern: str) -> list[_Term]:
    terms: list[_Term] = []
    seen_edges: set[str] = set()
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if m is None:
            raise ValueError(f"unparseable motif term: {raw!r}")
        t = _Term(m["a"], m["b"], m["e"], m["neg"] == "!")
        if t.neg:
            if t.e:
                raise ValueError(f"negated term cannot name its edge: {raw!r}")
            if not (t.a and t.b):
                raise ValueError(
                    f"negated term needs both vertices named: {raw!r}"
                )
        if t.e:
            if t.e in seen_edges:
                raise ValueError(f"duplicate edge name {t.e!r}")
            seen_edges.add(t.e)
        terms.append(t)
    if not any(not t.neg for t in terms):
        raise ValueError("pattern needs at least one positive term")
    names = {t.a for t in terms if t.a} | {t.b for t in terms if t.b}
    if names & seen_edges:
        raise ValueError(
            f"names used for both a vertex and an edge: {sorted(names & seen_edges)}"
        )
    pos_names = {n for t in terms if not t.neg for n in (t.a, t.b) if n}
    for t in terms:
        if t.neg and not {t.a, t.b} <= pos_names:
            raise ValueError(
                "negated term may not introduce new vertex names: "
                f"!({t.a})-[]->({t.b})"
            )
    return terms


def _order_positive(terms: list[_Term]) -> list[_Term]:
    """Greedy connectivity order: each next term shares a named vertex with
    the already-bound set when any such term exists (avoids cross joins)."""
    pending = [t for t in terms if not t.neg]
    ordered: list[_Term] = [pending.pop(0)]
    bound = {n for n in (ordered[0].a, ordered[0].b) if n}
    while pending:
        pick = next(
            (t for t in pending if (t.a and t.a in bound) or (t.b and t.b in bound)),
            None,
        )
        if pick is None:  # disconnected component — cross join
            pick = pending[0]
        pending.remove(pick)
        ordered.append(pick)
        bound |= {n for n in (pick.a, pick.b) if n}
    return ordered


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the directed edge table ``edges``
    (``src``, ``dst``[, ``weight``]); returns one row per binding with a
    LONG column per named vertex and a ``struct(src, dst, weight)`` column
    per named edge. Parallel edges each produce their own binding, exactly
    as repeated rows join repeatedly.
    """
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    edges = edges.select("src", "dst", "weight")
    terms = _parse(pattern)
    anon = iter(range(10**6))

    def term_df(t: _Term) -> tuple[DataFrame, str, str]:
        va = t.a or f"__anon{next(anon)}"
        vb = t.b or f"__anon{next(anon)}"
        df = edges
        if va == vb:  # self-loop term (a)-[]->(a)
            df = df.filter(F.col("src") == F.col("dst"))
        cols = [F.col("src").alias(va)]
        if vb != va:
            cols.append(F.col("dst").alias(vb))
        if t.e:
            cols.append(F.struct("src", "dst", "weight").alias(t.e))
        return df.select(*cols), va, vb

    result: DataFrame | None = None
    bound: set[str] = set()
    for t in _order_positive(terms):
        df, va, vb = term_df(t)
        if result is None:
            result = df
        else:
            keys = [n for n in {va, vb} if n in bound]
            if keys:
                result = result.join(df, on=keys)
            else:
                logger.warning(
                    "motif %r: term (%s)-[%s]->(%s) shares no vertex with the "
                    "pattern so far — falling back to crossJoin",
                    pattern, t.a, t.e, t.b,
                )
                result = result.crossJoin(df)
        bound |= {va, vb}

    assert result is not None
    for t in terms:
        if t.neg:
            absent = edges.select(
                F.col("src").alias(t.a), F.col("dst").alias(t.b)
            ).distinct()
            result = result.join(absent, on=[t.a, t.b], how="left_anti")

    keep = [c for c in result.columns if not c.startswith("__anon")]
    return result.select(*keep)
