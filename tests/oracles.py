"""Tiny pure-Python/numpy oracles for golden-fixture tests (FIXTURES.md §4).

Each oracle independently implements the reference's semantics from first
principles over an in-memory edge list, so DataFrame results can be checked
against them without trusting any shared code path.
"""

from __future__ import annotations

from collections import Counter, defaultdict, deque

INF = float("inf")


def symmetrize(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Both directions, duplicates kept (worker/worker.go:164-199)."""
    return list(pairs) + [(d, s) for s, d in pairs]


def pagerank_oracle(
    pairs: list[tuple[int, int]],
    iterations: int = 30,
    damping: float = 0.85,
    init: str = "zeros",
    tol: float | None = None,
) -> dict[int, float]:
    """Reference-mode PageRank: zeros init, fixed damped updates
    (worker/pagerank.go:30, SURVEY.md §2-note-1). With ``tol`` set, iterate
    from the given init until max-abs delta < tol instead.
    """
    sym = symmetrize(pairs)
    nodes = sorted({v for e in sym for v in e})
    n = len(nodes)
    deg = Counter(s for s, _ in sym)
    x = {v: (0.0 if init == "zeros" else 1.0 / n) for v in nodes}
    k = 0
    while True:
        if tol is None and k >= iterations:
            break
        sums = defaultdict(float)
        for s, d in sym:
            sums[d] += x[s] / deg[s]
        new = {v: (1 - damping) / n + damping * sums[v] for v in nodes}
        delta = max(abs(new[v] - x[v]) for v in nodes)
        x = new
        k += 1
        if tol is not None and delta < tol:
            break
        if tol is not None and k > 10_000:
            raise RuntimeError("oracle did not converge")
    return x


def bfs_oracle(pairs: list[tuple[int, int]], source: int) -> dict[int, float]:
    """Unit-weight SSSP = BFS hops on the symmetrized graph; unreachable = inf."""
    adj = defaultdict(set)
    for s, d in symmetrize(pairs):
        adj[s].add(d)
    nodes = sorted({v for e in pairs for v in e})
    dist = {v: INF for v in nodes}
    if source not in dist:
        return dist  # absent source: everything unreachable (engine semantics)
    dist[source] = 0.0
    q = deque([source])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if dist[w] == INF:
                dist[w] = dist[u] + 1.0
                q.append(w)
    return dist


def components_oracle(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min vertex id in the component."""
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nodes = {v for e in pairs for v in e}
    for v in nodes:
        parent[v] = v
    for s, d in pairs:
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for v in nodes:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in nodes}


def lpa_oracle(pairs: list[tuple[int, int]], max_iter: int = 10) -> dict[int, int]:
    """Synchronous LPA, multiplicity-weighted, min-label tie-break, early exit
    on fixpoint — mirrors sparkgraph.algorithms.lpa's contract exactly."""
    sym = symmetrize(pairs)
    adj = defaultdict(list)
    for s, d in sym:
        adj[s].append(d)
    nodes = sorted({v for e in sym for v in e})
    label = {v: v for v in nodes}
    for _ in range(max_iter):
        new = {}
        for v in nodes:
            counts = Counter(label[u] for u in adj[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def triangles_oracle(pairs: list[tuple[int, int]]) -> int:
    """Brute force O(V³) on the deduped simple undirected graph."""
    edges = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    nodes = sorted({v for e in edges for v in e})
    eset = set(edges)
    count = 0
    for i, a in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            b = nodes[j]
            if (a, b) not in eset:
                continue
            for k in range(j + 1, len(nodes)):
                c = nodes[k]
                if (a, c) in eset and (b, c) in eset:
                    count += 1
    return count


def scc_oracle(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan SCC; label = min vertex id in the component."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, iter(adj.get(root, ())))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return label


def betweenness_oracle(
    pairs: list[tuple[int, int]],
    pivots: list[int] | None = None,
    normalize: bool = True,
) -> dict[int, float]:
    """Brandes betweenness on the simple undirected graph; ``pivots`` limits
    sources (sampled estimator scaled by n/k); endpoints excluded, undirected
    halving, optional (n-1)(n-2)/2 normalization."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    n = len(verts)
    sources = pivots if pivots is not None else verts
    bc = {v: 0.0 for v in verts}
    for s in sources:
        sigma = {v: 0.0 for v in verts}
        dist = {v: -1 for v in verts}
        preds: dict[int, list[int]] = {v: [] for v in verts}
        sigma[s], dist[s] = 1.0, 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in verts}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    scale = (n / float(len(sources))) * 0.5
    out = {v: bc[v] * scale for v in verts}
    if normalize:
        denom = max((n - 1) * (n - 2) / 2.0, 1.0)
        out = {v: x / denom for v, x in out.items()}
    return out
