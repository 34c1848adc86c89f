"""Exact sequential-replay oracles for the three rows-only gate entries
(fluid_community, lpa_by_color, fluid_by_color).

These algorithms interleave a Jones–Plassmann coloring with per-class
sequential (Gauss–Seidel) relabels, so their pass structure is
data-dependent and a fixed SQL unroll would be fragile — which is why
they gate rows-only. The replays here ARE their value oracles (the same
code the pytest oracles in tests/test_fluid.py / tests/test_lpa_by_color
use — imported from here so there is exactly one replay per algorithm),
and the gate entries run them IN the gate at sf scale and assert equality
before returning, so the driver's rows-only count covers a result that
was value-checked in-engine (VERDICT r4 next-round #8).

Pure-python dict loops over the collected small gate graph (Θ(V+E) per
round — thousands of operations at sf0.01); the distributed engine path
under test stays untouched.
"""

from __future__ import annotations

from collections import Counter, defaultdict

EPS = 1e-10  # matches the engine's _EPS (algorithms/fluid.py)


def jp_coloring(vertices, edge_list):
    """Greedy coloring in decreasing (degree, id) order — the sequential
    fixpoint of Jones–Plassmann (same tie order the engine uses)."""
    adj = {v: set() for v in vertices}
    for u, v in edge_list:
        adj[u].add(v)
        adj[v].add(u)
    deg = {v: len(adj[v]) for v in vertices}
    color = {}
    for v in sorted(vertices, key=lambda x: (-deg[x], -x)):
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return adj, color


def seq_fluid(vertices, edge_list, seed_ids, max_iter=100):
    """Synchronous Fluid Communities replay: density 1/|community|,
    argmax over neighbor labels (ties → min), update only on a strict
    density win; stops on a 2-cycle (the synchronous oscillation guard
    the engine uses)."""
    adj = {v: set() for v in vertices}
    for u, v in edge_list:
        adj[u].add(v)
        adj[v].add(u)
    lab = {v: -1 for v in vertices}
    for i, s in enumerate(sorted(seed_ids)):
        lab[s] = i
    l1 = {v: -2 for v in vertices}
    l2 = {v: -2 for v in vertices}
    for _ in range(max_iter):
        cnt = {}
        for v in vertices:
            if lab[v] >= 0:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
        new = {}
        for v in vertices:
            d = {}
            for u in adj[v] | {v}:
                if lab[u] >= 0:
                    d[lab[u]] = d.get(lab[u], 0.0) + 1.0 / cnt[lab[u]]
            if not d:
                new[v] = lab[v]
                continue
            bd = max(d.values())
            bl = min(i for i, w in d.items() if w == bd)
            cur = d.get(lab[v], 0.0)
            if lab[v] < 0 or bd > cur + EPS:
                new[v] = bl
            else:
                new[v] = lab[v]
        l2, l1 = l1, dict(lab)
        lab = new
        if all(lab[v] == l1[v] or lab[v] == l2[v] for v in vertices):
            break
    return lab


def seq_fluid_by_color(vertices, edge_list, seed_ids, max_rounds=100):
    """Color-scheduled Fluid replay: classes relabel sequentially inside
    a round (Gauss–Seidel across classes, synchronous within — each
    class is an independent set)."""
    adj, color = jp_coloring(vertices, edge_list)
    classes = sorted(set(color.values()))
    lab = {v: -1 for v in vertices}
    for i, s in enumerate(sorted(seed_ids)):
        lab[s] = i
    for _ in range(max_rounds):
        cnt = {}
        for v in vertices:
            if lab[v] >= 0:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
        changed = False
        for c in classes:
            upd = {}
            for v in (x for x in vertices if color[x] == c):
                d = {}
                for u in adj[v] | {v}:
                    if lab[u] >= 0:
                        d[lab[u]] = d.get(lab[u], 0.0) + 1.0 / cnt[lab[u]]
                if not d:
                    continue
                bd = max(d.values())
                bl = min(i for i, w in d.items() if w == bd)
                curw = d.get(lab[v], 0.0)
                if lab[v] < 0 or bd > curw + EPS:
                    upd[v] = bl
            for v, nl in upd.items():
                if lab[v] != nl:
                    changed = True
                lab[v] = nl
        if not changed:
            break
    return lab


def seq_lpa_by_color(verts, und_edges, max_rounds=10):
    """Color-scheduled LPA replay: most-frequent neighbor label, ties →
    min, classes relabel sequentially inside a round."""
    adj = defaultdict(set)
    for u, v in und_edges:
        adj[u].add(v)
        adj[v].add(u)
    verts = list(verts)
    deg = {v: len(adj[v]) for v in verts}
    order = sorted(verts, key=lambda v: (-deg[v], -v))
    color = {}
    for v in order:
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    classes = sorted(set(color.values()))
    label = {v: v for v in verts}
    for _ in range(max_rounds):
        changed = False
        for c in classes:
            members = [v for v in verts if color[v] == c]
            upd = {}
            for v in members:
                cnt = Counter(label[u] for u in adj[v])
                if not cnt:
                    continue
                upd[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for v, lab in upd.items():
                if label[v] != lab:
                    changed = True
                label[v] = lab
        if not changed:
            break
    return label
