"""Test oracles (SURVEY §5.2): NetworkX for PageRank/CC/triangles, a pure
numpy synchronous LPA reference (NetworkX's asyn_lpa is nondeterministic).
Expected outputs are computed at test time, never stored."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd


def nx_digraph(edges: pd.DataFrame) -> nx.DiGraph:
    g = nx.DiGraph()
    g.add_edges_from(edges[["src", "dst"]].drop_duplicates().itertuples(index=False))
    return g


def nx_ungraph(edges: pd.DataFrame, self_loops: bool = True) -> nx.Graph:
    g = nx.Graph()
    e = edges[["src", "dst"]].drop_duplicates()
    if not self_loops:
        e = e[e["src"] != e["dst"]]
    g.add_edges_from(e.itertuples(index=False))
    # isolated-by-self-loop vertices must still exist as nodes
    g.add_nodes_from(pd.unique(edges[["src", "dst"]].to_numpy().ravel()))
    return g


def pagerank_oracle(edges: pd.DataFrame, damping: float = 0.85) -> dict[int, float]:
    """Pure-Python power iteration with dangling mass redistributed
    uniformly — the NetworkX `pagerank` semantics (its own implementation
    needs scipy, absent in this sandbox). Iterated to L1 err < 1e-13."""
    g = nx_digraph(edges)
    nodes = list(g)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    out_deg = {v: g.out_degree(v) for v in nodes}
    for _ in range(2000):
        dangling = sum(rank[v] for v in nodes if out_deg[v] == 0)
        new = {v: (1.0 - damping) / n + damping * dangling / n for v in nodes}
        for u in nodes:
            if out_deg[u]:
                share = damping * rank[u] / out_deg[u]
                for v in g.successors(u):
                    new[v] += share
        err = sum(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if err < 1e-13:
            break
    return rank


def cc_oracle(edges: pd.DataFrame) -> dict[int, int]:
    """component label = min vertex id in the component (exact match)."""
    g = nx_ungraph(edges)
    out: dict[int, int] = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def triangles_oracle(edges: pd.DataFrame) -> dict[int, int]:
    """per-vertex triangle counts on the undirected, self-loop-free graph."""
    return nx.triangles(nx_ungraph(edges, self_loops=False))


def lpa_oracle(edges: pd.DataFrame, max_iters: int = 10) -> dict[int, int]:
    """Pure-numpy synchronous LPA mirroring chaos_spark.algos.lpa exactly:
    undirected closure (distinct pairs, self-loops kept), every vertex
    adopts the most frequent incoming label (ties -> smallest), vertices
    with no messages keep their label; stop early when nothing changes."""
    e = edges[["src", "dst"]].drop_duplicates()
    und = pd.concat(
        [e, e.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
    ).drop_duplicates()
    verts = np.sort(pd.unique(und[["src", "dst"]].to_numpy().ravel()))
    label = {int(v): int(v) for v in verts}
    incoming: dict[int, list[int]] = {int(v): [] for v in verts}
    for s, d in und.itertuples(index=False):
        incoming[int(d)].append(int(s))
    for _ in range(max_iters):
        new = {}
        changed = False
        for v in verts:
            v = int(v)
            nbrs = incoming[v]
            if not nbrs:
                new[v] = label[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[label[u]] = counts.get(label[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
            changed = changed or best != label[v]
        label = new
        if not changed:
            break
    return label


def ppr_oracle(
    edges: pd.DataFrame, sources: list[int], damping: float = 0.85
) -> dict[int, float]:
    """Pure-Python personalized PageRank: teleport and dangling mass both
    follow pref = 1/|S| on the source set; rank0 = pref. Iterated to
    L1 err < 1e-13 (the algos.pagerank(sources=...) recurrence)."""
    g = nx_digraph(edges)
    nodes = list(g)
    s = set(sources)
    pref = {v: (1.0 / len(s) if v in s else 0.0) for v in nodes}
    rank = dict(pref)
    out_deg = {v: g.out_degree(v) for v in nodes}
    for _ in range(2000):
        dangling = sum(rank[v] for v in nodes if out_deg[v] == 0)
        new = {
            v: (1.0 - damping) * pref[v] + damping * dangling * pref[v]
            for v in nodes
        }
        for u in nodes:
            if out_deg[u]:
                share = damping * rank[u] / out_deg[u]
                for v in g.successors(u):
                    new[v] += share
        err = sum(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if err < 1e-13:
            break
    return rank
