"""Algorithm suite — one module per algorithm, each an iterative (or
single-pass) DataFrame job built on the scatter/gather contract in
chaos_spark.engine. Reference suite: [X13] §5.2 Table 2 / [C15] §6;
required set per BASELINE.json north_rule: pagerank, cc, lpa, triangles.
Stretch set (reference parity): bfs, sssp, spmv, k-core, MIS, SCC,
bipartiteness, Borůvka MSF, HyperANF.
"""

from .pagerank import pagerank
from .cc import connected_components
from .lpa import label_propagation
from .triangles import triangle_count, triangle_counts_per_vertex
from .bfs import bfs, sssp
from .kcores import k_core
from .mis import maximal_independent_set
from .scc import strongly_connected_components
from .bipartite import bipartite_check
from .mcst import minimum_spanning_forest
from .hyperanf import hyper_anf
from .als import als
from .bp import belief_propagation
from .conductance import conductance

__all__ = [
    "als",
    "belief_propagation",
    "conductance",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_counts_per_vertex",
    "bfs",
    "sssp",
    "k_core",
    "maximal_independent_set",
    "strongly_connected_components",
    "bipartite_check",
    "minimum_spanning_forest",
    "hyper_anf",
]
