"""Deterministic test fixtures per FIXTURES.md — corpus + oracle graphs.

Everything is seeded (default 42); two calls with the same arguments yield
byte-identical content. The corpus generator records its ground truth
(intended edge set + per-row sha256) so tests can assert the BASELINE.json
per-row invariant (content sha256 equality) and extraction completeness.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .generators import rmat_edges_numpy

LANGS = ["python", "c", "java", "javascript"]
EXT = {"python": "py", "c": "h", "java": "java", "javascript": "js"}
COMMENT = {"python": "#", "c": "//", "java": "//", "javascript": "//"}


def _import_line(lang: str, stem: str, alt: bool) -> str:
    """Render an import of ``stem`` = 'pkg{a}/mod{b}' in ``lang``'s syntax
    (FIXTURES.md §1)."""
    dotted = stem.replace("/", ".")
    if lang == "python":
        return f"from {dotted} import x" if alt else f"import {dotted}"
    if lang == "c":
        return f'#include "{stem}.h"'
    if lang == "java":
        return f"import {dotted};"
    return f'import x from "./{stem}.js"' if alt else f'require("./{stem}.js")'


@dataclass
class Corpus:
    """Generated corpus + ground truth."""

    files: pd.DataFrame  # repo, path, commit, lang, content  (input_hint shape)
    truth_edges: pd.DataFrame  # repo, src_path, dst_path (resolvable, dedup)
    truth_sha: pd.DataFrame  # repo, path, sha256 (hex) of content
    n_unresolvable: int  # injected imports pointing nowhere


def gen_source_files(
    n_rows: int = 2000,
    seed: int = 42,
    n_repos: int = 20,
    unresolvable_frac: float = 0.05,
    max_imports: int = 6,
) -> Corpus:
    """FIXTURES.md §1 `source_files` generator.

    Import targets are drawn from a Zipf(a=2.0) over the same repo's files,
    giving hub skew; ~``unresolvable_frac`` of import lines point at
    non-existent paths and must be dropped (not crash) by extraction.
    """
    rng = np.random.default_rng(seed)
    rows, truth, shas = [], [], []
    n_unres = 0
    per_repo = [n_rows // n_repos + (1 if i < n_rows % n_repos else 0) for i in range(n_repos)]
    gi = 0  # global file index for lang round-robin
    for r, m in enumerate(per_repo):
        repo = f"repo{r:03d}"
        # Unique (a, b) per repo -> unique path stems within the repo.
        stems = [f"pkg{i // 10}/mod{i % 10}" for i in range(m)]
        langs = [LANGS[(gi + i) % len(LANGS)] for i in range(m)]
        paths = [f"{stems[i]}.{EXT[langs[i]]}" for i in range(m)]
        gi += m
        for i in range(m):
            lang, stem, path = langs[i], stems[i], paths[i]
            k = int(rng.integers(0, max_imports))
            # Zipf(2.0) over repo file indices -> hub skew on low indices.
            targets = (rng.zipf(2.0, size=k) - 1) % m if k else np.array([], dtype=int)
            lines = [f"{COMMENT[lang]} {repo}/{path} generated fixture"]
            seen: set[int] = set()
            for j, t in enumerate(targets):
                t = int(t)
                if t == i or t in seen:
                    continue
                seen.add(t)
                if rng.random() < unresolvable_frac:
                    n_unres += 1
                    lines.append(_import_line(lang, f"pkg99/mod{int(rng.integers(0, 100))}", j % 2 == 1))
                else:
                    lines.append(_import_line(lang, stems[t], j % 2 == 1))
                    truth.append((repo, path, paths[t]))
            lines.append(f"{COMMENT[lang]} filler {rng.integers(0, 1 << 30)}")
            content = "\n".join(lines) + "\n"
            commit = hashlib.sha256(f"{repo}:{path}:{seed}".encode()).hexdigest()[:40]
            rows.append((repo, path, commit, lang, content))
            shas.append((repo, path, hashlib.sha256(content.encode()).hexdigest()))
    files = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    truth_df = (
        pd.DataFrame(truth, columns=["repo", "src_path", "dst_path"])
        .drop_duplicates()
        .reset_index(drop=True)
    )
    sha_df = pd.DataFrame(shas, columns=["repo", "path", "sha256"])
    return Corpus(files, truth_df, sha_df, n_unres)


# ---------------------------------------------------------------------------
# Oracle graph fixtures (FIXTURES.md §3)
# ---------------------------------------------------------------------------

def g1_chain() -> pd.DataFrame:
    """Path 0->1->...->7: dangling vertex 7, trivial CC."""
    return pd.DataFrame({"src": range(7), "dst": range(1, 8)})


def g2_star() -> pd.DataFrame:
    """Hub 0 -> {1..99} plus back-edge 50 -> 0: hub skew + dangling mass."""
    src = [0] * 99 + [50]
    dst = list(range(1, 100)) + [0]
    return pd.DataFrame({"src": src, "dst": dst})


def g3_cliques() -> pd.DataFrame:
    """Two 5-cliques {0..4}, {5..9} + bridge 4->5 + isolated vertex 10
    (as self-loop 10->10 so it appears in the edge table)."""
    edges = [(i, j) for i in range(5) for j in range(5) if i != j]
    edges += [(i, j) for i in range(5, 10) for j in range(5, 10) if i != j]
    edges.append((4, 5))
    edges.append((10, 10))
    return pd.DataFrame(edges, columns=["src", "dst"])


def g4_powerlaw(scale: int = 14, num_edges: int = 100_000, seed: int = 42) -> pd.DataFrame:
    """Seeded RMAT-style power-law graph (~10^4 vertices, 10^5 edges);
    duplicates kept — exercises dedup, convergence at 1e-6, skew."""
    return rmat_edges_numpy(scale, num_edges, seed=seed)
