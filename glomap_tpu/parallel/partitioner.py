"""View-graph / track partitioner for multi-host distribution.

BASELINE.json's north star replaces METIS-style partitioning with a
JAX/NumPy-side spectral + greedy partitioner: frames are split into P
balanced parts minimizing cut covisibility weight (recursive spectral
bisection on the frame covisibility Laplacian with greedy balancing),
then observations are assigned to their frame's part; boundary cameras
and cut statistics are reported so the distributed solvers can replicate
what they must and psum the rest (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.linalg import eigsh

from glomap_tpu.scene.arrays import Scene, Tracks


@dataclass
class Partition:
    frame_part: np.ndarray       # (F,) part id per frame
    num_parts: int
    edge_cut: float              # total cut covisibility weight
    total_weight: float
    sizes: np.ndarray            # frames per part

    @property
    def cut_fraction(self):
        return self.edge_cut / max(self.total_weight, 1e-12)


def covisibility_graph(scene: Scene, tracks: Tracks):
    """Frame-pair covisibility counts (reuses the pruning machinery)."""
    from glomap_tpu.processors.pruning import _covisibility_edges
    return _covisibility_edges(scene, tracks)


def _fiedler_split(nodes, ei, ej, w):
    """Split `nodes` by the Fiedler vector of the weighted sub-Laplacian;
    returns boolean mask (True = side A), balanced at the median."""
    n = len(nodes)
    if n <= 1:
        return np.zeros(n, dtype=bool)
    remap = -np.ones(nodes.max() + 1 if len(nodes) else 1, dtype=np.int64)
    remap[nodes] = np.arange(n)
    a = remap[ei]
    b = remap[ej]

    # A disconnected subgraph has a multi-dimensional null space and the
    # second eigenvector is an arbitrary rotation inside it — NOT the
    # Fiedler vector (one isolated frame was enough to produce a 22% cut
    # on a path graph). Pack whole components into two balanced sides
    # first; spectral bisection only ever sees a connected graph.
    from scipy.sparse.csgraph import connected_components
    A = coo_matrix((w, (a, b)), shape=(n, n))
    ncomp, labels = connected_components(A, directed=False)
    if ncomp > 1:
        sizes = np.bincount(labels, minlength=ncomp)
        order = np.argsort(-sizes)
        side_of_comp = np.zeros(ncomp, dtype=bool)
        tot = [0, 0]
        for c in order:
            pick = int(tot[1] < tot[0])
            side_of_comp[c] = bool(pick)
            tot[pick] += int(sizes[c])
        if max(tot) <= 0.6 * n:
            return side_of_comp[labels]
        # a single giant component + crumbs: split the giant spectrally
        # and sprinkle the crumbs onto the smaller side afterwards
        giant = order[0]
        sel_nodes = np.nonzero(labels == giant)[0]
        sub = (labels[a] == giant) & (labels[b] == giant)
        side_giant = _fiedler_split(nodes[sel_nodes], ei[sub], ej[sub],
                                    w[sub])
        side = np.zeros(n, dtype=bool)
        side[sel_nodes] = side_giant
        crumbs = np.nonzero(labels != giant)[0]
        # alternate crumbs to keep exact balance
        half = n // 2
        need = half - int(side.sum())
        side[crumbs[:max(need, 0)]] = True
        return side

    L = coo_matrix((np.concatenate([-w, -w]),
                    (np.concatenate([a, b]), np.concatenate([b, a]))),
                   shape=(n, n)).tocsr()
    deg = -np.asarray(L.sum(axis=1)).ravel()
    L = L + coo_matrix((deg + 1e-9, (np.arange(n), np.arange(n))),
                       shape=(n, n))
    if n <= 3:
        fiedler = np.arange(n, dtype=np.float64)
    else:
        # deterministic start vector: eigsh otherwise seeds from the
        # global RNG and different processes would compute DIFFERENT
        # partitions of the same graph (multi-host runs upload only
        # their local shards, so all hosts must agree bit-for-bit)
        v0 = np.random.default_rng(12345).standard_normal(n)
        fiedler = None
        try:
            # shift-invert mode: factorize once, converge in a few
            # Lanczos steps — plain which="SM" stalls beyond ~5k nodes
            # (observed at 10k frames: fell to the random fallback and
            # produced a 75% edge cut)
            vals, vecs = eigsh(L, k=2, sigma=-1e-3, which="LM",
                               maxiter=1000, v0=v0)
            fiedler = vecs[:, np.argsort(vals)[1]]
        except Exception:
            try:
                vals, vecs = eigsh(L, k=2, which="SM", maxiter=5000,
                                   v0=v0)
                fiedler = vecs[:, np.argsort(vals)[1]]
            except Exception:
                fiedler = np.random.default_rng(0).standard_normal(n)
    # balanced split at the median of the Fiedler vector
    thresh = np.median(fiedler)
    side = fiedler > thresh
    # enforce exact balance by moving borderline nodes
    imbalance = int(side.sum()) - n // 2
    if imbalance != 0:
        order = np.argsort(np.abs(fiedler - thresh))
        for idx in order:
            if imbalance > 0 and side[idx]:
                side[idx] = False
                imbalance -= 1
            elif imbalance < 0 and not side[idx]:
                side[idx] = True
                imbalance += 1
            if imbalance == 0:
                break
    return side


def partition_frames(scene: Scene, tracks: Tracks, num_parts: int
                     ) -> Partition:
    """Recursive spectral bisection of the frame covisibility graph."""
    f1, f2, w = covisibility_graph(scene, tracks)
    return partition_graph(scene.num_frames, f1, f2, w, num_parts)


def partition_graph(F: int, f1: np.ndarray, f2: np.ndarray, w: np.ndarray,
                    num_parts: int) -> Partition:
    """Partition an arbitrary weighted node graph (the METIS-replacement
    core: recursive balanced Fiedler bisection)."""
    w = w.astype(np.float64)
    part = np.zeros(F, dtype=np.int64)

    def recurse(nodes, parts_left, base):
        if parts_left <= 1 or len(nodes) <= 1:
            part[nodes] = base
            return
        in_set = np.zeros(F, dtype=bool)
        in_set[nodes] = True
        sel = in_set[f1] & in_set[f2]
        side = _fiedler_split(nodes, f1[sel], f2[sel], w[sel])
        left = nodes[~side]
        right = nodes[side]
        half = parts_left // 2
        recurse(left, parts_left - half, base)
        recurse(right, half, base + (parts_left - half))

    recurse(np.arange(F, dtype=np.int64), num_parts, 0)

    cut = float(w[part[f1] != part[f2]].sum())
    sizes = np.bincount(part, minlength=num_parts)
    return Partition(frame_part=part, num_parts=num_parts, edge_cut=cut,
                     total_weight=float(w.sum()), sizes=sizes)


def assign_observations(scene: Scene, tracks: Tracks,
                        partition: Partition) -> np.ndarray:
    """Per-observation part id (the part of the observing frame)."""
    return partition.frame_part[scene.image_frame[tracks.obs_image]]
