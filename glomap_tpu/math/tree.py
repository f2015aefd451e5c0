"""Host-side graph utilities: maximum spanning tree + BFS ordering.

Counterpart of glomap/math/tree.{h,cc} (Boost Kruskal max-spanning-tree +
BFS). Tiny, irregular, not hot — runs on host with scipy/numpy per the
design stance in SURVEY.md §7.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import minimum_spanning_tree, breadth_first_order


def maximum_spanning_tree(num_nodes: int, edges_i: np.ndarray,
                          edges_j: np.ndarray, weights: np.ndarray):
    """Max spanning tree; returns (parent, bfs_order, root).

    parent[v] = parent node of v in the BFS tree (-1 for root / unreached).
    Weights are maximized (reference negates for Kruskal; we negate for
    scipy's minimum_spanning_tree).
    """
    if len(edges_i) == 0 or num_nodes == 0:
        return (np.full(num_nodes, -1, dtype=np.int64),
                np.arange(num_nodes, dtype=np.int64), 0)
    w = np.asarray(weights, dtype=np.float64)
    # strictly negative weights so zero entries aren't confused with
    # "no edge" in the sparse structure
    wmax = w.max()
    g = coo_matrix((-(w - wmax - 1.0), (edges_i, edges_j)),
                   shape=(num_nodes, num_nodes))
    g = g + g.T  # symmetrize
    mst = minimum_spanning_tree(g.tocsr())
    mst = mst + mst.T
    # root at the node with the largest incident weight sum (well-connected)
    deg = np.bincount(edges_i, weights=w, minlength=num_nodes) + \
        np.bincount(edges_j, weights=w, minlength=num_nodes)
    root = int(np.argmax(deg))
    order, parent = breadth_first_order(mst, root, directed=False,
                                        return_predecessors=True)
    parent = np.asarray(parent, dtype=np.int64)
    parent[parent < 0] = -1  # scipy uses -9999 sentinel for unreachable
    parent[root] = -1
    return parent, np.asarray(order, dtype=np.int64), root
