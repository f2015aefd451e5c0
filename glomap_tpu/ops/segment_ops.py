"""Index-axis traffic for lane-major solvers: matmul segment ops.

TPU scatter-adds are the slowest ops in an LM solve (~1 ms per
100k-element 1-D scatter measured on v5e) and lane-axis gathers run at
~5 GB/s, so BOTH directions of every per-observation index axis must be
matmuls (SURVEY.md §3.5; the reference's counterpart is Ceres'
sparse-matrix products inside SPARSE_SCHUR):

 * small segment axis  -> one-hot dot; XLA fuses the iota-compare into
   the MXU op so no (O, n) operand materializes;
 * sorted segment axis -> the Pallas blocked local-one-hot kernels
   (ops/pallas_kernels.py), O(O * width) work independent of n_seg —
   the city-scale path (points: observations are ordered by track);
 * unsorted + over budget -> per-row 1-D segment sums (fallback).

Shared by estimators/bundle_adjustment.py and
estimators/global_positioning.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def segment_ids_from_offsets(offsets, num_rows: int):
    """(P+1,) CSR offsets -> (num_rows,) int32 segment ids, on device.

    Equivalent to jnp.searchsorted(offsets[1:], arange(num_rows),
    side="right") but via scatter-ones-at-segment-ends + cumsum: the
    vectorized binary search measured 836 ms for 8.3M rows on the v5e
    (70% of the whole inlier sweep at ~0.1% HBM util); this form is
    27 ms. Empty segments accumulate +2 at one index and are skipped.
    Rows >= offsets[-1] (bucket padding) get id >= P, exactly like
    searchsorted — out of range for every segment reduction, so padded
    callers don't corrupt the last real segment; the size-(num_rows+1)
    scratch keeps ends == num_rows in scatter range."""
    starts = jnp.zeros(num_rows + 1, jnp.int32).at[offsets[1:]].add(1)
    return jnp.cumsum(starts[:num_rows])


def axis_window(ids_padded: np.ndarray, cap: int = 4096) -> int:
    """Static Pallas kernel window for a sorted id axis, or 0 if locality
    is too weak for the windowed kernels to pay off (host-side)."""
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
    w = block_width_for_sorted(ids_padded)
    return w if w <= cap else 0


def make_axis_ops(idx, n_seg: int, num_obs: int, dtype,
                  sorted_width: int = 0, one_hot_budget: int = 1 << 28,
                  psum_axis: str | None = None):
    """-> (reduce: (k, O) -> (n_seg, k), gather: (n_seg, k) -> (k, O)).

    idx: (O,) int32 segment ids (a traced array); n_seg/num_obs/widths
    static. Call inside jit.

    psum_axis: when running inside shard_map with the obs axis sharded
    and the segment table replicated, reductions return local partials —
    name the mesh axis here and every reduce is followed by one
    jax.lax.psum over it (the distributed Schur/camera-system assembly,
    SURVEY.md §2.3). Gathers from replicated tables stay collective-free.
    """
    reduce, gather = _make_axis_ops_local(idx, n_seg, num_obs, dtype,
                                          sorted_width, one_hot_budget)
    if psum_axis is not None:
        reduce_local = reduce

        def reduce(vals, exact=False):
            return jax.lax.psum(reduce_local(vals, exact=exact),
                                psum_axis)
    return reduce, gather


def make_axis_pair_ops(idx, n_seg: int, num_obs: int, dtype,
                       sorted_width: int = 0, one_hot_budget: int = 1 << 28,
                       psum_axis: str | None = None):
    """-> (reduce, gather, reduce_pairs, gather_dot).

    The fused variants keep the BA CG matvec's intermediate row stacks
    out of HBM (ops/pallas_kernels.py pair kernels):
      reduce_pairs(U, V, pairs): (n_seg, R) with
          out[s, r] = sum_{o in s} sum_{(a, b) in pairs[r]} U[a,o]*V[b,o]
      gather_dot(tab, U): (nr, O) with
          out[r, o] = sum_j U[r*k + j, o] * tab[idx[o], j]
    On the one-hot / fallback axes they compose the same results from the
    plain ops (XLA fuses those fine — no custom calls to defeat CSE)."""
    reduce_local, gather = _make_axis_ops_local(idx, n_seg, num_obs, dtype,
                                                sorted_width, one_hot_budget)
    if psum_axis is not None:
        def reduce(vals, exact=False):
            return jax.lax.psum(reduce_local(vals, exact=exact),
                                psum_axis)
    else:
        reduce = reduce_local
    if sorted_width:
        from glomap_tpu.ops.pallas_kernels import (
            _on_tpu, sorted_segment_gather_dot, sorted_segment_pair_rowsum)
        interp = not _on_tpu()

        def reduce_pairs_local(U, V, pairs):
            return sorted_segment_pair_rowsum(U, V, pairs, idx, n_seg,
                                              sorted_width,
                                              interpret=interp)

        def gather_dot(tab, U):
            return sorted_segment_gather_dot(tab, idx, U, sorted_width,
                                             interpret=interp)
    else:
        def reduce_pairs_local(U, V, pairs):
            rows = jnp.stack([sum(U[a] * V[b] for a, b in terms)
                              for terms in pairs])
            return reduce_local(rows)

        def gather_dot(tab, U):
            rows = gather(tab)  # (k, O)
            k = rows.shape[0]
            nr = U.shape[0] // k
            return jnp.einsum("rko,ko->ro",
                              U.reshape(nr, k, U.shape[1]), rows)
    if psum_axis is not None:
        def reduce_pairs(U, V, pairs):
            return jax.lax.psum(reduce_pairs_local(U, V, pairs), psum_axis)
    else:
        reduce_pairs = reduce_pairs_local
    return reduce, gather, reduce_pairs, gather_dot


def _make_axis_ops_local(idx, n_seg, num_obs, dtype, sorted_width,
                         one_hot_budget):
    # `exact` on BOTH directions: one-hot contractions run on the MXU
    # at bf16 by default, which rounds the f32 VALUE operand to ~3
    # digits (the 0/1 one-hot side is exact either way). exact=True
    # forces bf16x3 (Precision.HIGHEST — exact for f32). Measured
    # consequence of a rounded REDUCTION: GP's gradient/moment sums at
    # scene extent 50 floored LM at per-obs residual ~2.6e-3 = the bf16
    # unit roundoff (cost 17 vs the fallback path's 6e-6, round 5).
    # Value-critical once-per-iteration assemblies pass exact=True; the
    # CG-loop matvecs keep exact=False (the forcing tolerance absorbs
    # operator rounding; HIGHEST there cost ~10% — BENCH_NOTES r4).
    if sorted_width:
        from glomap_tpu.ops.pallas_kernels import (
            _on_tpu, sorted_segment_gather, sorted_segment_rowsum)
        interp = not _on_tpu()

        def reduce(vals, exact=False):
            return sorted_segment_rowsum(vals, idx, n_seg,
                                         sorted_width, interpret=interp,
                                         exact=exact)

        def gather(tab, exact=True):
            return sorted_segment_gather(tab, idx, sorted_width,
                                         interpret=interp, exact=exact)
        return reduce, gather

    if n_seg * num_obs <= one_hot_budget:
        onehot = jax.nn.one_hot(idx, n_seg, dtype=dtype)  # (O, n)

        def reduce(vals, exact=False):
            prec = jax.lax.Precision.HIGHEST if exact else None
            return jnp.einsum("ko,on->nk", vals, onehot,
                              precision=prec)

        def gather(tab, exact=True):
            prec = jax.lax.Precision.HIGHEST if exact else None
            return jnp.einsum("nk,on->ko", tab, onehot, precision=prec)
        return reduce, gather

    def reduce(vals, exact=False):
        return jnp.stack(
            [jax.ops.segment_sum(vals[i], idx, num_segments=n_seg)
             for i in range(vals.shape[0])], axis=-1)

    def gather(tab, exact=True):
        return tab.T[:, idx]
    return reduce, gather
