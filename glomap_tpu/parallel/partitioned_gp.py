"""Partition-aware distributed global positioning.

Same distribution shape as parallel/partitioned_ba (points + observations
sharded by graph part under shard_map, frame centers replicated, the
reduced frame system psum'd over the mesh; point-axis reductions local
because observations are co-located with their point's shard), applied to
the BATA translation solver (estimators/global_positioning._solve_gp).
Camera-to-camera constraints touch only frames, so they are round-robin
split across parts and their frame reductions psum'd.

Reference counterpart: none — GLOMAP's GlobalPositioner is a single
Ceres solve (global_positioning.cc:28-93); this layer is the SURVEY.md
§2.3 distributed design.
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from glomap_tpu.parallel.partitioned_ba import (obs_part_layout,
                                                partition_points,
                                                scatter_to_parts)

logger = logging.getLogger(__name__)


class PartitionedGP:
    """Reusable partition plan + shard_map runner for repeated _solve_gp
    calls on one observation structure (the GP annealing/rig paths call
    the solver several times with different inits / rig offsets)."""

    def __init__(self, scene, tracks, mesh, o_frame, o_point, obs_w,
                 t_obs, cc_i, cc_j, t_cc, cc_w, num_frames: int,
                 dtype=jnp.float64):
        from glomap_tpu.ops.pallas_kernels import block_width_for_sorted
        from glomap_tpu.utils.padding import bucket_size

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.dtype = dtype
        self.num_frames = num_frames
        Pn = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.plan = partition_points(scene, tracks, Pn, o_point, o_frame)
        self._fn_cache = {}
        plan = self.plan
        self.Tmax = plan.points_per_part
        self.Pn = Pn

        T = tracks.num_tracks
        loc_of = np.zeros(max(T, 1), dtype=np.int64)
        part_of = np.zeros(max(T, 1), dtype=np.int64)
        loc_of[plan.point_ids] = plan.point_local
        part_of[plan.point_ids] = plan.point_part

        obs_part = part_of[o_point]
        o_local = loc_of[o_point].astype(np.int32)
        self._layout = obs_part_layout(obs_part, Pn, second_key=o_local)
        order, per_part, off, Omax = self._layout

        self.of_parts = scatter_to_parts(
            np.asarray(o_frame, np.int32), order, per_part, off, Omax,
            tail_repeat=True)
        self.op_parts = scatter_to_parts(o_local, order, per_part, off,
                                         Omax, tail_repeat=True)
        ow = scatter_to_parts(np.asarray(obs_w, np.float64), order,
                              per_part, off, Omax)
        self.ow_parts = ow
        self.tT_parts = np.ascontiguousarray(
            scatter_to_parts(np.asarray(t_obs, np.float64), order,
                             per_part, off, Omax).transpose(0, 2, 1))

        pw = max(block_width_for_sorted(self.op_parts[p])
                 for p in range(Pn))
        self.point_width = pw if pw <= 4096 else 0

        # camera-to-camera edges: round-robin split (frames replicated)
        n_cc = len(cc_i)
        if n_cc:
            Ec = bucket_size(-(-n_cc // Pn), 64)
            self.ci_parts = np.zeros((Pn, Ec), np.int32)
            self.cj_parts = np.zeros((Pn, Ec), np.int32)
            self.cw_parts = np.zeros((Pn, Ec))
            tcc = np.zeros((Pn, Ec, 3))
            eparts = np.arange(n_cc) % Pn
            for p in range(Pn):
                sel = eparts == p
                n = int(sel.sum())
                self.ci_parts[p, :n] = cc_i[sel]
                self.cj_parts[p, :n] = cc_j[sel]
                self.cw_parts[p, :n] = cc_w[sel]
                tcc[p, :n] = t_cc[sel]
            self.tccT_parts = np.ascontiguousarray(tcc.transpose(0, 2, 1))
        else:
            self.ci_parts = np.zeros((Pn, 0), np.int32)
            self.cj_parts = np.zeros((Pn, 0), np.int32)
            self.cw_parts = np.zeros((Pn, 0))
            self.tccT_parts = np.zeros((Pn, 3, 0))

        logger.info("partitioned GP: %d parts, %d pts/part, %d obs/part, "
                    "cut=%.2f%%", Pn, self.Tmax, Omax,
                    100.0 * plan.cut_fraction)

    def _scatter_points(self, X):
        out = np.zeros((self.Pn, self.Tmax, 3))
        plan = self.plan
        out[plan.point_part, plan.point_local] = X[plan.point_ids]
        return out

    def solve(self, c0, X0, u_rig, huber_delta, function_tol,
              max_iters, cg_iters=100, cg_tol=1e-2):
        """c0 (F,3), X0 (num_points,3), u_rig (O,3) host arrays ->
        (c, X, cost, it) host arrays (X in the global point order)."""
        from glomap_tpu.estimators.global_positioning import _solve_gp
        from glomap_tpu.parallel.multihost import fetch_global, put_global

        order, per_part, off, Omax = self._layout
        uT_parts = np.ascontiguousarray(
            scatter_to_parts(np.asarray(u_rig, np.float64), order,
                             per_part, off, Omax).transpose(0, 2, 1))
        X0_parts = self._scatter_points(np.asarray(X0, np.float64))
        axis = self.axis

        # memoize the shard_map wrapper per static solver config: a
        # fresh closure per call would miss jax's dispatch cache and pay
        # the full (remote) compile on every anneal/alternation round
        key = (float(huber_delta), float(function_tol), int(max_iters),
               int(cg_iters), float(cg_tol))
        fn = self._fn_cache.get(key)
        if fn is None:
            def body(c0_l, X0_l, of, op, tT, uT, ow, ci, cj, tccT, cw):
                c, X, cost, it, _lam, _done = _solve_gp(
                    c0_l, X0_l[0], of[0], op[0], tT[0], uT[0], ow[0],
                    ci[0], cj[0], tccT[0], cw[0],
                    self.num_frames, self.Tmax,
                    key[0], key[1], key[2], key[3], cg_tol=key[4],
                    point_width=self.point_width, mesh_axis=axis)
                return c, X[None], cost, it

            sh = P(axis)
            rp = P()
            fn = jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=(rp,) + (sh,) * 10,
                out_specs=(rp, sh, rp, rp), check_vma=False))
            self._fn_cache[key] = fn
        sh = P(axis)
        rp = P()
        dt = self.dtype
        _ps = lambda a, d=dt: put_global(np.asarray(a, d), self.mesh, sh)
        _pr = lambda a, d=dt: put_global(np.asarray(a, d), self.mesh, rp)
        c, X, cost, it = fn(
            _pr(c0), _ps(X0_parts), _ps(self.of_parts, np.int32),
            _ps(self.op_parts, np.int32), _ps(self.tT_parts),
            _ps(uT_parts), _ps(self.ow_parts), _ps(self.ci_parts, np.int32),
            _ps(self.cj_parts, np.int32), _ps(self.tccT_parts),
            _ps(self.cw_parts))

        c_np = np.asarray(c, np.float64)
        Xg = fetch_global(X).astype(np.float64)
        X_out = np.asarray(X0, np.float64).copy()
        plan = self.plan
        X_out[plan.point_ids] = Xg[plan.point_part, plan.point_local]
        return c_np, X_out, float(cost), int(it)
