"""TPU component benchmarks: rotation averaging (dense + PCG paths) and
global positioning — the BASELINE.md per-kernel measurements the driver
bench (global BA) does not cover.

Problem shapes mirror the reference's scaling regime: RA at 2000 frames /
40k edges (dense MXU Cholesky path) and the same graph forced onto the
Jacobi-PCG path (the >3072-frame branch); GP at 100 frames / 100k
observations (the bench.py scene scale).

Usage: python scripts/bench_components.py   (plain env; runs on the TPU)
Prints one JSON line per benchmark.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/glomap_bench_components.npz"


def prepare():
    """Host-side problem synthesis (pure-CPU subprocess)."""
    from glomap_tpu.math import rotation as rotm

    rng = np.random.default_rng(3)
    # --- rotation averaging: ring-of-frames graph with local edges ---
    F = 2000
    deg = 20
    q_gt = rng.standard_normal((F, 4))
    q_gt /= np.linalg.norm(q_gt, axis=1, keepdims=True)
    # sequential-capture locality (no wraparound: wrap edges would
    # unbound the windowed-matvec block spans, as on real captures)
    fi = np.repeat(np.arange(F), deg)
    fj = np.minimum(fi + rng.integers(1, 30, size=len(fi)), F - 1)
    keep = fi != fj
    fi, fj = fi[keep], fj[keep]
    q_rel = np.asarray(rotm.quat_mul(q_gt[fj], rotm.quat_conj(q_gt[fi])))
    # 1 deg noise
    w = np.deg2rad(1.0) * rng.standard_normal((len(fi), 3))
    q_rel = np.asarray(rotm.quat_mul(q_rel, np.asarray(
        rotm.so3_exp_quat(w))))
    q0 = q_gt + 0.05 * rng.standard_normal((F, 4))
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)

    # --- global positioning: frames on a ring observing points ---
    Fg, T, L = 100, 10000, 10
    centers = np.stack([8 * np.cos(2 * np.pi * np.arange(Fg) / Fg),
                        0.1 * rng.standard_normal(Fg),
                        8 * np.sin(2 * np.pi * np.arange(Fg) / Fg)], 1)
    X = rng.uniform(-2.5, 2.5, (T, 3))
    f0 = rng.integers(0, Fg - L, T)
    gp_point = np.repeat(np.arange(T, dtype=np.int32), L)
    gp_frame = (f0[:, None] + np.arange(L)[None, :]).reshape(-1).astype(
        np.int32)
    d = X[gp_point] - centers[gp_frame]
    t_obs = d / np.linalg.norm(d, axis=1, keepdims=True)
    t_obs += 0.002 * rng.standard_normal(t_obs.shape)
    order = np.argsort(gp_point, kind="stable")
    np.savez(CACHE,
             ra_fi=fi.astype(np.int32), ra_fj=fj.astype(np.int32),
             ra_qrel=q_rel, ra_q0=q0,
             gp_frame=gp_frame[order], gp_point=gp_point[order],
             gp_tobs=t_obs[order], gp_centers0=centers +
             rng.standard_normal(centers.shape),
             gp_X0=X + 0.5 * rng.standard_normal(X.shape))
    print(f"# prepared RA {F} frames/{len(fi)} edges, GP {Fg} frames/"
          f"{len(gp_point)} obs", file=sys.stderr)


def bench(fn, label, iters_getter, reps=3):
    t0 = time.time()
    fn()
    print(f"# {label}: compile+first {time.time() - t0:.1f}s",
          file=sys.stderr)
    best = 0.0
    for rep in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        it = iters_getter(out)
        print(f"# {label} rep {rep}: {it} iters in {dt:.2f}s",
              file=sys.stderr)
        best = max(best, it / dt)
    return best


def main():
    if not os.path.exists(CACHE):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--prepare"], env=env, check=True)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from glomap_tpu.estimators.rotation_averaging import (
        WEIGHT_GEMAN_MCCLURE, _irls_phase)
    from glomap_tpu.estimators.global_positioning import _solve_gp
    from glomap_tpu.ops.pallas_kernels import block_width_for_sorted

    d = dict(np.load(CACHE))
    F = len(d["ra_q0"])
    E = len(d["ra_fi"])
    dev = jax.devices()[0]
    print(f"# device {dev}", file=sys.stderr)

    q0 = jnp.asarray(d["ra_q0"], jnp.float32)
    fi = jnp.asarray(d["ra_fi"])
    fj = jnp.asarray(d["ra_fj"])
    qrel = jnp.asarray(d["ra_qrel"], jnp.float32)
    ones = jnp.ones((E,), jnp.float32)
    valid = jnp.ones((E,), bool)
    sigma = float(np.deg2rad(5.0))

    from glomap_tpu.estimators.rotation_averaging import (
        build_sorted_edge_ops)
    sops = build_sorted_edge_ops(d["ra_fi"], d["ra_fj"]) or {}
    sops_d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in sops.items()}

    def run_ra(use_dense, extra=None):
        kw = dict(extra or {})

        def f():
            q, it = _irls_phase(q0, fi, fj, qrel, ones, valid, 0, F,
                                max_iters=32, weight_mode=WEIGHT_GEMAN_MCCLURE,
                                sigma_rad=sigma, conv_thresh=0.0,
                                use_dense=use_dense, min_iters=32, **kw)
            float(q[0, 0])  # hard sync through the tunnel
            return it
        return f

    ra_dense = bench(run_ra(True), "RA dense", lambda it: int(it))
    ra_pcg = bench(run_ra(False), "RA pcg scatter", lambda it: int(it))
    ra_pcg_win = bench(run_ra(False, sops_d), "RA pcg windowed",
                       lambda it: int(it))

    # --- GP ---
    gp_frame = jnp.asarray(d["gp_frame"])
    gp_point = jnp.asarray(d["gp_point"])
    tT = jnp.asarray(np.ascontiguousarray(d["gp_tobs"].T), jnp.float32)
    uT = jnp.zeros_like(tT)
    ow = jnp.ones((gp_frame.shape[0],), jnp.float32)
    c0 = jnp.asarray(d["gp_centers0"], jnp.float32)
    X0 = jnp.asarray(d["gp_X0"], jnp.float32)
    e0 = jnp.zeros((0,), jnp.int32)
    eT = jnp.zeros((3, 0), jnp.float32)
    ew = jnp.zeros((0,), jnp.float32)
    pw = block_width_for_sorted(d["gp_point"])
    Fg = len(d["gp_centers0"])
    T = len(d["gp_X0"])

    def run_gp():
        c, X, cost, it, _lam, _done = _solve_gp(c0, X0, gp_frame, gp_point, tT, uT, ow,
                                   e0, e0, eT, ew, Fg, T, 0.1, 0.0, 30,
                                   100, point_width=pw)
        float(cost)
        return int(it)

    gp_rate = bench(run_gp, "GP", lambda it: it)

    num_gp_obs = gp_frame.shape[0]
    print(json.dumps({
        "metric": "rotation_averaging_iters_per_s_dense",
        "value": round(ra_dense, 2),
        "unit": f"IRLS iterations/s ({F} frames, {E} edges, f32, "
                "dense MXU Cholesky)"}))
    print(json.dumps({
        "metric": "rotation_averaging_iters_per_s_pcg",
        "value": round(ra_pcg, 2),
        "unit": f"IRLS iterations/s ({F} frames, {E} edges, f32, "
                "Jacobi-PCG scatter-add matvec)"}))
    print(json.dumps({
        "metric": "rotation_averaging_iters_per_s_pcg_windowed",
        "value": round(ra_pcg_win, 2),
        "unit": f"IRLS iterations/s ({F} frames, {E} edges, f32, "
                "Jacobi-PCG windowed-kernel matvec)"}))
    print(json.dumps({
        "metric": "global_positioning_iters_per_s",
        "value": round(gp_rate, 2),
        "unit": f"LM iterations/s ({Fg} frames, {num_gp_obs} obs, f32)"}))


if __name__ == "__main__":
    if "--prepare" in sys.argv:
        prepare()
    else:
        main()
