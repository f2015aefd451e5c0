"""Closed-form small-matrix algebra vs LAPACK references."""

import numpy as np
import jax.numpy as jnp

from glomap_tpu.ops import smallalg as sa


def test_sym3x3_eigh_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((500, 3, 3))
    A = A @ np.swapaxes(A, -1, -2)
    evals, vecs = sa.sym3x3_eigh(jnp.asarray(A))
    evals, vecs = np.asarray(evals), np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(evals, ref_vals, rtol=1e-8, atol=1e-8)
    # eigenvector property: A v = lambda v
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, vecs[:, :, k])
        lv = evals[:, k:k + 1] * vecs[:, :, k]
        np.testing.assert_allclose(Av, lv, atol=1e-6)


def test_essential_project():
    rng = np.random.default_rng(1)
    # near-essential inputs (the RANSAC case): projection must be exact
    U, _ = np.linalg.qr(rng.standard_normal((300, 3, 3)))
    V, _ = np.linalg.qr(rng.standard_normal((300, 3, 3)))
    E = U @ (np.asarray([1.0, 1.0, 0.0])[None, :, None] *
             np.swapaxes(V, -1, -2))
    En = E + 1e-4 * rng.standard_normal(E.shape)
    proj = np.asarray(sa.essential_project(jnp.asarray(En)))
    np.testing.assert_allclose(proj, E, atol=1e-3)
    # essential property for generic inputs: singular values (1, 1, 0)
    G = rng.standard_normal((200, 3, 3))
    pg = np.asarray(sa.essential_project(jnp.asarray(G)))
    s = np.linalg.svd(pg, compute_uv=False)
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[:, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-6)


def test_essential_basis_reconstructs():
    rng = np.random.default_rng(3)
    U, _ = np.linalg.qr(rng.standard_normal((200, 3, 3)))
    V, _ = np.linalg.qr(rng.standard_normal((200, 3, 3)))
    E = U @ (np.asarray([1.0, 1.0, 0.0])[None, :, None] *
             np.swapaxes(V, -1, -2))
    Ub, Vb = sa.essential_basis(jnp.asarray(E))
    Ub, Vb = np.asarray(Ub), np.asarray(Vb)
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(Ub), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(Vb), 1.0, atol=1e-6)
    # reconstruction E = U diag(1,1,0) V^T
    rec = Ub @ (np.asarray([1.0, 1.0, 0.0])[None, :, None] *
                np.swapaxes(Vb, -1, -2))
    np.testing.assert_allclose(rec, E, atol=1e-6)


def test_min_eigvec9():
    rng = np.random.default_rng(2)
    # build matrices with a clear smallest eigenvector (RANSAC-like:
    # near-singular AtA from 8 noisy rank-1 constraints)
    v_true = rng.standard_normal((200, 9))
    v_true /= np.linalg.norm(v_true, axis=-1, keepdims=True)
    A = rng.standard_normal((200, 8, 9))
    A -= (A @ v_true[..., None]) * v_true[:, None, :]  # rows orthogonal to v
    A += 1e-4 * rng.standard_normal(A.shape)
    AtA = np.einsum("nki,nkj->nij", A, A)
    v = np.asarray(sa.min_eigvec9(jnp.asarray(AtA)))
    dots = np.abs(np.sum(v * v_true, axis=-1))
    assert np.median(dots) > 0.9999
    assert (dots > 0.99).mean() > 0.97
