"""Camera model tests: project/unproject roundtrips for all 11 COLMAP models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glomap_tpu.ops import camera_models as cm

# Module-level jitted entry points: parametrized cases share shapes, so the
# jit cache compiles each once per shape instead of eager-dispatching
# hundreds of ops per call.
_project = jax.jit(cm.img_from_cam)
_unproject = jax.jit(cm.cam_from_img, static_argnames="num_iters")
_rays = jax.jit(cm.cam_rays_from_img, static_argnames="num_iters")

# (model_id, raw colmap params) — realistic values per model.
CASES = [
    (cm.SIMPLE_PINHOLE, [500.0, 320.0, 240.0]),
    (cm.PINHOLE, [500.0, 510.0, 320.0, 240.0]),
    (cm.SIMPLE_RADIAL, [500.0, 320.0, 240.0, 0.05]),
    (cm.RADIAL, [500.0, 320.0, 240.0, 0.05, -0.01]),
    (cm.OPENCV, [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 1e-3, -5e-4]),
    (cm.OPENCV_FISHEYE, [400.0, 410.0, 320.0, 240.0, 0.03, -0.005, 1e-3, -1e-4]),
    (cm.FULL_OPENCV, [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 1e-3, -5e-4,
                      0.002, 0.01, -0.002, 5e-4]),
    (cm.FOV, [500.0, 510.0, 320.0, 240.0, 0.9]),
    (cm.SIMPLE_RADIAL_FISHEYE, [400.0, 320.0, 240.0, 0.03]),
    (cm.RADIAL_FISHEYE, [400.0, 320.0, 240.0, 0.03, -0.005]),
    (cm.THIN_PRISM_FISHEYE, [400.0, 410.0, 320.0, 240.0, 0.03, -0.005, 1e-3,
                             -5e-4, 1e-3, -1e-4, 5e-4, -2e-4]),
]


@pytest.mark.parametrize("model_id,params", CASES,
                         ids=[cm.MODEL_NAMES[m] for m, _ in CASES])
def test_canonicalize_roundtrip(model_id, params):
    c, kind = cm.canonicalize(model_id, np.asarray(params))
    back = cm.decanonicalize(model_id, c)
    np.testing.assert_allclose(back, params, atol=1e-12)


@pytest.mark.parametrize("model_id,params", CASES,
                         ids=[cm.MODEL_NAMES[m] for m, _ in CASES])
def test_project_unproject_roundtrip(model_id, params):
    c_np, kind_np = cm.canonicalize(model_id, np.asarray(params))
    rng = np.random.default_rng(model_id)
    n = 200
    # moderate field of view points in front of the camera
    xy = rng.uniform(-0.45, 0.45, size=(n, 2))
    z = rng.uniform(0.5, 10.0, size=(n, 1))
    xyz = np.concatenate([xy * z, z], axis=-1)

    c = jnp.broadcast_to(jnp.asarray(c_np), (n, 16))
    kind = jnp.full((n,), kind_np, dtype=jnp.int32)
    px = _project(c, kind, jnp.asarray(xyz))
    assert np.all(np.isfinite(np.asarray(px)))

    xy_norm = np.asarray(_unproject(c, kind, px, num_iters=50))
    np.testing.assert_allclose(xy_norm, xy, atol=1e-8)


@pytest.mark.parametrize("model_id,params", CASES,
                         ids=[cm.MODEL_NAMES[m] for m, _ in CASES])
def test_ray_roundtrip(model_id, params):
    c_np, kind_np = cm.canonicalize(model_id, np.asarray(params))
    rng = np.random.default_rng(100 + model_id)
    n = 64
    xy = rng.uniform(-0.4, 0.4, size=(n, 2))
    xyz = np.concatenate([xy, np.ones((n, 1))], axis=-1)
    ray_gt = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)

    c = jnp.broadcast_to(jnp.asarray(c_np), (n, 16))
    kind = jnp.full((n,), kind_np, dtype=jnp.int32)
    px = _project(c, kind, jnp.asarray(xyz))
    ray = np.asarray(_rays(c, kind, px, num_iters=50))
    np.testing.assert_allclose(ray, ray_gt, atol=1e-8)


def test_mixed_model_batch():
    """One batched call over cameras with different models (the BA layout)."""
    cs, kinds, pts, pix = [], [], [], []
    for model_id, params in CASES:
        c_np, kind_np = cm.canonicalize(model_id, np.asarray(params))
        cs.append(c_np)
        kinds.append(kind_np)
        pts.append([0.1, -0.2, 2.0])
    c = jnp.asarray(np.stack(cs))
    kind = jnp.asarray(np.asarray(kinds, dtype=np.int32))
    xyz = jnp.asarray(np.asarray(pts))
    px_batch = np.asarray(cm.img_from_cam(c, kind, xyz))
    for i, (model_id, params) in enumerate(CASES):
        c_np, kind_np = cm.canonicalize(model_id, np.asarray(params))
        px_single = np.asarray(cm.img_from_cam(
            jnp.asarray(c_np), jnp.asarray(kind_np), jnp.asarray(pts[i])))
        np.testing.assert_allclose(px_batch[i], px_single, atol=1e-12)


def test_projection_gradients_finite():
    import jax
    model_id, params = CASES[4]  # OPENCV
    c_np, kind_np = cm.canonicalize(model_id, np.asarray(params))

    def f(c, xyz):
        return jnp.sum(cm.img_from_cam(c, jnp.asarray(kind_np), xyz))

    gc, gx = jax.grad(f, argnums=(0, 1))(jnp.asarray(c_np),
                                         jnp.asarray([0.3, -0.2, 2.0]))
    assert np.all(np.isfinite(np.asarray(gc)))
    assert np.all(np.isfinite(np.asarray(gx)))


def test_radial1d_rejected_with_clear_error():
    """1D_RADIAL has no point projection; ingestion must fail loudly with
    actionable guidance instead of silently mis-projecting."""
    import pytest
    with pytest.raises(ValueError, match="1D_RADIAL.*SIMPLE_RADIAL"):
        cm.canonicalize(cm.RADIAL1D, [320.0, 240.0])
    assert cm.MODEL_IDS["1D_RADIAL"] == cm.RADIAL1D
    assert cm.MODEL_IDS["RADIAL1D"] == cm.RADIAL1D
