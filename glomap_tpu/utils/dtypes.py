"""Solver dtype policy.

The reference runs Ceres in float64 everywhere; we validate the same
numerics in x64 on CPU (tests force jax_enable_x64) and run float32 on
TPU (no native f64). solver_dtype() picks the widest available float so
estimator defaults work on both without warning spam.
"""

import jax
import jax.numpy as jnp


def solver_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
