"""Batched geometry math (JAX). Counterpart of reference glomap/math/."""
