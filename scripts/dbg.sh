#!/bin/bash
# run a python script on pure-CPU jax (x64), escaping the TPU sitecustomize
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
XLA_FLAGS="--xla_force_host_platform_device_count=${DBG_DEVICES:-8} $XLA_FLAGS" \
PYTHONPATH=/root/repo:$PYTHONPATH exec python "$@"
