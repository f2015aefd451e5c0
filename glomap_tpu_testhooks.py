"""Early pytest plugin: re-exec the test process on pure-CPU JAX.

The container's sitecustomize eagerly imports jax and registers the
tunneled single-chip TPU ("axon") PJRT plugin in EVERY interpreter (keyed
on PALLAS_AXON_POOL_IPS), locking the platform before any user code runs.
Tests must run on CPU (x64 + virtual 8-device mesh), so this plugin —
loaded via addopts `-p glomap_tpu_testhooks` BEFORE pytest starts global
output capture — re-execs the whole pytest process with the trigger env
var scrubbed. The fresh interpreter never registers the TPU plugin.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        os.environ.get("GLOMAP_TPU_TESTS_REEXEC") != "1":
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["GLOMAP_TPU_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
