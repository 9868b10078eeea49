"""Test harness: run JAX on a virtual 8-device CPU mesh.

All tests execute against the CPU backend with 8 virtual devices so
sharding/collective code paths compile and run without TPU hardware.
Real-TPU execution is exercised by bench.py and the driver's entrypoint
checks instead.

Note: this environment pre-imports JAX with the TPU platform selected
(JAX_PLATFORMS=axon), so env vars alone are too late — the platform and
host-device count are forced through jax.config before any backend
initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Spawned server processes import JAX (~10s cold, much longer on a
# loaded machine); give CLI readiness probes more than the production
# default so full-suite runs don't flake.
os.environ.setdefault("HELIX_READY_TIMEOUT_S", "120")
