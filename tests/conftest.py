"""Test harness: run JAX on a virtual 8-device CPU mesh.

All tests execute against the CPU backend with 8 virtual devices so
sharding/collective code paths compile and run without TPU hardware.
Real-TPU execution is exercised by bench.py and the driver's entrypoint
checks instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
