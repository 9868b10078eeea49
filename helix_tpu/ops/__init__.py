"""TPU compute kernels: distance/top-k, quantized tiers, CSR expansion.

Setting ``HELIX_TPU_COMPILE_CACHE=<dir>`` enables JAX's persistent
compilation cache there.  Serving compiles one kernel per padded
batch-size bucket and a cold compile costs seconds to minutes on a
remote dev chip, so production deployments should set this.  It is
opt-in rather than default because experimental PJRT plugins (the
tunneled ``axon`` dev chip in this environment) can hang while
computing cache keys — measured: a trivial jit never completes with the
cache dir set while the axon plugin is registered, and works with it
unset.
"""

import os as _os


def _honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` work even when the environment pre-imports
    JAX with a platform already selected (the axon dev image's
    sitecustomize imports jax with ``axon,cpu`` before user code runs,
    silently ignoring the env var).  Re-asserting the env value through
    jax.config before the backend initializes restores the documented
    contract; measured consequence of NOT doing this: every
    "JAX_PLATFORMS=cpu" run in this image actually executed on the
    tunneled TPU."""
    want = _os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized: too late, leave it


def _enable_compile_cache() -> None:
    cache_dir = _os.environ.get("HELIX_TPU_COMPILE_CACHE")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every kernel, not just the >1s ones (serving buckets are
        # many and individually small on CPU, huge on a remote chip)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: compiles stay in-memory


_honor_platform_env()
_enable_compile_cache()
