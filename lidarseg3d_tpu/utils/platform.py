"""JAX platform/cache setup.

This must run BEFORE any backend is initialized. Note: on the axon image,
sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
environment variables alone cannot switch platforms — jax.config.update
still can (the backend is only initialized on first use).
"""

import jax

_DEFAULT_CACHE = "/root/.jax_cache"


def setup_jax(device=None, cache_dir=_DEFAULT_CACHE, host_device_count=None):
    """device: None (keep default platform) | 'cpu' | 'tpu' | 'axon'.

    host_device_count: for CPU, number of virtual devices (requires being
    set before backend init; silently ignored if too late)."""
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if device:
        jax.config.update("jax_platforms", device)
    if host_device_count and device == "cpu":
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_device_count}"
            ).strip()
