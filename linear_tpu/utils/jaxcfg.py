"""JAX runtime configuration shared by the device modules.

Enables the persistent compilation cache so the (expensive, tunneled)
XLA compiles of the seeding / chaining kernels are paid once per machine
instead of once per process. Called by linear_tpu.ops modules at import
(host-only code paths never import jax)."""
from __future__ import annotations

import os

_done = False


def configure() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("LINEAR_TPU_JAX_CACHE", "1") == "0":
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/linear_tpu_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
