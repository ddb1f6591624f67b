"""Persistent-compile-cache wiring shared by the bench/profile scripts
and driver entry points.

TPU programs compile through this image's remote tunnel (10-25 min per
new shape), so benches wire /root/repo/.jax_cache as a persistent
compile cache.  But the same cache accumulates XLA:CPU AOT results
written on OTHER machine types, and loading those into a CPU run emits
cpu_aot_loader warnings that themselves say "could lead to execution
errors such as SIGILL" -- so the cache must never be wired into a CPU
run (CPU compiles are sub-second anyway).  This helper centralizes that
decision (docs/STATUS.md "environment gotchas").
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Wire the repo's .jax_cache as jax's persistent compile cache,
    unless the RESOLVED backend is CPU (requesting "tpu" does not
    guarantee getting it: when the tunnel is down jax falls back to the
    cpu entry of "axon,cpu").  Returns True if the cache was enabled."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
