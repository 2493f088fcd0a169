"""Persistent XLA compile cache for the heavy CLI entry points.

The tunneled-TPU environment compiles remotely and slowly (minutes for the
full sampling program); a dropped tunnel mid-run used to mean paying the
whole compile again on retry. Enabling jax's persistent compilation cache
(same knob bench.py has always set) makes every retry after the first
near-instant for unchanged programs. The reference has no analogue — torch
eager pays no compile — so this is a TPU-native operational concern, not a
parity one.

Cache dir: $JAX_CACHE_DIR, default ~/.cache/commonscenes_jax (per-user, not
a world-writable /tmp path another local user could pre-create or poison;
shared with bench.py so bench-warmed programs also hit from the CLIs and
vice versa).
"""

from __future__ import annotations

import os


def _default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "commonscenes_jax")


def apply_platform_override() -> None:
    """Honor COMMONSCENES_PLATFORM (e.g. 'cpu') before backend init.

    The parent environment of this container exports JAX_PLATFORMS=axon
    (the tunneled TPU plugin), which the plugin consumes before any CLI
    can re-export it — so when the tunnel is down, the only way to run a
    metric CLI on the CPU backend is an in-process jax.config update.
    Layout-only eval, GT collection, and the chamfer/MMD math are all
    serviceable on CPU. A CLI flag (eval_3dfront --platform) takes
    precedence: it calls jax.config.update after this."""
    plat = os.environ.get("COMMONSCENES_PLATFORM", "")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def enable_persistent_cache() -> str:
    """Point jax at the persistent compile cache; safe to call any time
    before the first compile. Returns the cache dir (or "" on failure)."""
    import jax

    apply_platform_override()
    cache_dir = os.environ.get("JAX_CACHE_DIR", _default_cache_dir())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return ""
    return cache_dir
