"""JAX platform resolution with graceful CPU fallback.

The TPU plugin on this machine ("axon") registers at interpreter startup
and can fail to claim the (single) chip when another process holds it —
leaving JAX_PLATFORMS=axon pointing at an unregistered backend so every
jax call raises. ensure_backend() resolves the backend once, falling back
to CPU when the configured platform is unavailable, so host-path
transcodes keep working while another process owns the chip.
"""
from __future__ import annotations

import threading

_lock = threading.Lock()
_resolved = [False]


def ensure_backend() -> str:
    """Resolve the JAX backend; returns the platform name in use."""
    import jax
    with _lock:
        if _resolved[0]:
            return jax.default_backend()
        try:
            jax.devices()
        except RuntimeError:
            jax.config.update("jax_platforms", "cpu")
        _resolved[0] = True
        return jax.default_backend()


def on_tpu() -> bool:
    return ensure_backend() == "tpu"
