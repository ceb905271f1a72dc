"""Asynchronous device-backend warm-up.

The remote-TPU client handshake (PJRT C-API client construction over the
tunnel) costs ~5-10 s and JAX performs it lazily on the first device call —
serially, in the middle of the pipeline.  Kicking it onto a daemon thread as
soon as the pipeline's host-only prep starts (read sketching, index load)
hides most of that wall time; jax's backend registry is locked internally,
so the main thread's first real device call simply joins the in-flight init.

MUST only be called after any fork points (index-build workers, the batch
host-stage pool): forked children must never inherit a live device client.
"""

from __future__ import annotations

import threading

_started: threading.Thread | None = None


def warm_backend_async() -> threading.Thread:
    """Start (once) a daemon thread that initializes the JAX backend."""
    global _started
    if _started is not None:
        return _started

    def _warm():
        try:
            import jax

            jax.devices()
        except Exception:
            pass  # backend errors surface on the real first device call

    t = threading.Thread(target=_warm, name="backend-warmup", daemon=True)
    t.start()
    _started = t
    return t
