"""Asynchronous device-backend warm-up + liveness watchdog.

The remote-TPU client handshake (PJRT C-API client construction over the
tunnel) costs ~5-10 s and JAX performs it lazily on the first device call —
serially, in the middle of the pipeline.  Kicking it onto a daemon thread as
soon as the pipeline's host-only prep starts (read sketching, index load)
hides most of that wall time; jax's backend registry is locked internally,
so the main thread's first real device call simply joins the in-flight init.

The warm-up also runs a TINY probe computation: over a remote tunnel,
``jax.devices()`` can succeed while the first real dispatch hangs forever
(dead grant / wedged pool).  ``device_usable(timeout)`` waits for the probe
and lets callers fall back to the host engines instead of hanging the whole
pipeline on an unreachable device — the failure-detection story (SURVEY
§5.3) for the one genuinely remote dependency this framework has.

MUST only be called after any fork points (index-build workers, the batch
host-stage pool): forked children must never inherit a live device client.
"""

from __future__ import annotations

import threading

_started: threading.Thread | None = None
_probe_done = threading.Event()
_probe_ok = False


def warm_backend_async() -> threading.Thread:
    """Start (once) a daemon thread that initializes the JAX backend and
    completes one tiny device computation (the liveness probe)."""
    global _started
    if _started is not None:
        return _started

    def _warm():
        global _probe_ok
        try:
            import jax
            import jax.numpy as jnp

            jax.devices()
            jnp.zeros(8, jnp.float32).sum().block_until_ready()
            _probe_ok = True
        except Exception:
            _probe_ok = False  # surfaced via device_usable()
        finally:
            _probe_done.set()

    t = threading.Thread(target=_warm, name="backend-warmup", daemon=True)
    t.start()
    _started = t
    return t


def local_accelerator_attached() -> bool:
    """True when an accelerator is attached to THIS host (dispatch costs
    microseconds); False for remote-tunnel pools, where dispatch latency and
    transfer costs change every breakeven.  The ONE definition of the
    local/remote policy consumed by the pileup, sr-align, and long-read
    auto-routing."""
    import os

    local = (os.path.exists("/dev/accel0") or os.path.exists("/dev/vfio")
             or bool(os.environ.get("TPU_NAME")))
    remote = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    return local and not remote


def device_usable(timeout_s: float | None = None) -> bool:
    """True once the probe computation has completed; False when the backend
    errored or failed to answer within ``timeout_s`` (default
    PANMAP_TPU_DEVICE_TIMEOUT_S, 120 s).  A False-by-timeout verdict is not
    cached: if the device comes back, later calls return True."""
    import os

    if timeout_s is None:
        timeout_s = float(os.environ.get("PANMAP_TPU_DEVICE_TIMEOUT_S",
                                         "120"))
    warm_backend_async()
    if not _probe_done.wait(timeout_s):
        return False
    return _probe_ok
