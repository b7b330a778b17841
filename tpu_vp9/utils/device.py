"""Device liveness probing.

Measured behavior of the axon-tunneled TPU in this environment (round 4):
``jax.devices()`` answers instantly, but the FIRST computation of a
process pays a cold tunnel grant of ~300-750 s; subsequent dispatches run
at normal speed.  A wedged tunnel instead hangs forever.  Consequences:

* probing must happen IN-PROCESS — a child-process probe pays the full
  grant without warming the caller (and cannot attach at all while the
  parent holds the single chip);
* the probe IS the warm-up: when it succeeds, this process owns a live,
  warm backend and every later jax call is cheap;
* the timeout only needs to separate "cold but alive" from "wedged", so
  it defaults high (900 s, ``TPU_VP9_PROBE_TIMEOUT`` to override).

The probe runs the first computation on a daemon thread with a hard
timeout; on timeout the thread is abandoned (it blocks on the tunnel
RPC, not the GIL) and the device is reported dead with a reason
(``tpu_dead_reason()``) so fallbacks are never silent.
"""

from __future__ import annotations

import os
import threading

_CACHED = None
_REASON: str | None = None


def tpu_dead_reason() -> str | None:
    """Why the last tpu_alive() returned False (None if alive/unprobed)."""
    return _REASON


def tpu_alive(timeout_s: float | None = None) -> bool:
    """True if a non-CPU jax backend answers a trivial computation.

    Success doubles as the cold-tunnel warm-up for this process.
    """
    global _CACHED, _REASON
    if _CACHED is not None:
        return _CACHED
    if os.environ.get("TPU_VP9_FORCE_HOST") == "1":
        _CACHED, _REASON = False, "TPU_VP9_FORCE_HOST=1"
        return False
    if timeout_s is None:
        timeout_s = float(os.environ.get("TPU_VP9_PROBE_TIMEOUT", "900"))

    import jax

    try:
        devs = jax.devices()
    except Exception as exc:
        _CACHED, _REASON = False, f"jax.devices() failed: {exc!r}"
        return False
    if not devs or devs[0].platform == "cpu":
        _CACHED = False
        _REASON = ("no accelerator backend (platform="
                   f"{devs[0].platform if devs else 'none'})")
        return False

    result: dict = {}

    def _compute():
        try:
            import jax.numpy as jnp

            x = jnp.ones((8, 128))
            result["value"] = float(x.sum())
        except Exception as exc:  # noqa: BLE001 - reported as reason
            result["error"] = repr(exc)

    t = threading.Thread(target=_compute, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        _CACHED = False
        _REASON = (f"first device computation still blocked after "
                   f"{timeout_s:.0f}s (tunnel wedged or cold grant "
                   "exceeding the probe timeout)")
        return False
    if "error" in result:
        _CACHED, _REASON = False, f"device compute failed: {result['error']}"
        return False
    _CACHED, _REASON = True, None
    return True
