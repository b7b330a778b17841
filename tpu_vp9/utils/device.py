"""Device liveness probing.

The axon-tunneled TPU can wedge (grant lost, relay stall) in ways that
hang any jax call indefinitely — exceptions never fire.  Every optional
device path (open-loop hints, device ME, bench measurements) must gate on
``tpu_alive()``: a subprocess probe with a hard timeout, cached for the
process lifetime.
"""

from __future__ import annotations

import os
import subprocess
import sys

_CACHED = None


def tpu_alive(timeout_s: float = 60.0) -> bool:
    # cold backend init through the tunnel is ~15-30 s; a wedged device
    # hangs forever, so the timeout just needs to separate those regimes
    """True if a non-CPU jax backend answers a trivial computation."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    if os.environ.get("TPU_VP9_FORCE_HOST") == "1":
        _CACHED = False
        return False
    code = (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "x = jnp.ones((8, 128)); float(x.sum())\n"
        "print('ALIVE', d[0].platform)\n"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        # an accelerator must answer; a CPU-only jax install saying
        # "ALIVE cpu" is NOT a live device
        _CACHED = ("ALIVE" in res.stdout
                   and "ALIVE cpu" not in res.stdout)
    except (subprocess.TimeoutExpired, OSError):
        _CACHED = False
    return _CACHED
