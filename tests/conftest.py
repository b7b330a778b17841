"""Test config: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; unit tests must
run hermetically on CPU and still cover the multi-chip sharding paths.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# hermetic routing: the public API must not silently switch to the
# device-RT path (different latency profile) depending on tunnel health;
# RT-path coverage constructs its sessions explicitly (test_tpu_encdec)
os.environ.setdefault("TPU_VP9_FORCE_HOST", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the unrolled idct16/32 graphs are expensive
# to compile on the 2-CPU test host; cache them across pytest runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_vp9_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS env; override programmatically so unit tests stay on the
# virtual CPU mesh and never ride the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
