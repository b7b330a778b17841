"""Multi-host GOP-parallel encoding over DCN (jax.distributed).

The reference is single-node (SURVEY §2.1: its "communication backend"
is semaphores over shared memory); its rate controller merely reserves
state for parallel GOP intervals (``PARALLEL_GOP_MAX_NUMBER``,
``EbRateControlProcess.c:4556``).  The TPU-native scale-out story
(SURVEY §2.7, BASELINE ≥80%-to-4-hosts bar) runs the same
independent-GOP chunking as ``gop_parallel`` across *hosts*:

  - every host initializes ``jax.distributed`` against a coordinator
    (DCN control plane) and takes chunks round-robin by process index;
  - each chunk encodes on the host's local chip(s) through the normal
    ``Vp9Encoder`` (device EncDec path when a TPU is attached);
  - the finished chunk bitstreams are exchanged with one
    ``process_allgather`` over DCN (packets are small next to pixels:
    the sources never cross hosts — each host ingests its own slice),
    and every host deterministically reassembles the presentation-order
    stream, byte-identical to a sequential encode.

Run ``tools/dcn_gop_demo.py`` for a 2-process single-machine dry run
with a scaling measurement (the driver-visible analogue of the 4-host
fps-scaling bar).
"""

from __future__ import annotations

import pickle

import numpy as np

from tpu_vp9.pipeline.gop_parallel import _encode_chunk, plan_chunks


def _exchange_blobs(blob: bytes):
    """All-gather one bytes object per process over DCN; returns the
    list of every process's bytes (same order on all hosts)."""
    import jax
    from jax.experimental import multihost_utils

    arr = np.frombuffer(blob, np.uint8)
    n = jax.process_count()
    lens = multihost_utils.process_allgather(
        np.asarray([arr.size], np.int64))  # (n, 1)
    maxlen = int(lens.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[: arr.size] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(n, maxlen)
    return [gathered[i, : int(lens[i, 0])].tobytes() for i in range(n)]


def encode_gop_distributed(frames, cfg, *, coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           qp_overrides=None):
    """Encode across jax.distributed processes; every process returns
    the full presentation-order packet list (byte-identical to the
    sequential encode).

    coordinator/num_processes/process_id: forwarded to
    ``jax.distributed.initialize`` when given (omit them if the runtime
    is already initialized, e.g. by the launcher).
    """
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    n = jax.process_count()
    pid = jax.process_index()
    chunks = plan_chunks(frames, cfg, qp_overrides)
    mine = [(i, c) for i, c in enumerate(chunks) if i % n == pid]
    results = {i: _encode_chunk(c) for i, c in mine}
    blobs = _exchange_blobs(pickle.dumps(results))
    merged: dict = {}
    for b in blobs:
        merged.update(pickle.loads(b))
    out = []
    for i in range(len(chunks)):
        out.extend(merged[i])
    return out
