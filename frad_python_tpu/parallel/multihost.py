"""Multi-host orchestration over DCN (SURVEY §2 N4, §5 distributed backend).

A FrAD pod job splits a stream into contiguous sample spans per host
(overlap-halo included in the span so no cross-host exchange is needed on
the encode side), runs the sharded cores over the global mesh, and
assembles the serial bitstream on host 0 in frame order — frame lengths
are data-dependent, so bitstream concatenation is host work
(SURVEY §7 hard part (a)).

Usage on each host of a pod slice:

    from frad_python_tpu.parallel import multihost
    multihost.init_distributed(coordinator, num_processes, process_id)
    mesh = multihost.global_mesh()          # all chips on all hosts
    span = multihost.host_span(total_samples, frame_size, overlap_ratio)
    stream_part = batch_encode(pcm[span.start:span.stop], ...)
    multihost.gather_bitstream(stream_part)  # -> full stream on host 0

Collectives ride ICI within a host's chips and DCN across hosts; the
byte-domain gather uses jax's process-level allgather (tiny next to the
PCM itself).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh

from ..models.profiles import compact


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bring up the jax distributed runtime (no-op when single-process).

    On TPU pods with the standard environment, bare
    `jax.distributed.initialize()` autodetects everything.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every chip of every process (ICI-major device order)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


@dataclass(frozen=True)
class HostSpan:
    start: int          # first sample this host encodes
    stop: int           # one-past-last sample
    first_frame: int    # global index of this host's first frame


def host_span(total_samples: int, frame_size: int, overlap_ratio: int,
              is_compact: bool = True, process_id: int | None = None,
              num_processes: int | None = None) -> HostSpan:
    """Contiguous frame range for this host, halo included.

    Frames are distributed evenly; each host's sample span starts at its
    first frame's start offset (which already re-reads the overlap halo
    from the previous frame — the same duplication the streaming encoder
    performs), so hosts need NO sample exchange to encode.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes

    n = compact.get_samples_min_ge(frame_size) if is_compact else frame_size
    olap = (n - n * (overlap_ratio - 1) // overlap_ratio) \
        if (is_compact and overlap_ratio > 1) else 0
    hop = n - olap
    n_frames = max(1, -(-(total_samples - olap) // hop)) if total_samples > 0 else 0

    lo_frame = n_frames * pid // nproc
    hi_frame = n_frames * (pid + 1) // nproc
    start = max(lo_frame * hop, 0)
    stop = min(hi_frame * hop + olap if hi_frame > lo_frame else start, total_samples)
    if pid == nproc - 1:
        stop = total_samples
    return HostSpan(start=start, stop=stop, first_frame=lo_frame)


def gather_bitstream(local_stream: bytes,
                     order_key: int | None = None) -> bytes | None:
    """Order-preserving concatenation of per-host byte streams on host 0.

    Uses the process-level allgather (DCN); returns the full stream on
    process 0 and None elsewhere. Single-process: identity.

    Segments are ordered by `order_key` (pass HostSpan.first_frame) so
    the assembly is correct even under a non-monotonic span→process
    assignment; with the default None the process index is the key
    (host_span assigns spans monotonically by pid, so both agree).
    """
    if jax.process_count() == 1:
        return local_stream
    from jax.experimental import multihost_utils

    # length-prefix + pad to the max length so allgather shapes agree
    arr = np.frombuffer(local_stream, dtype=np.uint8)
    key = jax.process_index() if order_key is None else int(order_key)
    meta = np.array([len(arr), key], dtype=np.int64)
    all_meta = multihost_utils.process_allgather(meta)
    maxn = int(all_meta[:, 0].max())
    padded = np.zeros(maxn, dtype=np.uint8)
    padded[: len(arr)] = arr
    gathered = multihost_utils.process_allgather(padded)
    if jax.process_index() != 0:
        return None
    order = np.argsort(all_meta[:, 1], kind="stable")
    return b"".join(gathered[int(i), : int(all_meta[int(i), 0])].tobytes()
                    for i in order)
