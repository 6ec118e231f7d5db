"""Multi-host pod-slice scale-out (DP over DCN, TP over ICI).

The reference scales across machines only by running independent server
processes (supervisord) and sharding wav.scp across client processes
(SURVEY.md §2.5). The TPU-native model: every host runs the same program,
`jax.distributed` forms the global device set, the ("dp","tp") mesh is
built over ALL devices with tp confined to intra-host ICI, and each host
feeds its local stream shard — gradient/batch collectives ride DCN only on
the dp axis.

BASELINE scaling point (≥85% efficiency at 2 hosts) is measured by running
bench.py under this initialization on each host.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    num_processes = int(num_processes
                        or os.environ.get("NUM_PROCESSES", "1"))
    process_id = int(process_id or os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_global_mesh(tp: Optional[int] = None) -> Mesh:
    """("dp","tp") mesh over all global devices, tp within a host so its
    collectives stay on ICI and only dp crosses DCN."""
    devices = jax.devices()
    local = jax.local_device_count()
    if tp is None:
        tp = 2 if local % 2 == 0 and local > 1 else 1
    assert local % tp == 0
    n = len(devices)
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host owns (for data loading)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
