"""Multi-host bring-up (SURVEY.md §2.3 L7 `init.py`).

SPMD process model: one Python process per host, every host runs the
identical jit program; only this bring-up call and the mesh construction
see host identity. On a real pod slice the coordinator address comes from
the scheduler; everything downstream (shard_map programs, collectives)
is byte-identical 1-host vs N-host — the scale-invariance GSPMD property
SNIPPETS.md:123-128 documents.

Environment-variable driven so scripts/run_distributed.py can be launched
per-host by any launcher:

    LANESLAM_COORDINATOR=host0:9876 LANESLAM_NUM_PROCESSES=4 \
    LANESLAM_PROCESS_ID=$i python scripts/run_distributed.py ...

On a single host with no env set, `ensure_initialized` is a no-op and
the run proceeds on the local devices (possibly a fake CPU mesh).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def init_distributed(
    coordinator: str, num_processes: int, process_id: int,
    local_device_ids: Optional[list] = None,
) -> None:
    """Explicit multi-host bring-up; call once per process before any jax op."""
    global _initialized
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def ensure_initialized() -> bool:
    """Env-driven bring-up. Returns True iff a multi-process group is live.

    Reads LANESLAM_COORDINATOR / LANESLAM_NUM_PROCESSES / LANESLAM_PROCESS_ID;
    silently no-ops (single-process mode) when unset or single-process.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("LANESLAM_COORDINATOR", "")
    n = int(os.environ.get("LANESLAM_NUM_PROCESSES", "1"))
    if not coord or n <= 1:
        return False
    pid = int(os.environ.get("LANESLAM_PROCESS_ID", "0"))
    init_distributed(coord, n, pid)
    return True


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) of the live group (0, 1 single-process)."""
    return jax.process_index(), jax.process_count()
