"""Mesh construction + multi-host bring-up (SURVEY.md §2.3).

Axis layout rule (BASELINE.json:5): 'block' should land on ICI (fast,
intra-slice) because Schur partial reductions psum over it every GN
iteration; 'frame' may span DCN (inter-host) because trajectory spans
exchange only boundary poses (halo) per iteration.
`jax.make_mesh` orders axes so the *last* axis is most-minor (adjacent
devices) — hence ('frame', 'block') puts block on the innermost links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    devices: Optional[Sequence] = None, frame: int = 1, block: int = 1
) -> Mesh:
    """Build a ('frame', 'block') mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = frame * block
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(frame, block)
    return Mesh(arr, ("frame", "block"))


def local_mesh() -> Mesh:
    """Single-device degenerate mesh (collectives become identities)."""
    return make_mesh(jax.devices()[:1], frame=1, block=1)


def init_distributed(
    coordinator: str, num_processes: int, process_id: int
) -> None:
    """Back-compat alias — multi-host bring-up lives in dist/init.py."""
    from laneslam.dist.init import init_distributed as _init

    _init(coordinator, num_processes, process_id)
