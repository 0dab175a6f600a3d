"""Host-readback barrier management for tunneled PJRT clients (L0 runtime).

BASELINE.json:5 mandates that "the optimize/match loop never leaves HBM".
On this environment's tunneled TPU client that rule has *teeth*, measured
round 4 (scripts/profile_chunk.py):

  - In a fresh process, dispatches stream asynchronously: ~30 us per
    program launch, loop-carrying programs (lax.scan / fori_loop bodies)
    pipeline without host round-trips.
  - ANY device->host readback — ``int(x)``, ``np.asarray(x)``,
    ``jax.device_get`` — permanently switches the client into a
    synchronous mode where every subsequent program *step* pays a full
    tunnel round-trip (~2.5 ms): a plain 2048^2 matmul goes 0.03 -> 2.4 ms
    (80x) and the LSD label-propagation extraction program goes
    0.06 ms -> 800 ms per 8-frame chunk (13,000x). The mode does not
    recover with time or further dispatches.
  - The client library exports ``axon_reset(retain_executables)``:
    ``retain_executables=1`` drops every device buffer but keeps loaded
    executables and restores pipelined dispatch. Compiled jit programs
    (including ones with large traced constants) re-dispatch without
    recompilation; only *arrays* must be re-uploaded (H2D is fast:
    ~1.4 GB/s vs the ~15 MB/s D2H path).

The production pattern is therefore:

  1. steady-state loops must be READBACK-FREE — device outputs are
     accumulated on device or held as opaque ``jax.Array`` handles and
     converted only when the host genuinely needs values;
  2. each point that does need values (bootstrap decisions, periodic
     logging, final results) is followed by :func:`barrier`, which
     round-trips the live state across a client reset and returns fresh
     device arrays, restoring full dispatch speed.

On non-tunneled backends (CPU mesh tests, direct-attached TPU) every
function here is a no-op and readbacks are cheap, so callers can use the
same code path everywhere.
"""

from __future__ import annotations

import ctypes
import os
from typing import Any, Optional

import jax
import numpy as np

_AXON_SO = "/opt/axon/libaxon_pjrt.so"
_lib: Optional[ctypes.CDLL] = None
_checked = False
_is_tunneled = False


def is_tunneled() -> bool:
    """True when the process talks to a device through the axon tunnel."""
    global _checked, _is_tunneled
    if not _checked:
        _checked = True
        try:
            # client.platform reports the terminal's platform ("tpu"); the
            # tunnel identifies itself in platform_version ("axon X.Y.Z").
            pv = jax.devices()[0].client.platform_version
        except Exception:
            pv = ""
        _is_tunneled = ("axon" in str(pv).lower()) and os.path.exists(_AXON_SO)
    return _is_tunneled


def _axon() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_AXON_SO)
    return _lib


def reset_client(retain_executables: bool = True) -> bool:
    """Reset the tunnel client: drops all device buffers, restores
    pipelined (pre-readback) dispatch. With ``retain_executables`` the
    loaded executables survive and re-dispatch without recompilation.

    Returns True when a reset actually happened. Every live ``jax.Array``
    in the process is dead afterwards — callers must re-upload anything
    they still need (see :func:`barrier`).
    """
    if not is_tunneled():
        return False
    rc = _axon().axon_reset(ctypes.c_int(1 if retain_executables else 0))
    return rc == 0


def barrier(tree: Any) -> Any:
    """Read ``tree``'s arrays to host, reset the tunnel client, and
    re-upload — the returned pytree is live on fresh buffers and the
    client is back in pipelined mode.

    On non-tunneled backends this is the identity (no transfer, no reset).
    The caller is responsible for not holding OTHER device arrays across
    the call: they die with the reset. Cost is dominated by the D2H read
    (~15 MB/s through the tunnel), so keep the state small or call rarely
    (the SLAM system calls this once, after monocular bootstrap).
    """
    if not is_tunneled():
        return tree
    host = jax.device_get(tree)
    reset_client(retain_executables=True)
    return jax.device_put(host)
