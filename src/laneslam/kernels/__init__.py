"""L1 Pallas TPU kernels (SURVEY.md §1 L1, §2.4, §7.2 step 7).

Every kernel here has two numerically-equivalent implementations:

  * a **Pallas TPU kernel** — the production path on TPU, fusing what XLA
    would otherwise materialize through HBM (similarity matrix passes,
    Schur block chains, label-propagation sweeps);
  * a **pure-XLA reference** — the permanent CPU fallback and the oracle
    for the kernel equivalence tests (tests/kernels/, SURVEY.md §4.1).

Dispatch is per-process:

  LANESLAM_KERNELS=pallas     force Pallas (compiled)
  LANESLAM_KERNELS=interpret  force Pallas in interpreter mode (debugging)
  LANESLAM_KERNELS=xla        force the XLA reference path
  unset / auto                Pallas iff the default backend is TPU
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def mode() -> str:
    """Resolved kernel mode: 'pallas', 'interpret', or 'xla'."""
    m = os.environ.get("LANESLAM_KERNELS", "auto").lower()
    if m in ("pallas", "interpret", "xla"):
        return m
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def use_pallas() -> bool:
    return mode() != "xla"


def interpret() -> bool:
    return mode() == "interpret"
