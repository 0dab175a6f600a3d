"""Device-resident metrics ring buffer (SURVEY.md §5.5).

Per-frame scalars (tracked features, inlier ratio, BA cost, ...) accumulate
on device in a small fixed-capacity ring; the host drains it asynchronously
every M frames — keeping the "optimize/match loop never leaves HBM"
invariant (BASELINE.json:5): pushes happen inside jit, the only host
crossing is the periodic drain.

Usage (inside a jit step):
    ring = metrics_push(ring, {"inliers": n, "ba_cost": c})
Host side, every M frames:
    rows = metrics_drain(ring)   # dict name -> np.ndarray of recent values
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class MetricsRing(NamedTuple):
    """Pytree: (capacity, K) scalar buffer + monotone write index.

    `names` is carried host-side by `MetricsSchema` (static, hashable) so the
    ring itself stays a plain array pytree usable as jit carry state.
    """

    buf: jnp.ndarray  # (capacity, K) float32
    idx: jnp.ndarray  # () int32, total pushes (monotone; slot = idx % cap)


class MetricsSchema(NamedTuple):
    names: tuple  # K metric names, position = column


def metrics_init(names: Sequence[str], capacity: int = 256):
    """Returns (MetricsSchema, MetricsRing) with NaN-filled slots."""
    schema = MetricsSchema(names=tuple(names))
    ring = MetricsRing(
        buf=jnp.full((capacity, len(schema.names)), jnp.nan, jnp.float32),
        idx=jnp.zeros((), jnp.int32),
    )
    return schema, ring


def metrics_push(
    schema: MetricsSchema, ring: MetricsRing, values: Dict[str, jnp.ndarray]
) -> MetricsRing:
    """Jit-safe push of one row; unnamed columns keep NaN."""
    row = jnp.full((len(schema.names),), jnp.nan, jnp.float32)
    for k, v in values.items():
        col = schema.names.index(k)  # static (schema is host-side)
        row = row.at[col].set(jnp.asarray(v, jnp.float32))
    cap = ring.buf.shape[0]
    buf = ring.buf.at[ring.idx % cap].set(row)
    return MetricsRing(buf=buf, idx=ring.idx + 1)


def metrics_drain(schema: MetricsSchema, ring: MetricsRing) -> Dict[str, np.ndarray]:
    """Host-side: returns metric columns in push order (oldest first).

    One D->H transfer of the whole (capacity, K) buffer; NaN rows (never
    written) are dropped.
    """
    buf = np.asarray(ring.buf)
    n = int(ring.idx)
    cap = buf.shape[0]
    if n <= cap:
        rows = buf[:n]
    else:
        start = n % cap
        rows = np.concatenate([buf[start:], buf[:start]], axis=0)
    keep = ~np.all(np.isnan(rows), axis=1)
    rows = rows[keep]
    return {name: rows[:, i] for i, name in enumerate(schema.names)}


def format_metrics_line(frame: int, values: Dict[str, float]) -> str:
    """Structured stdout line (SURVEY.md §5.5)."""
    body = " ".join(f"{k}={float(v):.6g}" for k, v in values.items())
    return f"METRIC frame={frame} {body}"
