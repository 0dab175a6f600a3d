"""Fixed-capacity feature containers (pytrees of arrays + valid masks).

Static shapes are the TPU contract (SURVEY.md §7.3): every container has
capacity-K arrays and a boolean `valid` mask; invalid slots hold zeros.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Segments(NamedTuple):
    """K line segments: endpoints (K, 4) = [x1, y1, x2, y2] in pixels."""

    xyxy: jnp.ndarray  # (K, 4) float32
    angle: jnp.ndarray  # (K,) radians in (-pi, pi], direction of the segment
    width: jnp.ndarray  # (K,) rectangle width estimate
    score: jnp.ndarray  # (K,) salience (aligned-pixel count or -log10 NFA)
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def length(self) -> jnp.ndarray:
        d = self.xyxy[..., 2:] - self.xyxy[..., :2]
        return jnp.sqrt(jnp.sum(d * d, axis=-1))

    def midpoint(self) -> jnp.ndarray:
        return 0.5 * (self.xyxy[..., :2] + self.xyxy[..., 2:])

    @staticmethod
    def empty(capacity: int) -> "Segments":
        z = jnp.zeros((capacity,), jnp.float32)
        return Segments(
            xyxy=jnp.zeros((capacity, 4), jnp.float32),
            angle=z, width=z, score=z,
            valid=jnp.zeros((capacity,), bool),
        )


class Points(NamedTuple):
    """K corner features."""

    uv: jnp.ndarray  # (K, 2) float32 pixel positions
    score: jnp.ndarray  # (K,) corner response
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[-2]

    @staticmethod
    def empty(capacity: int) -> "Points":
        return Points(
            uv=jnp.zeros((capacity, 2), jnp.float32),
            score=jnp.zeros((capacity,), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )
