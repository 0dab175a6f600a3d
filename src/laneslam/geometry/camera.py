"""Pinhole camera model: point projection and infinite-line projection.

Line projection (PL-SLAM family, arXiv:1711.08654 §III-B): a Plücker line
L_c = [n_c, v_c] in the camera frame projects to the image line
``l = K_L @ n_c`` where K_L is the *line* intrinsic matrix

    K_L = [[fy,   0,    0],
           [0,    fx,   0],
           [-fy*cx, -fx*cy, fx*fy]]

``l = (a, b, c)`` is the implicit image-line; the residual of an observed
endpoint (u, v) is the normalized point-line distance
``(a*u + b*v + c) / sqrt(a^2 + b^2)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole intrinsics; fields are scalars (or broadcastable arrays)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = 0
    height: int = 0
    baseline: float = 0.0  # stereo baseline in meters (0 => monocular)

    def K(self) -> jnp.ndarray:
        fx, fy, cx, cy = (jnp.asarray(v, jnp.float32) for v in (self.fx, self.fy, self.cx, self.cy))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx], axis=-1),
                jnp.stack([z, fy, cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    def K_line(self) -> jnp.ndarray:
        """Line-projection intrinsic K_L (3, 3)."""
        fx, fy, cx, cy = (jnp.asarray(v, jnp.float32) for v in (self.fx, self.fy, self.cx, self.cy))
        z = jnp.zeros_like(fx)
        return jnp.stack(
            [
                jnp.stack([fy, z, z], axis=-1),
                jnp.stack([z, fx, z], axis=-1),
                jnp.stack([-fy * cx, -fx * cy, fx * fy], axis=-1),
            ],
            axis=-2,
        )


def project_points(cam: Camera, X_c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (..., 3) -> pixel coords (..., 2) and depth (...,).

    Depth <= 0 means behind the camera; callers mask on it. Division is
    guarded so masked-out lanes never produce inf/nan.
    """
    z = X_c[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * X_c[..., 0] * inv_z + cam.cx
    v = cam.fy * X_c[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def pixel_bearing(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> normalized-plane bearing (..., 3) with z=1."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project_line(cam: Camera, L_c: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame Plücker line (..., 6) -> image line l = (a, b, c) (..., 3)."""
    n_c = L_c[..., :3]
    return jnp.einsum("ij,...j->...i", cam.K_line(), n_c)


def line_point_distance(l: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of pixels (..., 2) to image lines l (..., 3)."""
    norm = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    d = l[..., 0] * uv[..., 0] + l[..., 1] * uv[..., 1] + l[..., 2]
    return d / jnp.maximum(norm, 1e-12)
