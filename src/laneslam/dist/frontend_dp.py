"""P1 — frame-parallel frontend (SURVEY.md §2.2).

A batch of frames is sharded over mesh axis 'frame'; LSD/LBD/point
extraction runs per-shard with no cross-talk (pure data parallelism). Used
by the multi-session pipeline and the multichip dry run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from laneslam.config import SlamConfig
from laneslam.features.lsd import detect_lines


def batched_extract_sharded(imgs: jnp.ndarray, cfg: SlamConfig, mesh: Mesh):
    """imgs: (B, H, W) sharded over 'frame'. Returns (B, K, 4) segments + (B,) counts.

    Implemented with shard_map so each device runs the single-image program
    over its local shard via vmap — no resharding, no collectives.
    """

    def local(imgs_shard):
        segs = jax.vmap(lambda im: detect_lines(im, cfg.lsd))(imgs_shard)
        return segs.xyxy, jnp.sum(segs.valid, axis=-1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("frame"),),
        out_specs=(P("frame"), P("frame")),
    )
    return jax.jit(fn)(imgs)
