"""P1 — frame-parallel frontend (SURVEY.md §2.2).

A batch of frames is sharded over mesh axis 'frame'; the FULL feature
extractor (LSD + LBD + points + descriptors) runs per-shard with no
cross-talk (pure data parallelism). Used by the multi-session pipeline and
the multichip dry run.

Formulation (VERDICT r3 #6): each shard processes its local frames with a
lax.scan over the SAME single-frame `extract_features` program the mono
production path scans (system.py _extract_chunk) — NOT vmap. Vmapping the
LSD label-propagation while-loop batches its (H, W) label state out of
VMEM; measured on the attached v5e: 119 ms/frame vmapped vs ~1 ms scanned
(system.py:530). Per-shard scan keeps each frame's label state VMEM-resident
while shards run concurrently across devices — the correct two-level
parallelism: scan within a device, SPMD across devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from laneslam.config import SlamConfig
from laneslam.frontend.extract import FrameFeatures, extract_features


def extract_features_sharded(
    imgs: jnp.ndarray, cfg: SlamConfig, mesh: Mesh
) -> FrameFeatures:
    """imgs: (B, H, W) float32 sharded over 'frame' (B divisible by the axis
    size). Returns the full FrameFeatures pytree with leading dim B, sharded
    over 'frame' — segments, line descriptors, points, point descriptors."""

    def local(imgs_shard):
        _, feats = jax.lax.scan(
            lambda c, im: (c, extract_features(im, cfg)), jnp.zeros(()), imgs_shard
        )
        return feats

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P("frame"),), out_specs=P("frame")
    )
    return jax.jit(fn)(imgs)


def batched_extract_sharded(imgs: jnp.ndarray, cfg: SlamConfig, mesh: Mesh):
    """Line-only view of extract_features_sharded (kept for the multichip
    dryrun contract): returns ((B, K, 4) segment endpoints, (B,) counts)."""
    feats = extract_features_sharded(imgs, cfg, mesh)
    return feats.segments.xyxy, jnp.sum(feats.segments.valid, axis=-1)
