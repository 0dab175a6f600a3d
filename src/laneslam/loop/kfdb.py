"""Keyframe database / place recognition (SURVEY.md C11).

The reference family uses a DBoW2 vocabulary tree (C++). The TPU-native
redesign mandated by BASELINE.json:5 is device-resident GEMM retrieval:

 - vocabulary: a FIXED random codebook of C unit vectors (seeded — no
   training needed; random codebooks quantize binary-sign descriptors well);
 - keyframe signature: L2-normalized visual-word histogram of its point
   descriptors. Assignment is one (K_feat, C) GEMM + argmax; the histogram
   is one scatter-add — all on device;
 - query: one GEMV against the (K, C) database + top-k.

(A mean-descriptor signature is NOT usable here: averaging many LBD/BRIEF
descriptors converges to a near-constant vector and every pair of keyframes
looks ~identical — measured sims were 0.99-1.0 across an entire run.)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import LoopConfig


@lru_cache(maxsize=8)
def _codebook_np(vocab_size: int, desc_dim: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(vocab_size, desc_dim)).astype(np.float32)
    return C / np.linalg.norm(C, axis=-1, keepdims=True)


def codebook(vocab_size: int, desc_dim: int) -> jnp.ndarray:
    return jnp.asarray(_codebook_np(vocab_size, desc_dim))


def aggregate_descriptor(
    desc: jnp.ndarray, valid: jnp.ndarray, vocab: jnp.ndarray
) -> jnp.ndarray:
    """(K, D) descriptors + (K,) mask -> (C,) normalized word histogram."""
    C = vocab.shape[0]
    sim = jnp.einsum("kd,cd->kc", desc, vocab, preferred_element_type=jnp.float32)
    word = jnp.argmax(sim, axis=-1)  # (K,)
    word = jnp.where(valid, word, C + 1)
    hist = jnp.zeros((C,), jnp.float32).at[word].add(1.0, mode="drop")
    return hist / jnp.maximum(jnp.linalg.norm(hist), 1e-12)


def query_kfdb(
    db: jnp.ndarray,  # (K, C) keyframe word histograms
    kf_valid: jnp.ndarray,  # (K,)
    query: jnp.ndarray,  # (C,)
    query_kf_id: jnp.ndarray,  # scalar: the querying keyframe (excluded + gap)
    cfg: LoopConfig = LoopConfig(),
    covis_row: jnp.ndarray | None = None,  # (K,) shared-landmark counts
):
    """Top-k loop candidates: (ids (k,), sims (k,)); id -1 below threshold.

    Candidates must be older than a small keyframe gap AND (if the
    covisibility row is given) share no landmarks with the query — the
    standard exclusion of the covisible neighborhood, which scales with
    keyframe density where a fixed id-gap does not.
    """
    sim = db @ query  # (K,) one GEMV on device
    gap_ok = jnp.arange(db.shape[0]) < (query_kf_id - cfg.min_kf_gap)
    if covis_row is not None:
        gap_ok = gap_ok & (covis_row < cfg.covis_exclusion)
    sim = jnp.where(kf_valid & gap_ok, sim, -1e9)
    top_sim, top_idx = jax.lax.top_k(sim, cfg.top_k)
    ok = top_sim > cfg.min_similarity
    return jnp.where(ok, top_idx, -1), jnp.where(ok, top_sim, 0.0)
