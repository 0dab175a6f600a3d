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

Round-3 retrieval fix (the round-2 end-to-end loop failure): with a 128-word
codebook and ~200 features per keyframe the histograms saturate — every
keyframe pair measured 0.85-0.92 cosine similarity and the true loop
candidate never ranked inside top-k. Two changes restore separability
(measured on the synthetic loop scene: true-candidate sim 0.22 vs distractor
mean 0.12, rank 0):
 - vocab_size 128 -> 1024 (sparse histograms: ~200 draws over 1024 words);
 - IDF re-weighting at query time, computed on device from the live DB
   (one reduction over the (K, C) histogram matrix — words seen by many
   keyframes carry no place information and are down-weighted, exactly the
   DBoW tf-idf scheme recast as a GEMV-side rescale).
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


def idf_weights(db: jnp.ndarray, kf_valid: jnp.ndarray) -> jnp.ndarray:
    """(C,) inverse-document-frequency weights from the live histogram DB.

    df[c] = number of valid keyframes whose histogram contains word c;
    idf = log((K+1)/(df+1)). Computed on device each query — one boolean
    reduction over (K, C), negligible next to the retrieval GEMV.
    """
    present = (db > 1e-6) & kf_valid[:, None]
    df = jnp.sum(present, axis=0).astype(jnp.float32)
    K = jnp.maximum(jnp.sum(kf_valid), 1).astype(jnp.float32)
    return jnp.log((K + 1.0) / (df + 1.0))


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
    if cfg.use_idf:
        w = idf_weights(db, kf_valid)
        dbw = db * w[None, :]
        dbw = dbw / jnp.maximum(jnp.linalg.norm(dbw, axis=-1, keepdims=True), 1e-12)
        qw = query * w
        qw = qw / jnp.maximum(jnp.linalg.norm(qw), 1e-12)
    else:
        dbw, qw = db, query
    sim = dbw @ qw  # (K,) one GEMV on device
    gap_ok = jnp.arange(db.shape[0]) < (query_kf_id - cfg.min_kf_gap)
    if covis_row is not None:
        gap_ok = gap_ok & (covis_row < cfg.covis_exclusion)
    sim = jnp.where(kf_valid & gap_ok, sim, -1e9)
    top_sim, top_idx = jax.lax.top_k(sim, cfg.top_k)
    ok = top_sim > cfg.min_similarity
    return jnp.where(ok, top_idx, -1), jnp.where(ok, top_sim, 0.0)
