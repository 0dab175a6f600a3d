"""P4/P5/P6 invariants on the fake 8-device CPU mesh (SURVEY.md §4.1)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from backend.test_pgo import circle_graph

from laneslam.backend.pgo import pgo_solve
from laneslam.config import PgoConfig
from laneslam.dist.mesh import make_mesh
from laneslam.dist.pgo_sp import pgo_solve_sharded
from laneslam.dist.ring import reshard_frame_to_block, ring_topk_query


@pytest.fixture(scope="module")
def mesh8f():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return make_mesh(jax.devices()[:8], frame=8, block=1)


class TestShardedPgo:
    def test_matches_single_device(self, mesh8f):
        prob, T_gt = circle_graph(N=40, drift=0.02)
        cfg = PgoConfig(gn_iters=5, damping=1e-6)
        out_s, costs_s = pgo_solve_sharded(prob, mesh8f, cfg, cg_iters=80)
        out_1, info_1 = pgo_solve(prob, cfg, cg_iters=80)
        # float32 reduction-order noise bounds the comparison.
        c0 = float(info_1.cost[0])
        np.testing.assert_allclose(
            np.asarray(costs_s), np.asarray(info_1.cost[:-1]), atol=1e-4 * c0
        )
        np.testing.assert_allclose(
            np.asarray(out_s.T_wc), np.asarray(out_1.T_wc), atol=1e-3
        )

    def test_closes_loop_sharded(self, mesh8f):
        prob, T_gt = circle_graph(N=40, drift=0.02)
        out, costs = pgo_solve_sharded(
            prob, mesh8f, PgoConfig(gn_iters=15, damping=1e-6), cg_iters=80
        )
        c = np.asarray(costs)
        assert c[-1] < 1e-3 * c[0]


class TestRingRetrieval:
    def test_equals_dense_topk(self, mesh8f):
        key = jax.random.PRNGKey(0)
        K, C, Q = 64, 32, 16
        db = jax.random.normal(key, (K, C))
        db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
        valid = jax.random.uniform(jax.random.PRNGKey(1), (K,)) > 0.2
        q = jax.random.normal(jax.random.PRNGKey(2), (Q, C))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

        ids_r, sims_r = ring_topk_query(db, valid, q, mesh8f, top_k=5)

        sim_dense = jnp.where(valid[None, :], q @ db.T, -jnp.inf)
        sims_d, ids_d = jax.lax.top_k(sim_dense, 5)
        np.testing.assert_allclose(
            np.asarray(sims_r), np.asarray(sims_d), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(ids_r), np.asarray(ids_d))


class TestAllToAllReshard:
    def test_roundtrip_values(self, mesh8f):
        x = jnp.arange(64 * 24, dtype=jnp.float32).reshape(64, 24)
        y = reshard_frame_to_block(x, mesh8f)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_sharding_layout_flipped(self, mesh8f):
        x = jnp.ones((64, 24), jnp.float32)
        y = reshard_frame_to_block(x, mesh8f)
        # Output is sharded along axis 1 over 'frame'.
        spec = y.sharding.spec
        assert spec[0] is None and spec[1] == "frame"
