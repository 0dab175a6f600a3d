"""dist/collectives named wrappers + dist/init bring-up (SURVEY.md §2.3, §4.2).

Runs on the fake 8-device CPU mesh from conftest. The 1-device cases
assert the degeneracy property the wrappers exist for: the same shard_map
program is identity/local-reduce on a 1-device mesh.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from laneslam.dist import collectives as coll
from laneslam.dist.init import ensure_initialized, process_info
from laneslam.dist.mesh import make_mesh


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
    )


@pytest.mark.parametrize("n", [1, 4, 8])
def test_psum_allgather_shapes(n):
    mesh = make_mesh(jax.devices()[:n], frame=n, block=1)
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)

    def body(x_loc):
        s = coll.psum(jnp.sum(x_loc), "frame")
        g = coll.all_gather(x_loc, "frame").reshape(8, 3)
        return s, g

    s, g = _shmap(body, mesh, (P("frame"),), (P(), P()))(x)
    assert float(s) == float(jnp.sum(x))
    assert jnp.array_equal(g[:8], x)  # replicated out-spec keeps one copy


@pytest.mark.parametrize("n", [2, 8])
def test_ring_shift_and_halo(n):
    mesh = make_mesh(jax.devices()[:n], frame=n, block=1)
    x = jnp.arange(n, dtype=jnp.float32)[:, None]  # shard i holds value i

    def body(x_loc):
        rolled = coll.ppermute_shift(x_loc, "frame", shift=1)
        fl, fr = coll.halo_exchange(x_loc, x_loc, "frame")
        return rolled, fl, fr

    rolled, fl, fr = _shmap(
        body, mesh, (P("frame"),), (P("frame"), P("frame"), P("frame"))
    )(x)
    ids = jnp.arange(n, dtype=jnp.float32)
    # shift=1 sends i -> i+1, so slot j now holds j-1 (mod n).
    assert jnp.array_equal(rolled[:, 0], (ids - 1) % n)
    assert jnp.array_equal(fl[:, 0], (ids - 1) % n)  # from left neighbor
    assert jnp.array_equal(fr[:, 0], (ids + 1) % n)  # from right neighbor


def test_topk_merge_streaming_equals_dense():
    key = jax.random.PRNGKey(0)
    sims = jax.random.normal(key, (5, 24))
    ids = jnp.tile(jnp.arange(24)[None, :], (5, 1))
    k = 4
    # Stream in 3 chunks of 8.
    bs = jnp.full((5, k), -jnp.inf)
    bi = jnp.full((5, k), -1, jnp.int32)
    for c in range(3):
        bs, bi = coll.topk_merge(
            bs, bi, sims[:, c * 8:(c + 1) * 8], ids[:, c * 8:(c + 1) * 8], k
        )
    ref_s, ref_i = jax.lax.top_k(sims, k)
    assert jnp.allclose(bs, ref_s)
    assert jnp.array_equal(bi, ref_i)


def test_all_to_all_roundtrip():
    n = 4
    mesh = make_mesh(jax.devices()[:n], frame=n, block=1)
    x = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8)

    def body(x_loc):  # (1, 8) per shard
        split = x_loc.reshape(1, n, 2)
        out = coll.all_to_all(split, "frame", split_axis=1, concat_axis=0)
        return out.reshape(n, 2)

    y = _shmap(body, mesh, (P("frame"),), P(None, "frame"))(x)
    # Column-sharded result must be the same matrix.
    assert jnp.array_equal(y, x)


def test_init_single_process_noop(monkeypatch):
    monkeypatch.delenv("LANESLAM_COORDINATOR", raising=False)
    assert ensure_initialized() is False
    pid, n = process_info()
    assert (pid, n) == (0, 1)
    # num_processes=1 is also a no-op even with a coordinator set.
    monkeypatch.setenv("LANESLAM_COORDINATOR", "localhost:9999")
    monkeypatch.setenv("LANESLAM_NUM_PROCESSES", "1")
    assert ensure_initialized() is False
