"""P4 halo-exchange PGO == single-device PGO (SURVEY §2.2 P4; VERDICT r3 #7).

The CG matvec exchanges only interface values (span boundaries + loop-edge
endpoints); the result must match backend.pgo.pgo_solve to f32 tolerance on
the fake 8-device mesh, including graphs with loop edges crossing shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laneslam.backend.pgo import PgoProblem, pgo_solve
from laneslam.config import PgoConfig
from laneslam.dist.mesh import make_mesh
from laneslam.dist.pgo_sp import pgo_solve_sharded, pgo_solve_sharded_halo
from laneslam.geometry import se3


from laneslam.testing import chain_with_loops as _chain_with_loops


@pytest.mark.parametrize("loops", [((0, None),), ((0, None), (3, 19), (8, 27))])
def test_halo_matches_single_device(loops):
    n_dev = len(jax.devices())
    mesh = make_mesh(jax.devices(), frame=n_dev, block=1)
    N = 4 * n_dev
    E_cap = 5 * n_dev  # divisible by n_dev
    prob = _chain_with_loops(N, E_cap, loops=loops)
    cfg = PgoConfig(gn_iters=5, damping=1e-6)

    ref, _ = pgo_solve(prob, cfg, num_fixed=1, cg_iters=40)
    out, costs, ok = pgo_solve_sharded_halo(
        prob, mesh, cfg, num_fixed=1, cg_iters=40, interface_cap=8
    )
    assert bool(ok), "interface_cap exceeded"
    np.testing.assert_allclose(
        np.asarray(out.T_wc), np.asarray(ref.T_wc), atol=2e-4
    )
    # And agrees with the all_gather variant.
    out2, _ = pgo_solve_sharded(prob, mesh, cfg, num_fixed=1, cg_iters=40)
    np.testing.assert_allclose(
        np.asarray(out.T_wc), np.asarray(out2.T_wc), atol=2e-4
    )


def test_halo_overflow_flag():
    """More cross-shard loop endpoints than interface_cap -> ok=False."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(jax.devices(), frame=n_dev, block=1)
    N = 4 * n_dev
    E_cap = 8 * n_dev
    # Many loop edges all referencing nodes of shard 0.
    loops = tuple((k % 3, N - 1 - k) for k in range(3 * n_dev))
    prob = _chain_with_loops(N, E_cap, loops=loops)
    _, _, ok = pgo_solve_sharded_halo(
        prob, mesh, PgoConfig(gn_iters=1), cg_iters=5, interface_cap=1
    )
    assert not bool(ok)
