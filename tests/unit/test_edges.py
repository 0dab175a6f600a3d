"""EdgeStore: fixed-capacity pose-graph edge table (system.py).

Overflow must DROP with a counter, never silently overwrite (SURVEY
§7.3.2) — the round-3 implementation clamped the write to the last slot.
"""

import jax.numpy as jnp
import numpy as np

from laneslam.system import EdgeStore, _add_edge


def test_add_edge_basic_and_masked():
    es = EdgeStore.empty(4)
    es = _add_edge(es, 0, 1, jnp.eye(4), 1.0)
    es = _add_edge(es, 1, 2, jnp.eye(4), 0.5, enabled=False)  # masked no-op
    es = _add_edge(es, 1, 2, jnp.eye(4), 0.5)
    assert int(es.count) == 2
    assert int(es.overflow) == 0
    assert np.asarray(es.edge_i[:2]).tolist() == [0, 1]
    assert np.asarray(es.edge_j[:2]).tolist() == [1, 2]
    assert np.allclose(np.asarray(es.edge_weight[:2]), [1.0, 0.5])


def test_add_edge_overflow_drops_with_counter():
    es = EdgeStore.empty(2)
    T0 = jnp.eye(4)
    T1 = jnp.eye(4).at[0, 3].set(1.0)
    T2 = jnp.eye(4).at[0, 3].set(2.0)
    es = _add_edge(es, 0, 1, T0, 1.0)
    es = _add_edge(es, 1, 2, T1, 1.0)
    es = _add_edge(es, 2, 3, T2, 1.0)  # full: dropped, counted
    assert int(es.count) == 2
    assert int(es.overflow) == 1
    # The LAST stored edge is untouched (no silent overwrite).
    assert np.allclose(np.asarray(es.edge_T[1]), np.asarray(T1))
    assert int(es.edge_j[1]) == 2
    # Masked adds on a full store do not count as overflow.
    es = _add_edge(es, 3, 4, T2, 1.0, enabled=False)
    assert int(es.overflow) == 1
