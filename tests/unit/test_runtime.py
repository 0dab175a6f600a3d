import numpy as np
import jax.numpy as jnp

from laneslam.config import MapConfig
from laneslam.map.map import make_empty_map
from laneslam.map import ops
from laneslam.runtime.checkpoint import load_map_state, save_map_state
from laneslam.runtime.prefetch import Prefetcher


def test_checkpoint_roundtrip(tmp_path):
    cfg = MapConfig(max_keyframes=8, max_points=64, max_lines=16,
                    max_obs_per_kf=8, max_line_obs_per_kf=4)
    m = make_empty_map(cfg)
    m, _ = ops.add_points(
        m, jnp.arange(9, dtype=jnp.float32).reshape(3, 3), jnp.ones((3, 256)),
        jnp.ones(3, bool), jnp.zeros(3, jnp.int32),
    )
    path = str(tmp_path / "ckpt.msgpack")
    save_map_state(path, m, extra={"note": np.asarray(42)})
    m2, edges, extra = load_map_state(path)
    assert edges is None
    assert int(extra["note"]) == 42
    assert int(m2.pt_count) == 3
    np.testing.assert_allclose(np.asarray(m2.pt_xyz), np.asarray(m.pt_xyz))
    np.testing.assert_array_equal(np.asarray(m2.pt_valid), np.asarray(m.pt_valid))


def test_checkpoint_atomic_overwrite(tmp_path):
    cfg = MapConfig(max_keyframes=4, max_points=8, max_lines=4,
                    max_obs_per_kf=4, max_line_obs_per_kf=2)
    m = make_empty_map(cfg)
    path = str(tmp_path / "ckpt.msgpack")
    save_map_state(path, m)
    m, _ = ops.add_points(m, jnp.ones((1, 3)), jnp.ones((1, 256)),
                          jnp.ones(1, bool), jnp.zeros(1, jnp.int32))
    save_map_state(path, m)  # overwrite
    m2, _, _ = load_map_state(path)
    assert int(m2.pt_count) == 1


def test_prefetcher_order_and_content():
    frames = [np.full((4, 4), i, np.float32) for i in range(10)]
    out = list(Prefetcher(iter(frames), depth=2))
    assert len(out) == 10
    for i, f in enumerate(out):
        assert float(jnp.asarray(f)[0, 0]) == i


def test_prefetcher_with_transform():
    frames = [np.ones((2, 2), np.uint8) * i for i in range(5)]
    out = list(Prefetcher(iter(frames), transform=lambda x: x.astype(np.float32) * 2))
    assert float(jnp.asarray(out[3])[0, 0]) == 6.0


def test_prefetcher_propagates_worker_errors():
    """A decode/IO failure mid-stream must raise at the consumer, not
    silently truncate the sequence (ADVICE r2: truncated runs previously
    reported ATE/fps over partial trajectories)."""
    import pytest

    def frames():
        yield np.zeros((4, 4), np.uint8)
        raise IOError("corrupt frame")

    it = iter(Prefetcher(frames(), depth=2, upload=False))
    next(it)  # first frame flows through
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(it)
