import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import LbdConfig, MatchConfig, PointConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame, scene_observations
from laneslam.features import (
    describe_lines,
    describe_points,
    detect_lines,
    detect_points,
    match_lines,
    match_points,
)
from laneslam.features.containers import Segments
from laneslam.features.match import match_descriptors


def _frame(scene, i):
    return jnp.asarray(render_scene_frame(scene, i), jnp.float32)


class TestLbd:
    def test_shapes_and_masking(self):
        scene = make_corridor_scene(seed=2, num_frames=2)
        img = _frame(scene, 0)
        segs = detect_lines(img)
        d = describe_lines(img, segs)
        assert d.shape == (segs.capacity, 72)
        # Invalid slots are zero; valid slot halves are unit-norm.
        inv = ~np.asarray(segs.valid)
        np.testing.assert_allclose(np.asarray(d)[inv], 0.0)
        val = np.asarray(segs.valid)
        if val.any():
            h = d.shape[1] // 2
            norms = np.linalg.norm(np.asarray(d)[val][:, :h], axis=-1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_descriptor_stability_across_frames(self):
        """Same physical line in consecutive frames -> most similar descriptor."""
        scene = make_corridor_scene(seed=2, num_frames=3)
        img0, img1 = _frame(scene, 0), _frame(scene, 1)
        s0, s1 = detect_lines(img0), detect_lines(img1)
        d0, d1 = describe_lines(img0, s0), describe_lines(img1, s1)
        m = match_lines(s0, d0, s1, d1)
        n = int(m.num())
        assert n >= 20
        # Matched pairs must be geometrically consistent (small motion).
        idx = np.asarray(m.idx)
        v = np.asarray(m.valid)
        mid0 = np.asarray(s0.midpoint())[v]
        mid1 = np.asarray(s1.midpoint())[idx[v]]
        d = np.linalg.norm(mid0 - mid1, axis=-1)
        assert np.median(d) < 20.0


class TestPoints:
    def test_detects_corners_of_checkerboard(self):
        # 8x8 checkerboard: interior corners are ideal Shi-Tomasi targets.
        tile = 40
        n = 8
        img = np.zeros((tile * n, tile * n), np.float32)
        for i in range(n):
            for j in range(n):
                if (i + j) % 2 == 0:
                    img[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile] = 255.0
        pts = detect_points(jnp.asarray(img), PointConfig(max_points=128))
        assert int(pts.valid.sum()) >= 25
        uv = np.asarray(pts.uv)[np.asarray(pts.valid)]
        # Detected points sit near lattice crossings (multiples of tile).
        err = np.abs((uv + tile / 2) % tile - tile / 2)
        assert np.median(err.max(axis=-1)) < 3.0

    def test_descriptors_pm_one(self):
        scene = make_corridor_scene(seed=4, num_frames=1)
        img = _frame(scene, 0)
        pts = detect_points(img)
        d = describe_points(img, pts)
        val = np.asarray(pts.valid)
        vals = np.unique(np.abs(np.asarray(d)[val]).round(6))
        assert len(vals) == 1  # all entries ±1/sqrt(D)


class TestMatcher:
    def test_exact_match_on_synthetic_descriptors(self):
        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (64, 32))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        perm = jax.random.permutation(jax.random.PRNGKey(1), 64)
        m = match_descriptors(d, d[perm], jnp.ones(64, bool), jnp.ones(64, bool))
        idx = np.asarray(m.idx)
        inv = np.argsort(np.asarray(perm))
        assert np.all(idx == inv)

    def test_ratio_test_rejects_ambiguous(self):
        # Query equidistant from two B descriptors -> ambiguous -> rejected.
        e = jnp.eye(4, 8)
        a = e[0:1] + 0.2 * e[3:4]
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = jnp.stack([e[0] + 0.1 * e[1], e[0] - 0.1 * e[1]])
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        m = match_descriptors(a, b, jnp.ones(1, bool), jnp.ones(2, bool), ratio=0.8)
        assert not bool(m.valid[0])

    def test_gate_blocks_matches(self):
        d = jnp.eye(8, 16)
        gate = jnp.zeros((8, 8), bool)
        m = match_descriptors(d, d, jnp.ones(8, bool), jnp.ones(8, bool), gate=gate)
        assert int(m.num()) == 0

    def test_point_matching_across_frames(self):
        scene = make_corridor_scene(seed=5, num_frames=3)
        img0, img1 = _frame(scene, 0), _frame(scene, 1)
        p0, p1 = detect_points(img0), detect_points(img1)
        d0, d1 = describe_points(img0, p0), describe_points(img1, p1)
        m = match_points(p0, d0, p1, d1)
        assert int(m.num()) >= 30
        v = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        duv = np.linalg.norm(
            np.asarray(p0.uv)[v] - np.asarray(p1.uv)[idx[v]], axis=-1
        )
        assert np.median(duv) < 30.0
