"""eval/metrics device-resident ring buffer (SURVEY.md §5.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.eval.metrics import (
    format_metrics_line,
    metrics_drain,
    metrics_init,
    metrics_push,
)


def test_push_drain_roundtrip():
    schema, ring = metrics_init(["inliers", "cost"], capacity=8)
    for i in range(5):
        ring = metrics_push(schema, ring, {"inliers": i, "cost": 10.0 * i})
    out = metrics_drain(schema, ring)
    np.testing.assert_allclose(out["inliers"], np.arange(5))
    np.testing.assert_allclose(out["cost"], 10.0 * np.arange(5))


def test_wraparound_keeps_newest():
    schema, ring = metrics_init(["x"], capacity=4)
    for i in range(10):
        ring = metrics_push(schema, ring, {"x": float(i)})
    out = metrics_drain(schema, ring)
    np.testing.assert_allclose(out["x"], [6, 7, 8, 9])


def test_push_inside_jit():
    schema, ring = metrics_init(["a", "b"], capacity=4)

    @jax.jit
    def step(ring, v):
        return metrics_push(schema, ring, {"a": v, "b": 2 * v})

    for i in range(3):
        ring = step(ring, jnp.float32(i))
    out = metrics_drain(schema, ring)
    np.testing.assert_allclose(out["a"], [0, 1, 2])
    np.testing.assert_allclose(out["b"], [0, 2, 4])


def test_missing_column_is_nan():
    schema, ring = metrics_init(["a", "b"], capacity=4)
    ring = metrics_push(schema, ring, {"a": 1.0})
    out = metrics_drain(schema, ring)
    assert np.isnan(out["b"][0]) and out["a"][0] == 1.0


def test_format_line():
    s = format_metrics_line(7, {"inliers": 42, "cost": 0.5})
    assert s.startswith("METRIC frame=7 ") and "inliers=42" in s
