"""LSD sweep kernel vs XLA reference + detector integration parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laneslam.kernels.lsd_sweep import conn_bits, lsd_sweep_pallas, lsd_sweep_xla

INTERPRET = jax.default_backend() != "tpu"


def _problem(key, H=48, W=128, density=0.4):
    k1, k2 = jax.random.split(key)
    mask = jax.random.uniform(k1, (H, W)) < density
    angle = jax.random.uniform(k2, (H, W), minval=-np.pi, maxval=np.pi)
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    return jnp.where(mask, lin, -1), mask, angle


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("n_sweeps", [1, 4])
def test_sweep_kernel_equals_xla(seed, n_sweeps):
    labels0, mask, angle = _problem(jax.random.PRNGKey(seed))
    bits = conn_bits(mask, angle, float(np.deg2rad(22.5)))
    ref = lsd_sweep_xla(labels0, bits, n_sweeps)
    out = lsd_sweep_pallas(labels0, bits, n_sweeps, interpret=INTERPRET)
    assert (ref == out).all()
    assert int((ref >= 0).sum()) == int(mask.sum())  # mask preserved


def test_conn_bits_symmetric_structure():
    """A constant-angle solid block is fully connected internally."""
    H, W = 16, 128
    mask = jnp.zeros((H, W), bool).at[4:10, 8:40].set(True)
    angle = jnp.full((H, W), 0.3)
    bits = conn_bits(mask, angle, 0.1)
    # Interior pixels have all 8 bits set.
    assert int(bits[6, 20]) == 255
    # Outside the mask no bits are set.
    assert int(bits[0, 0]) == 0
    # Propagation floods the whole block to one label in few sweeps.
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(mask, lin, -1)
    out = lsd_sweep_xla(labels, bits, 40)
    lab = np.asarray(out)[np.asarray(mask)]
    assert (lab == lab.max()).all()
