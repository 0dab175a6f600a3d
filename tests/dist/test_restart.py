"""Fault injection / checkpoint-resume (SURVEY.md §5.3-5.4, §4.1).

Kill-and-restart a run mid-sequence: checkpoint the full SLAM state pytree,
rebuild a FRESH SlamSystem (simulating a process restart), restore, finish
the sequence, and assert the trajectory matches the uninterrupted run.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.config import DataConfig, SlamConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
from laneslam.eval.ate import ate_rmse
from laneslam.runtime.checkpoint import load_system_state, save_system_state
from laneslam.system import SlamSystem


@pytest.mark.slow
def test_restart_mid_sequence_matches_uninterrupted(tmp_path):
    import jax.numpy as jnp

    n, kill_at = 16, 9
    cfg = SlamConfig(data=DataConfig(dataset="synthetic", max_frames=n))
    scene = make_corridor_scene(seed=0, num_frames=n)
    frames = [render_scene_frame(scene, i) for i in range(n)]

    # Uninterrupted run.
    sys_a = SlamSystem(cfg, scene.cam, enable_loop=False)
    for img in frames:
        sys_a.process_frame(img)
    traj_a = sys_a.trajectory()

    # Interrupted run: checkpoint at kill_at, then "crash".
    sys_b = SlamSystem(cfg, scene.cam, enable_loop=False)
    for img in frames[:kill_at]:
        sys_b.process_frame(img)
    ckpt = str(tmp_path / "state.msgpack")
    save_system_state(ckpt, sys_b)
    del sys_b

    # Restart: fresh process state, restore, continue.
    sys_c = SlamSystem(cfg, scene.cam, enable_loop=False)
    load_system_state(ckpt, sys_c)
    for img in frames[kill_at:]:
        sys_c.process_frame(img)
    traj_c = sys_c.trajectory()

    assert len(traj_c) == len(traj_a)
    # The restored run replays the identical jit programs on identical state:
    # trajectories agree to float32 noise.
    np.testing.assert_allclose(traj_c, traj_a, atol=1e-3)

    # And both runs are accurate vs GT (the §5.3 criterion: restart ATE
    # within tolerance of the uninterrupted ATE).
    m = min(len(traj_a), n)
    r_a, _ = ate_rmse(jnp.asarray(traj_a[:m]), jnp.asarray(scene.poses_wc[:m]))
    r_c, _ = ate_rmse(jnp.asarray(traj_c[:m]), jnp.asarray(scene.poses_wc[:m]))
    assert abs(float(r_a) - float(r_c)) < 5e-3
