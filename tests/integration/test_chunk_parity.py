"""Fused-chunk path vs per-frame path parity (ADVICE r3 #3).

The chunked program (_slam_chunk) fuses track + keyframe + BA + cond-gated
loop/PGO into one dispatch and runs at a FIXED keyframe cadence, so it is
not bitwise-identical to the adaptive per-frame path — but on the same
synthetic sequence both must produce comparable trajectories. This is the
test class that catches the round-3 regression where the chunk path ran
PGO unconditionally and overwrote window-BA refinements every chunk.
"""

import numpy as np
import pytest

from laneslam.config import SlamConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
from laneslam.eval.ate import ate_rmse
from laneslam.geometry.camera import Camera
from laneslam.system import SlamSystem


def _cam_of(scene) -> Camera:
    return Camera(
        fx=float(scene.cam.fx), fy=float(scene.cam.fy),
        cx=float(scene.cam.cx), cy=float(scene.cam.cy),
        width=scene.cam.width, height=scene.cam.height,
    )


@pytest.mark.slow
def test_chunk_parity_with_per_frame_path():
    import jax.numpy as jnp

    n = 48
    scene = make_corridor_scene(seed=0, num_frames=n)
    frames = [np.asarray(render_scene_frame(scene, i)) for i in range(n)]
    cfg = SlamConfig()
    cam = _cam_of(scene)
    gt = jnp.asarray(scene.poses_wc[:n])

    # --- per-frame (latency) path.
    sys_a = SlamSystem(cfg, cam, enable_loop=True, enable_ba=True)
    for f in frames:
        sys_a.process_frame(f)
    traj_a = sys_a.trajectory()

    # --- chunked (throughput) path, deferred readbacks + one flush.
    sys_b = SlamSystem(cfg, cam, enable_loop=True, enable_ba=True)
    sys_b.defer_readback = True
    i = 0
    while not sys_b.bootstrapped or i < 4:
        sys_b.process_frame(frames[i])
        i += 1
    sys_b.resync()  # no-op off-tunnel; exercises the barrier code path
    chunk = cfg.frontend.chunk_frames
    while i < n:
        sys_b.process_chunk(np.stack(frames[i:i + chunk]))
        i += chunk
    traj_b = sys_b.trajectory()

    assert len(traj_b) == n
    assert np.all(np.isfinite(traj_a))
    assert np.all(np.isfinite(traj_b))
    ate_a, _ = ate_rmse(jnp.asarray(traj_a), gt, align_scale=True)
    ate_b, _ = ate_rmse(jnp.asarray(traj_b), gt, align_scale=True)
    # Both paths must track the synthetic corridor; the fixed-cadence chunk
    # path is allowed a modest margin over the adaptive path.
    # Measured on this fixture: per-frame 0.51, chunk 0.30 (the chunk
    # path's fixed cadence gives denser keyframes here). The regression this
    # guards (r3: unconditional PGO overwriting BA refinements every chunk)
    # shows up as chunk ATE exploding past the per-frame ATE.
    assert float(ate_a) < 0.8, f"per-frame ATE {float(ate_a)}"
    assert float(ate_b) < max(0.6, 2.0 * float(ate_a)), (
        f"chunk ATE {float(ate_b)} vs per-frame {float(ate_a)}"
    )
    # Deferred bookkeeping reconstructed the same stats schema.
    assert len(sys_b.stats) > 0 and len(sys_b.poses) == n
    assert int(sys_b.edges.overflow) == 0


@pytest.mark.slow
def test_adaptive_chunk_keyframing_fewer_kfs_equal_ate():
    """VERDICT r4 #4: with chunk_adaptive_kf the chunk path keyframes at
    <= 1 per chunk, decided by the span's signals. On a well-tracked
    corridor with a loose interval, it must produce materially FEWER
    keyframes than the fixed cadence at comparable ATE (fixed cadence
    bloats the map on low-motion spans)."""
    import dataclasses

    import jax.numpy as jnp

    n = 64
    scene = make_corridor_scene(seed=3, num_frames=n)
    frames = [np.asarray(render_scene_frame(scene, i)) for i in range(n)]
    cam = _cam_of(scene)
    gt = jnp.asarray(scene.poses_wc[:n])

    def run(adaptive):
        cfg = SlamConfig()
        cfg = cfg.override(frontend=dataclasses.replace(
            cfg.frontend, chunk_adaptive_kf=adaptive, kf_max_interval=24,
        ))
        s = SlamSystem(cfg, cam, enable_loop=True, enable_ba=True)
        s.defer_readback = True
        i = 0
        while not s.bootstrapped or i < 4:
            s.process_frame(frames[i])
            i += 1
        s.resync()
        chunk = cfg.frontend.chunk_frames
        while i + chunk <= n:
            s.process_chunk(np.stack(frames[i:i + chunk]))
            i += chunk
        for k in range(i, n):
            s.process_frame(frames[k])
        s.flush_chunks()
        traj = s.trajectory()
        ate, _ = ate_rmse(jnp.asarray(traj), gt[: len(traj)], align_scale=True)
        return int(s.map.kf_count), float(ate), traj

    kf_fixed, ate_fixed, _ = run(False)
    kf_adapt, ate_adapt, traj = run(True)
    assert np.all(np.isfinite(traj))
    # Fixed cadence: 1 KF per 8-frame chunk. Adaptive with interval 24:
    # roughly one per 3 chunks on this well-tracked scene.
    assert kf_adapt <= kf_fixed - 3, (kf_adapt, kf_fixed)
    assert ate_adapt < max(2.5 * ate_fixed, 0.6), (ate_adapt, ate_fixed)
