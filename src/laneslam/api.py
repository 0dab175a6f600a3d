"""L11 public API: one entry point per judged config (BASELINE.json:7-11).

  run_odometry    — config 1: mono frame-to-frame VO (CPU-runnable)
  run_slam        — configs 2/3: sliding-window BA + loop closure + PGO
  run_stereo      — config 4: EuRoC stereo point+line BA
  run_distributed — config 5: multi-host sharded BA/PGO
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from laneslam.config import SlamConfig
from laneslam.geometry.camera import Camera


@dataclass
class RunResult:
    poses: np.ndarray  # (F, 4, 4) estimated T_wc
    gt_poses: Optional[np.ndarray]  # (F, 4, 4) or None
    ate_rmse: Optional[float]
    frames_per_sec: float
    diagnostics: dict = field(default_factory=dict)


def _load_dataset(cfg: SlamConfig, skip: int = 0):
    """Returns (frame_iter, cam, gt_poses, num_frames, rectify, paths);
    frame_iter yields np arrays starting at frame `skip` (resume avoids
    re-decoding the prefix). `rectify` is the mono RectifyParams pair for
    distorted unrectified datasets (EuRoC): when sensor.yaml carries
    distortion, ds.camera is the RECTIFIED pinhole model, so raw feature
    coordinates must be mapped through it (SlamSystem rectify=...) —
    otherwise raw pixels are interpreted under the wrong principal
    point/focal (tens of px of error; ADVICE r3 #2). `paths` (file-backed
    datasets only, else None) lets the chunked feed batch-decode whole
    chunks through the native C++ thread pool (VERDICT r3 #9)."""
    d = cfg.data
    if d.dataset == "kitti":
        from laneslam.data.kitti import KittiOdometry

        ds = KittiOdometry(d.root, d.sequence)
        n = len(ds) if d.max_frames == 0 else min(d.max_frames, len(ds))
        gt = ds.gt_poses[:n] if ds.gt_poses is not None else None
        paths = [ds.frame_path(i) for i in range(skip, n)]
        return (ds.read_frame(i) for i in range(skip, n)), ds.camera, gt, n, None, paths
    if d.dataset == "euroc":
        from laneslam.data.euroc import EurocStereo

        ds = EurocStereo(d.root)
        n = len(ds) if d.max_frames == 0 else min(d.max_frames, len(ds))
        gt = ds.gt_poses_at(ds.stamps0[:n])
        rect = (ds.rect[0], ds.rect[0]) if ds.rect is not None else None
        return (ds.read_pair(i)[0] for i in range(skip, n)), ds.camera, gt, n, rect, None
    if d.dataset in ("synthetic", "synthetic_loop"):
        from laneslam.data.synthetic import (
            make_corridor_scene,
            make_loop_scene,
            render_scene_frame,
        )

        n = d.max_frames or 30
        maker = make_loop_scene if d.dataset == "synthetic_loop" else make_corridor_scene
        scene = maker(seed=0, num_frames=n)
        return (
            (render_scene_frame(scene, i) for i in range(skip, n)),
            scene.cam,
            scene.poses_wc,
            n,
            None,
            None,
        )
    raise ValueError(f"unknown dataset {d.dataset!r}")


def run_slam(
    cfg: SlamConfig,
    enable_loop: bool = True,
    enable_ba: bool = True,
    verbose: bool = True,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    chunked: bool = False,
    final_global_ba: bool = False,
) -> RunResult:
    """Configs 2/3 (BASELINE.json:8-9): keyframe SLAM with sliding-window
    point+line BA, device-resident covisibility/KF-DB, loop closure + PGO.

    final_global_ba=True runs one full-map BA over all keyframes after the
    sequence (SlamSystem.global_ba) — the post-loop-closure refinement that
    removes the drift shared by revisited passes, which pose-graph edges
    alone cannot (they only lock the passes together).

    checkpoint_every > 0 writes the full system pytree to `checkpoint_path`
    every that many frames (SURVEY.md §5.4); `resume` restores it and
    continues mid-sequence (frames already in the restored trajectory are
    skipped).

    chunked=True drives post-bootstrap frames through SlamSystem.
    process_chunk — cfg.frontend.chunk_frames frames per device dispatch
    with the keyframe/BA/loop path fused on-device (the throughput mode;
    the default per-frame path is the latency mode).
    """
    import os

    from laneslam.eval.ate import ate_rmse
    from laneslam.runtime.checkpoint import load_system_state, save_system_state
    from laneslam.runtime.prefetch import Prefetcher
    from laneslam.system import SlamSystem

    frames, cam, gt, n, rect, paths = _load_dataset(cfg)
    sys_ = SlamSystem(cfg, cam, enable_loop=enable_loop, enable_ba=enable_ba,
                      rectify=rect)

    start = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        load_system_state(checkpoint_path, sys_)
        start = len(sys_.poses)
        if start > 0:
            # Rebuild the feed from `start`: resume must not pay a decode
            # for every already-processed frame (the discarded generator
            # above is lazy — nothing was decoded yet).
            frames = _load_dataset(cfg, skip=start)[0]
        if verbose:
            print(f"[slam] resumed from {checkpoint_path} at frame {start}")
    # Throughput mode: chunk outputs stay on device until the end of the run
    # (or a checkpoint), so the steady-state loop is readback-free — on the
    # tunneled TPU client a single readback degrades dispatch ~100x
    # (runtime/hostsync.py).
    sys_.defer_readback = chunked
    chunk = max(cfg.frontend.chunk_frames, 1)

    t_start = time.perf_counter()
    t_first = None
    n_done = 0
    chunks_started = False

    def _log(i):
        if not verbose or i <= 0:
            return
        if sys_._pending_chunks:
            # Deferred mode: no device reads for logging — the steady-state
            # loop must stay readback-free.
            print(f"[slam] frame {i}/{n} (deferred)")
        else:
            # §5.5: one bulk drain of the device metrics ring instead of
            # per-frame scalar reads.
            mtr = sys_.drain_metrics()
            inl = mtr.get("inliers")
            msg = (
                f"inliers_mean={np.nanmean(inl[-50:]):.1f} "
                f"fallbacks={int(np.nansum(mtr['fallback'][-50:]))}"
                if inl is not None and len(inl) else ""
            )
            print(f"[slam] frame {i}/{n} {msg} {sys_.stats[-1] if sys_.stats else {}}")

    def _maybe_checkpoint(i):
        if checkpoint_path and checkpoint_every and (i + 1) % checkpoint_every < (
            chunk if chunks_started else 1
        ):
            save_system_state(checkpoint_path, sys_)  # flushes deferred chunks
            sys_.resync()

    if chunked and paths is not None:
        # File-backed chunked feed (VERDICT r3 #9): the native C++ thread
        # pool batch-decodes each chunk into ONE contiguous block while the
        # device computes the previous chunk; process_chunk uploads it as a
        # single transfer. Bootstrap frames come out of the same blocks.
        from laneslam.runtime.prefetch import ChunkPrefetcher

        i = start - 1
        for block in ChunkPrefetcher(paths, chunk=chunk, depth=2):
            if not sys_.bootstrapped:
                for f in block:
                    i += 1
                    n_done += 1
                    sys_.process_frame(f)
            else:
                if not chunks_started:
                    chunks_started = True
                    sys_.resync()  # bootstrap read back scalars per frame
                sys_.process_chunk(block)
                i += len(block)
                n_done += len(block)
            if t_first is None:
                t_first = time.perf_counter()
            _maybe_checkpoint(i)
            if i % 50 < chunk:
                _log(i)
        sys_.flush_chunks()
    else:
        # P3: decode/convert frame t+1 on the host thread + async-upload
        # while frame t computes (BASELINE.json:5 double-buffered host I/O).
        # The chunked path stacks each chunk host-side, one upload per block.
        frames = Prefetcher(frames, depth=2, upload=not chunked)
        buf: list = []
        for i, img in enumerate(frames, start=start):
            if chunked and sys_.bootstrapped:
                if not chunks_started:
                    chunks_started = True
                    sys_.resync()
                buf.append(np.asarray(img))
                if len(buf) >= chunk:
                    sys_.process_chunk(np.stack(buf))
                    buf = []
            else:
                sys_.process_frame(img)
            n_done += 1
            if t_first is None:
                t_first = time.perf_counter()
            if not buf:
                _maybe_checkpoint(i)
            if verbose and i % 50 == 0 and i > 0:
                _log(i)
        if buf:
            sys_.process_chunk(np.stack(buf))
        sys_.flush_chunks()
    elapsed = time.perf_counter() - (t_first or t_start)
    if final_global_ba and enable_ba:
        sys_.global_ba()
    # fps over frames processed THIS run (resume skips `start` frames), and
    # excluding the first frame's jit compile (t_first starts after it).
    fps = max(n_done - 1, 1) / max(elapsed, 1e-9)

    poses = sys_.trajectory()
    ate = None
    if gt is not None:
        m = min(len(poses), len(gt))
        import jax.numpy as jnp

        rmse, _ = ate_rmse(jnp.asarray(poses[:m]), jnp.asarray(gt[:m]), align_scale=True)
        ate = float(rmse)
    if verbose:
        print(
            f"[slam] frames={n} kf={int(sys_.map.kf_count)} loops={sys_.num_loops} "
            f"fps={fps:.2f} ATE_RMSE={ate}"
        )
    return RunResult(
        poses=poses,
        gt_poses=gt,
        ate_rmse=ate,
        frames_per_sec=fps,
        diagnostics={
            "per_frame": sys_.stats,
            "metrics": sys_.drain_metrics(),
            "num_keyframes": int(sys_.map.kf_count),
            "num_points": int(sys_.map.pt_count),
            "num_lines": int(sys_.map.ln_count),
            "num_loops": sys_.num_loops,
            "pt_overflow": int(sys_.map.pt_overflow),
            "ln_overflow": int(sys_.map.ln_overflow),
            "edge_overflow": int(sys_.edges.overflow),
        },
    )


def _load_stereo_dataset(cfg: SlamConfig):
    """Returns (pair_iter, cam, gt_poses, n, rectify);
    pair_iter yields (left, right); rectify is the per-camera
    RectifyParams pair for distorted unrectified datasets (EuRoC)."""
    d = cfg.data
    if d.dataset == "euroc":
        from laneslam.data.euroc import EurocStereo

        ds = EurocStereo(d.root)
        n = len(ds) if d.max_frames == 0 else min(d.max_frames, len(ds))
        gt = ds.gt_poses_at(ds.stamps0[:n])
        return (ds.read_pair(i) for i in range(n)), ds.camera, gt, n, ds.rect
    if d.dataset == "kitti":
        from laneslam.data.kitti import KittiOdometry

        ds = KittiOdometry(d.root, d.sequence)
        n = len(ds) if d.max_frames == 0 else min(d.max_frames, len(ds))
        gt = ds.gt_poses[:n] if ds.gt_poses is not None else None
        return (
            (ds.read_frame(i), ds.read_frame_right(i)) for i in range(n)
        ), ds.camera, gt, n, None
    if d.dataset in ("synthetic", "synthetic_loop"):
        from laneslam.data.synthetic import (
            make_corridor_scene,
            make_loop_scene,
            render_scene_frame,
        )

        n = d.max_frames or 30
        maker = make_loop_scene if d.dataset == "synthetic_loop" else make_corridor_scene
        scene = maker(seed=0, num_frames=n)
        b = 0.5
        cam = scene.cam._replace(baseline=b)
        return (
            (
                (render_scene_frame(scene, i), render_scene_frame(scene, i, baseline=b))
                for i in range(n)
            ),
            cam,
            scene.poses_wc,
            n,
            None,
        )
    raise ValueError(f"unknown dataset {d.dataset!r}")


def run_stereo(
    cfg: SlamConfig,
    enable_loop: bool = True,
    enable_ba: bool = True,
    verbose: bool = True,
    chunked: bool = False,
    final_global_ba: bool = False,
) -> RunResult:
    """Config 4 (BASELINE.json:10): stereo point+line SLAM, metric scale,
    joint point+line window BA exercising the mixed 3/4-dof Schur reduction.

    chunked=True drives post-bootstrap pairs through the fused stereo chunk
    program (deferred readbacks, one stereo keyframe per chunk) — the
    throughput mode, same machinery as run_slam's (VERDICT r3 #4)."""
    from laneslam.eval.ate import ate_rmse
    from laneslam.runtime.prefetch import Prefetcher
    from laneslam.system import SlamSystem

    pairs, cam, gt, n, rect = _load_stereo_dataset(cfg)
    pairs = Prefetcher(pairs, depth=2, upload=not chunked)  # P3 double buffer
    sys_ = SlamSystem(cfg, cam, enable_loop=enable_loop, enable_ba=enable_ba,
                      stereo=True, rectify=rect)
    sys_.defer_readback = chunked

    t_start = time.perf_counter()
    t_first = None
    chunks_started = False
    buf_l: list = []
    buf_r: list = []
    chunk = max(cfg.frontend.chunk_frames, 1)
    for i, (left, right) in enumerate(pairs):
        if chunked and sys_.bootstrapped:
            if not chunks_started:
                chunks_started = True
                sys_.resync()  # bootstrap read back scalars (hostsync.py)
            buf_l.append(np.asarray(left))
            buf_r.append(np.asarray(right))
            if len(buf_l) >= chunk:
                sys_.process_chunk(np.stack(buf_l), np.stack(buf_r))
                buf_l, buf_r = [], []
        else:
            sys_.process_frame(left, img_right=right)
        if t_first is None:
            t_first = time.perf_counter()
        if verbose and i % 50 == 0 and i > 0:
            msg = "(deferred)" if sys_._pending_chunks else (
                f"{sys_.stats[-1] if sys_.stats else {}}"
            )
            print(f"[stereo] frame {i}/{n} {msg}")
    if buf_l:
        sys_.process_chunk(np.stack(buf_l), np.stack(buf_r))
    sys_.flush_chunks()
    elapsed = time.perf_counter() - (t_first or t_start)
    fps = (n - 1) / max(elapsed, 1e-9)
    if final_global_ba and enable_ba:
        sys_.global_ba()

    poses = sys_.trajectory()
    ate = None
    if gt is not None:
        m = min(len(poses), len(gt))
        import jax.numpy as jnp

        # Stereo is metric: SE(3) alignment (no scale).
        rmse, _ = ate_rmse(jnp.asarray(poses[:m]), jnp.asarray(gt[:m]), align_scale=False)
        ate = float(rmse)
    if verbose:
        print(
            f"[stereo] frames={n} kf={int(sys_.map.kf_count)} loops={sys_.num_loops} "
            f"fps={fps:.2f} ATE_RMSE={ate}"
        )
    return RunResult(
        poses=poses, gt_poses=gt, ate_rmse=ate, frames_per_sec=fps,
        diagnostics={
            "per_frame": sys_.stats,
            "metrics": sys_.drain_metrics(),
            "num_keyframes": int(sys_.map.kf_count),
            "num_points": int(sys_.map.pt_count),
            "num_lines": int(sys_.map.ln_count),
            "num_loops": sys_.num_loops,
        },
    )


def run_odometry(
    cfg: SlamConfig, scale_mode: str = "auto", verbose: bool = True
) -> RunResult:
    """Config 1 (BASELINE.json:7): monocular frame-to-frame odometry.

    scale_mode: 'auto' = GT magnitudes when GT exists else unit; 'unit'; 'gt'.
    """
    from laneslam.eval.ate import ate_rmse
    from laneslam.frontend.odometry import TwoViewOdometry
    from laneslam.runtime.prefetch import Prefetcher

    frames, cam, gt, n, _rect, _paths = _load_dataset(cfg)
    # P3 double-buffered host I/O; upload=False because the chunked scan
    # path stacks each chunk and uploads it as one block.
    frames = Prefetcher(frames, depth=2, upload=False)
    vo = TwoViewOdometry(cfg, cam)
    use_gt_scale = (scale_mode == "gt") or (scale_mode == "auto" and gt is not None)
    chunk = max(1, cfg.frontend.chunk_frames)

    t_start = time.perf_counter()
    t_first = None
    n_warm = 0
    buf: list = []
    sbuf: list = []
    fed = 0

    def flush():
        nonlocal fed
        if buf:
            vo.process_chunk(np.stack(buf), list(sbuf))
            fed += len(buf)
            buf.clear()
            sbuf.clear()

    for i, img in enumerate(frames):
        gt_scale = None
        if use_gt_scale and gt is not None and 0 < i < len(gt):
            gt_scale = float(
                np.linalg.norm(gt[i][:3, 3] - gt[i - 1][:3, 3])
            )
        buf.append(np.asarray(img))
        sbuf.append(gt_scale)
        # First flush feeds chunk+1 frames (frame 0 bootstraps the
        # reference features), later flushes feed exactly one chunk.
        if len(buf) >= (chunk + 1 if fed == 0 else chunk):
            flush()
            if t_first is None:
                # Exclude the compile of the first chunk from throughput.
                t_first = time.perf_counter()
                n_warm = fed
        if verbose and i % 50 == 0 and i > 0:
            print(f"[odometry] frame {i}/{n}")
    flush()
    elapsed = time.perf_counter() - (t_first or t_start)
    fps = max(n - max(n_warm, 1), 1) / max(elapsed, 1e-9)

    poses = vo.trajectory()
    ate = None
    if gt is not None:
        m = min(len(poses), len(gt))
        import jax.numpy as jnp

        rmse, _ = ate_rmse(
            jnp.asarray(poses[:m]), jnp.asarray(gt[:m]), align_scale=True
        )
        ate = float(rmse)
    if verbose:
        print(f"[odometry] frames={n} fps={fps:.2f} ATE_RMSE={ate}")
    return RunResult(
        poses=poses,
        gt_poses=gt,
        ate_rmse=ate,
        frames_per_sec=fps,
        diagnostics={"per_frame": vo.diags},
    )
