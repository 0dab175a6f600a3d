#!/usr/bin/env python
"""Per-phase wall-clock breakdown of the fused _slam_chunk program
(VERDICT r3 weak #1: 'no profile of the chunk program exists').

Times, on the attached accelerator with a warmed-up representative state:
  - _extract_chunk (feature extraction dispatch)
  - _slam_chunk with (ba, loop) in {(0,0), (1,0), (1,1)}  -> phase deltas
  - standalone _window_ba, _run_pgo, query+verify_loops, _make_keyframe

Run: python scripts/profile_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=10):
    fn()  # warm/compile
    jax.effects_barrier()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
    from laneslam.geometry.camera import Camera
    from laneslam.system import (
        SlamSystem, SlamCarry, _slam_chunk, _extract_chunk, _window_ba,
        _run_pgo, _make_keyframe, _SPAN_INIT,
    )
    from laneslam.loop.kfdb import query_kfdb
    from laneslam.loop.verify import verify_loops

    cfg = SlamConfig()
    n = 96
    scene = make_corridor_scene(seed=1, num_frames=n)
    cam = Camera(
        fx=float(scene.cam.fx), fy=float(scene.cam.fy),
        cx=float(scene.cam.cx), cy=float(scene.cam.cy),
        width=scene.cam.width, height=scene.cam.height,
    )
    frames = [np.asarray(render_scene_frame(scene, i)) for i in range(n)]
    sys_ = SlamSystem(cfg, cam, enable_loop=True, enable_ba=True)
    sys_.defer_readback = True
    i = 0
    while not sys_.bootstrapped or i < 4:
        sys_.process_frame(frames[i])
        i += 1
    sys_.resync()
    chunk = cfg.frontend.chunk_frames
    while i + chunk <= n:
        sys_.process_chunk(np.stack(frames[i:i + chunk]))
        i += chunk
    sys_.flush_chunks()
    print(f"state: {int(sys_.map.kf_count)} KFs, {int(sys_.map.pt_count)} pts, "
          f"{int(sys_.map.ln_count)} lines, edges={int(sys_.edges.count)}")
    # The prints above read back scalars — restore pipelined dispatch so the
    # timings below measure CLEAN (production) mode, not post-readback mode
    # (runtime/hostsync.py documents the two).
    sys_.resync()

    imgs = jnp.asarray(np.stack(frames[-chunk:]), jnp.float32)

    def make_carry():
        return SlamCarry(
            m=sys_.map, es=sys_.edges, kf_feats=sys_.kf_feats,
            T_cur=jnp.asarray(sys_.T_cur), last_rel=jnp.asarray(sys_._last_rel),
            kf_id=jnp.asarray(sys_.kf_id, jnp.int32),
            frames_since_kf=jnp.asarray(0, jnp.int32),
            span_min_inl=jnp.asarray(_SPAN_INIT, jnp.int32),
            span_fallbacks=jnp.asarray(0, jnp.int32),
            unhealthy_chunks=jnp.asarray(0, jnp.int32),
            num_loops=jnp.asarray(sys_.num_loops, jnp.int32),
            ring=sys_.metrics_ring, key=sys_.key,
        )

    feats_chunk = _extract_chunk(imgs, cfg)
    jax.block_until_ready(feats_chunk.point_desc)
    carry = make_carry()

    t_extract = timeit(lambda: _extract_chunk(imgs, cfg))
    print(f"extract_chunk ({chunk}f):      {t_extract*1e3:8.2f} ms")

    variants = {}
    for ba, loop in [(False, False), (True, False), (True, True)]:
        t = timeit(
            lambda ba=ba, loop=loop: _slam_chunk(
                carry, feats_chunk, sys_._vocab, cfg, cam, ba, loop
            )[1],
            n=5,
        )
        variants[(ba, loop)] = t
        print(f"slam_chunk ba={int(ba)} loop={int(loop)}:   {t*1e3:8.2f} ms")
    print(f"  -> track+kf base:     {variants[(False, False)]*1e3:8.2f} ms")
    print(f"  -> BA delta:          {(variants[(True, False)] - variants[(False, False)])*1e3:8.2f} ms")
    print(f"  -> loop+PGO delta:    {(variants[(True, True)] - variants[(True, False)])*1e3:8.2f} ms")

    # Standalone sub-programs on the same state.
    m = sys_.map
    t_ba = timeit(lambda: _window_ba(m, cfg, cam)[1], n=5)
    print(f"window_ba standalone:   {t_ba*1e3:8.2f} ms  ({cfg.ba.gn_iters} LM iters)")
    t_pgo = timeit(lambda: _run_pgo(m, sys_.edges, cfg)[1], n=5)
    print(f"run_pgo standalone:     {t_pgo*1e3:8.2f} ms  ({cfg.pgo.gn_iters} GN x 60 CG)")

    kf_id = jnp.asarray(sys_.kf_id, jnp.int32)
    key = jax.random.PRNGKey(3)

    def retr():
        return query_kfdb(
            m.kf_agg_desc, m.kf_valid, m.kf_agg_desc[kf_id], kf_id, cfg.loop,
            covis_row=m.covis[kf_id],
        )
    t_q = timeit(lambda: retr()[1])
    print(f"query_kfdb:             {t_q*1e3:8.2f} ms")
    cand_ids, _ = retr()

    t_v = timeit(
        lambda: verify_loops(m, kf_id, cand_ids, key, cfg.loop,
                             with_scale=True, cam=cam).num_inliers, n=5)
    print(f"verify_loops (k={cand_ids.shape[0]}):    {t_v*1e3:8.2f} ms")

    lm0 = jnp.full((cfg.points.max_points,), -1, jnp.int32)
    inl0 = jnp.zeros((cfg.points.max_points,), bool)
    f_last = jax.tree.map(lambda a: a[-1], feats_chunk)
    t_kf = timeit(
        lambda: _make_keyframe(
            m, kf_id, sys_.kf_feats, f_last, lm0, inl0,
            jnp.asarray(sys_.T_cur), sys_._vocab, cfg, cam,
        )[3], n=5)
    print(f"make_keyframe:          {t_kf*1e3:8.2f} ms")

    total = variants[(True, True)] + t_extract
    print(f"\nchunk total ({chunk} frames): {total*1e3:.2f} ms -> "
          f"{chunk/total:.1f} fps")


if __name__ == "__main__":
    main()
