"""Long-sequence capacity rehearsal (SURVEY §7.3.8, VERDICT r2 #5).

Full KITTI 00 is ~4,541 frames / ~450 keyframes; this rehearsal runs a long
synthetic corridor through the full SLAM loop with REDUCED map capacities so
the arena hits the same pressure regimes (culling activation, slot reuse,
covis matrix growth) a full sequence hits at production capacities — in a
CI-sized run. The capacity sizing table lives in configs/CAPACITY.md.
"""

import dataclasses

import numpy as np
import pytest

import laneslam.api as api_mod
from laneslam.api import run_slam
from laneslam.config import DataConfig, MapConfig, SlamConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame


@pytest.mark.slow
def test_long_sequence_capacity_pressure(monkeypatch):
    n = 250
    scene = make_corridor_scene(seed=2, num_frames=n, num_points=1800, num_lines=400)

    def load(cfg, skip=0):
        return (
            (render_scene_frame(scene, i) for i in range(skip, n)),
            scene.cam, scene.poses_wc, n, None, None,
        )

    monkeypatch.setattr(api_mod, "_load_dataset", load)

    # Capacities sized so ~40 keyframes x ~150 new landmarks each EXCEEDS
    # the point capacity without culling: the arena must recycle slots.
    cfg = SlamConfig(
        data=DataConfig(dataset="synthetic", max_frames=n),
        map=MapConfig(
            max_keyframes=48, max_points=3072, max_lines=768,
            cull_interval=4, cull_pressure=0.7,
        ),
    )
    res = run_slam(cfg, enable_loop=True, enable_ba=True, verbose=False)
    d = res.diagnostics

    # 1. No silent landmark drops: culling + arena reuse must keep overflow 0.
    assert d["pt_overflow"] == 0, f"overflow {d['pt_overflow']}"
    # 1b. No silent pose-graph edge drops either (SURVEY §7.3.2): the edge
    #     table is sized 4x keyframe capacity, so a healthy run never fills it.
    assert d["edge_overflow"] == 0, f"edge overflow {d['edge_overflow']}"
    # 2. Culling keeps the live count under the pressure ceiling (+ one
    #    keyframe's worth of head-room between cull passes).
    assert d["num_points"] < 0.7 * 3072 + 600, d["num_points"]
    # 3. The trajectory stays sane over the whole run.
    assert res.ate_rmse is not None and np.isfinite(res.ate_rmse)
    assert np.all(np.isfinite(res.poses))
    assert d["num_keyframes"] <= 48
    # 4. Memory is flat by construction (fixed-capacity pytrees): the map
    #    arrays at the end are the same objects/shapes as allocated.
    assert len(res.poses) == n
