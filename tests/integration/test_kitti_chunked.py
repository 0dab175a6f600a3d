"""Chunked KITTI feed end-to-end (VERDICT r3 #9): the file-backed chunked
path must route through ChunkPrefetcher — native C++ batch PNG decode into
contiguous blocks, one device upload per chunk — and produce a sane
trajectory through the fused chunk program.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.api import run_slam
from laneslam.config import DataConfig, SlamConfig


@pytest.mark.slow
def test_mini_kitti_chunked_uses_batch_decode(tmp_path, monkeypatch):
    from fixtures.mini_kitti import write_mini_kitti

    n = 28
    write_mini_kitti(str(tmp_path), num_frames=n)

    # Spy on the batch decoder: ChunkPrefetcher resolves it from the module
    # at construction time, so patching the module attribute intercepts it.
    from laneslam.runtime import imageio

    calls = []
    orig = imageio.decode_batch_gray

    def spy(paths, out=None, threads=0):
        calls.append(len(paths))
        return orig(paths, out=out, threads=threads)

    monkeypatch.setattr(imageio, "decode_batch_gray", spy)

    cfg = SlamConfig(
        data=DataConfig(dataset="kitti", root=str(tmp_path), sequence="00",
                        max_frames=n)
    )
    res = run_slam(cfg, enable_loop=False, enable_ba=True, verbose=False,
                   chunked=True)
    assert len(calls) >= 2, f"batch decoder not used: {calls}"
    assert all(c <= cfg.frontend.chunk_frames for c in calls)
    assert len(res.poses) == n
    assert np.all(np.isfinite(res.poses))
    assert res.ate_rmse is not None and res.ate_rmse < 0.8
