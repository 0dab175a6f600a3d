"""Frozen, hashable config dataclasses (SURVEY.md §5.6).

Configs are static jit arguments: changing one recompiles (explicitly).
Every judged config (BASELINE.json:7-11) is a named preset in configs/.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class LsdConfig:
    """LSD-style line segment detector (SURVEY.md C1)."""

    blur_sigma: float = 0.6  # pre-gradient Gaussian (anti-staircase, LSD §2)
    grad_threshold: float = 3.0  # gradient magnitude bound (post-blur)
    angle_tol_deg: float = 22.5  # region-growing angle tolerance tau
    max_segments: int = 256  # fixed capacity of output slots
    min_region_px: int = 15  # discard smaller regions
    min_length_px: float = 12.0
    min_density: float = 0.5  # aligned-point density gate (rectangle fill)
    prop_iters: int = 10  # label-propagation outer iterations
    local_sweeps: int = 4  # local stencil sweeps per outer iteration
    downscale: int = 1  # optional pre-downscale factor
    log_nfa_threshold: float = 0.0  # accept if log10(NFA) < threshold


@dataclass(frozen=True)
class LbdConfig:
    """LBD line-band descriptor (SURVEY.md C2; Zhang & Koch 2013)."""

    num_bands: int = 9  # m
    band_width: int = 7  # w rows per band
    num_samples: int = 48  # samples along the line per row
    desc_dim: int = 72  # 8 * num_bands


@dataclass(frozen=True)
class PointConfig:
    """Point feature pipeline (SURVEY.md C3): Shi-Tomasi + BRIEF-sign."""

    max_points: int = 512
    nms_radius: int = 5
    min_score: float = 1e-4
    desc_dim: int = 256
    patch_radius: int = 12  # BRIEF sampling radius
    smoothing_sigma: float = 2.0
    seed: int = 7  # BRIEF pattern seed (fixed -> descriptors comparable)


@dataclass(frozen=True)
class MatchConfig:
    """GEMM matcher with geometric gating (SURVEY.md C4, BASELINE.json:5)."""

    ratio: float = 0.85  # Lowe ratio test on descriptor distance
    max_line_angle_deg: float = 15.0  # segment orientation gate
    max_length_ratio: float = 2.0  # segment length ratio gate
    max_point_dist_px: float = 100.0  # spatial gate for points (odometry prior)
    max_line_dist_px: float = 100.0  # midpoint distance gate for lines
    bootstrap_dist_px: float = 250.0  # loose gate when no motion prior exists
    cross_check: bool = True  # mutual nearest neighbors


@dataclass(frozen=True)
class BaConfig:
    """Sliding-window point+line bundle adjustment (SURVEY.md C9)."""

    window_size: int = 8  # keyframes per window
    # Window selection: False = last-W keyframes; True = newest + its most
    # covisible keyframes (SURVEY C12 — revisits pull old keyframes in).
    covis_window: bool = False
    gn_iters: int = 10
    huber_px: float = 2.0
    damping: float = 1e-4
    outlier_px: float = 0.0  # >0: re-gate observations mid-solve (2-stage LM)
    max_obs_per_kf: int = 512  # point observation capacity per keyframe
    max_line_obs_per_kf: int = 128


@dataclass(frozen=True)
class PgoConfig:
    gn_iters: int = 20
    huber: float = 0.5
    damping: float = 1e-6
    # Per-node trust region: each GN step's tangent update is norm-clipped
    # to this (backend/pgo.py _clamp_step). Guards against CG blowups on
    # near-singular graphs (the round-5 production Sim(3) explosion emitted
    # deltas > 1e6); 4.0 leaves legitimate large corrections untouched —
    # measured on the scale-drift fixture, cap 1.0 truncated the solution
    # path (stalled at 0.83 m vs GT) while cap >= 2.0 recovers GT (0.02 m).
    step_cap: float = 4.0
    # Mono production loop-closure solver: True = Sim(3) (_run_pgo_sim3,
    # distributes scale drift along the chain); False = SE(3) PGO + uniform
    # span renormalization (the round-4 behavior, kept as an ablation /
    # fallback switch). Stereo always uses SE(3).
    mono_sim3: bool = True


@dataclass(frozen=True)
class MapConfig:
    """Fixed-capacity device-resident map (SURVEY.md C14)."""

    max_keyframes: int = 512
    max_points: int = 16384
    max_lines: int = 4096
    max_obs_per_kf: int = 512
    max_line_obs_per_kf: int = 128
    # Landmark culling (C14 "cull"; slots return to the arena for reuse):
    # drop landmarks observed by < cull_min_obs keyframes once their anchor
    # is >= cull_min_age_kf keyframes old; run every cull_interval keyframes
    # (0 disables culling).
    cull_min_obs: int = 2
    cull_min_age_kf: int = 3
    cull_interval: int = 4
    # Under-observed culling only activates above this live/capacity
    # fraction; below it only orphans (zero observation refs) are culled.
    cull_pressure: float = 0.8


@dataclass(frozen=True)
class FrontendConfig:
    kf_min_tracked_ratio: float = 0.5  # new KF when tracked fraction drops below
    kf_min_inliers: int = 25
    kf_max_interval: int = 10  # force a KF every N frames
    pnp_hypotheses: int = 256
    essential_hypotheses: int = 256
    inlier_px: float = 2.0
    track_inlier_px: float = 4.0  # PnP gate during tracking (noisier landmarks)
    min_track_inliers: int = 8  # below this the frame falls back to motion model
    min_parallax_deg: float = 1.0  # triangulation baseline gate
    # Frames per device dispatch in the VO scan path: one lax.scan program
    # processes this many frames per launch, amortizing host dispatch (the
    # tunneled chip pays ~90 us per dispatch vs ~12 us device compute per
    # frame). 1 = legacy per-frame dispatch.
    chunk_frames: int = 8
    # Adaptive keyframe cadence in the fused chunk path (SURVEY C18): the
    # chunk's keyframe+backend block runs under a chunk-level lax.cond
    # gated on the span's per-frame keyframe-decision signals, so cadence
    # becomes <= 1 KF per chunk (decided by tracked-ratio / interval rules)
    # instead of exactly 1. False = round-4 fixed cadence: one keyframe
    # every chunk unconditionally.
    chunk_adaptive_kf: bool = False
    # Track against the local window's landmarks (last-2 keyframes' obs
    # rows, ~2*Op candidates) instead of every map landmark. 16x less
    # match/gate work; loses the implicit full-map re-localization that
    # explicit loop closure provides anyway. The fused chunk path
    # (configs 2/3 throughput mode) enables this.
    track_local_landmarks: bool = False
    # Tracking-loss recovery (relocalization, SURVEY C18). Once the
    # consecutive-fallback count reaches `reloc_after`, the chunk path
    # runs a cond-gated relocalization stage: KF-database retrieval of the
    # most similar keyframe (one IDF GEMV), ungated guided matching against
    # its observations, PnP — and on >= `reloc_min_inliers` support snaps
    # the tracker to the solved pose. Measured round 5: without this, a
    # transient tracking loss (low-texture span) left the system
    # integrating the motion model forever, and the garbage-scale landmarks
    # born along the way compounded |t| exponentially until overflow.
    # 0 disables.
    reloc_after: int = 8
    reloc_min_inliers: int = 25


@dataclass(frozen=True)
class LoopConfig:
    """Loop closure (SURVEY.md C11-C13)."""

    top_k: int = 5
    vocab_size: int = 1024  # random visual-word codebook size (C11)
    min_kf_gap: int = 3  # plus covisibility exclusion (see kfdb.query_kfdb)
    covis_exclusion: int = 30  # exclude candidates sharing >= this many landmarks
    # IDF-weighted cosine threshold: the retrieval stage only ranks coarsely
    # (geometric verification discriminates); the threshold's job is skipping
    # verification in the obvious no-loop case. IDF sims live in ~[0, 0.3].
    use_idf: bool = True
    min_similarity: float = 0.08
    # Accept bound on guided-rematch pixel-refined support. True loops on the
    # synthetic fixture give 46-78; the one observed false positive (planar
    # wall-slide consensus) scraped 12 — 20 splits the margin.
    min_inliers: int = 20
    ransac_hypotheses: int = 256
    # Monocular loops carry scale drift: verification fits Sim(3) and the
    # accepted scale must stay inside these bounds (stereo fits SE(3)).
    min_scale: float = 0.5
    max_scale: float = 2.0
    # Drift-consistency gate (round 4): the correction a loop edge implies
    # (edge vs current pose estimate) must be commensurate with the drift
    # accumulable over the traversed arc — marginal wall-slide false
    # consensus implies corrections far beyond any plausible drift rate
    # (measured: true closures correct ~4% of arc; the gate passes anything
    # under max(frac * arc, floor)).
    max_correction_frac: float = 0.3
    max_correction_m: float = 1.0
    max_correction_deg: float = 35.0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes (SURVEY.md §2.2-§2.3)."""

    frame_axis: int = 1  # data/trajectory parallel size
    block_axis: int = 1  # landmark-block (tensor) parallel size


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"  # synthetic | kitti | euroc
    root: str = ""
    sequence: str = "00"
    max_frames: int = 0  # 0 = all
    stereo: bool = False


@dataclass(frozen=True)
class SlamConfig:
    lsd: LsdConfig = field(default_factory=LsdConfig)
    lbd: LbdConfig = field(default_factory=LbdConfig)
    points: PointConfig = field(default_factory=PointConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    ba: BaConfig = field(default_factory=BaConfig)
    pgo: PgoConfig = field(default_factory=PgoConfig)
    map: MapConfig = field(default_factory=MapConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    image_height: int = 480
    image_width: int = 640
    use_pallas: bool = True  # Pallas kernels on TPU, pure-XLA fallback on CPU

    def override(self, **kwargs) -> "SlamConfig":
        return replace(self, **kwargs)
