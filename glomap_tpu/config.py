"""Configuration system mirroring the reference's OptionManager flag surface.

Counterpart of glomap/controllers/option_manager.{h,cc} (boost
program_options with module-namespaced dotted flags) — re-expressed as
nested dataclasses; the CLI (glomap_tpu/cli.py) maps the identical dotted
flag names (e.g. `--GlobalPositioning.thres_loss_function`) onto these
fields. All defaults copied from the reference option structs:
  GlobalMapperOptions        glomap/controllers/global_mapper.h:15-41
  InlierThresholdOptions     glomap/types.h:18-34
  RotationEstimatorOptions   glomap/estimators/global_rotation_averaging.h
  GlobalPositionerOptions    glomap/estimators/global_positioning.h
  BundleAdjusterOptions      glomap/estimators/bundle_adjustment.h
  ViewGraphCalibratorOptions glomap/estimators/view_graph_calibration.h
  TrackEstablishmentOptions  glomap/controllers/track_establishment.h
  TriangulatorOptions        glomap/controllers/track_retriangulation.h
  RelativePoseEstimationOptions glomap/estimators/relpose_estimation.h
  GravityRefinerOptions      glomap/estimators/gravity_refinement.h
  OptimizationBaseOptions    glomap/estimators/optimization_base.h
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class InlierThresholds:
    max_angle_error: float = 1.0            # deg, global positioning filter
    max_reprojection_error: float = 1e-2    # normalized, BA filter
    min_triangulation_angle: float = 1.0    # deg
    max_epipolar_error_E: float = 1.0       # px
    max_epipolar_error_F: float = 4.0       # px
    max_epipolar_error_H: float = 4.0       # px
    min_inlier_num: int = 30
    min_inlier_ratio: float = 0.25
    max_rotation_error: float = 10.0        # deg


@dataclass
class OptimizationBase:
    """Shared solver knobs (reference OptimizationBaseOptions)."""
    thres_loss_function: float = 1e-1
    max_num_iterations: int = 100
    function_tolerance: float = 1e-5


@dataclass
class ViewGraphCalibratorOptions(OptimizationBase):
    thres_lower_ratio: float = 0.1
    thres_higher_ratio: float = 10.0
    thres_two_view_error: float = 2.0
    thres_loss_function: float = 1e-2  # Cauchy loss scale


@dataclass
class RelPoseEstimationOptions:
    # PoseLib-equivalent adaptive RANSAC budget (relpose_estimation.h:14
    # sets ransac_options.max_iterations = 50000): hypotheses are spent
    # in fixed-size batched chunks over the ACTIVE pairs only; a pair
    # leaves the active set once its spent budget passes the standard
    # stopping number log(1-conf)/log(1-r^8) for its best inlier ratio r
    # (clamped to [num_hypotheses, max_iterations]).
    max_iterations: int = 50000      # adaptive cap (PoseLib parity)
    max_epipolar_error: float = 1.0  # px (PoseLib default for E)
    num_hypotheses: int = 1024       # per-pair minimum (PoseLib
    #                                  min_iterations=1000 analog)
    refine_num_lm_iters: int = 10
    # hypothesis scoring/refinement uses at most this many matches per
    # pair (the FULL match set is classified afterwards by the Sampson
    # inlier pass); bounds RANSAC work at H x P x cap
    score_match_cap: int = 512


@dataclass
class RotationEstimatorOptions:
    max_num_l1_iterations: int = 5
    l1_step_convergence_threshold: float = 0.001
    max_num_irls_iterations: int = 100
    irls_step_convergence_threshold: float = 0.001
    axis: tuple = (0.0, 1.0, 0.0)
    irls_loss_parameter_sigma: float = 5.0  # deg
    weight_type: str = "GEMAN_MCCLURE"      # or "HALF_NORM"
    skip_initialization: bool = False
    use_weight: bool = False
    use_gravity: bool = False


@dataclass
class TrackEstablishmentOptions:
    thres_inconsistency: float = 10.0
    min_num_tracks_per_view: int = -1
    min_num_view_per_track: int = 3
    max_num_view_per_track: int = 100
    max_num_tracks: int = 10_000_000


@dataclass
class GlobalPositionerOptions(OptimizationBase):
    constraint_type: str = "ONLY_POINTS"  # ONLY_CAMERAS, POINTS_AND_CAMERAS[_BALANCED]
    constraint_reweight_scale: float = 1.0
    generate_random_positions: bool = True
    generate_random_points: bool = True
    generate_scales: bool = True
    optimize_positions: bool = True
    optimize_points: bool = True
    optimize_scales: bool = True
    min_num_view_per_track: int = 3
    seed: int = 1
    thres_loss_function: float = 1e-1  # Huber
    # forcing tolerance of the inner Jacobi-PCG on the frame system
    # (same role as BundleAdjusterOptions.cg_relative_tolerance)
    cg_relative_tolerance: float = 1e-2
    # inner-PCG iteration cap per LM step (see
    # BundleAdjusterOptions.cg_max_iterations). 30 measured equal final
    # cost to cap 100/300 at 10k frames / 1M obs while cutting the LM
    # iteration wall ~1.7x (BENCH_NOTES round 5; the 1e-2 forcing
    # tolerance governs solve quality, the cap only guards stragglers).
    cg_max_iterations: int = 30


@dataclass
class BundleAdjusterOptions(OptimizationBase):
    optimize_rig_poses: bool = False
    optimize_rotations: bool = True
    optimize_translation: bool = True
    optimize_intrinsics: bool = True
    optimize_principal_point: bool = False
    optimize_points: bool = True
    min_num_view_per_track: int = 3
    thres_loss_function: float = 1.0  # Huber, px
    max_num_iterations: int = 200
    # inexact-Newton forcing tolerance of the inner CG on the reduced
    # camera system (Ceres Solver::Options::eta; its ITERATIVE_SCHUR
    # default is 1e-1 — we default tighter). Final cost on the bench
    # problem is bit-identical to a 1e-5 run (BENCH_NOTES).
    cg_relative_tolerance: float = 1e-2
    # cap on inner-CG iterations per LM step (Ceres
    # max_linear_solver_iterations, default 500; ours defaults lower
    # because the SCHUR_JACOBI-preconditioned system converges to the
    # 1e-2 forcing tolerance in <<30 iterations at the measured scales —
    # BA logs total/average CG iterations per solve so a capped solve is
    # visible). Raise for very large / ill-conditioned camera systems.
    cg_max_iterations: int = 30


@dataclass
class TriangulatorOptions:
    tri_complete_max_reproj_error: float = 15.0
    tri_merge_max_reproj_error: float = 15.0
    tri_min_angle: float = 1.0
    min_num_matches: int = 15
    # colmap IncrementalTriangulator::Options::create_max_angle_error,
    # the angular support threshold of the RANSAC triangulation the
    # reference runs inside TriangulateImage
    tri_create_max_angle_error: float = 2.0
    tri_ransac_hypotheses: int = 16
    # generations of split-and-retrack for keypoints left unexplained by
    # the previous generation's accepted points (outlier matches fuse
    # unrelated points into one union-find component; see
    # controllers/retriangulation.retriangulate_tracks)
    tri_num_generations: int = 3


@dataclass
class GravityRefinerOptions(OptimizationBase):
    max_outlier_ratio: float = 0.5
    max_gravity_error: float = 1.0  # deg
    min_num_neighbors: int = 7


@dataclass
class GlobalMapperOptions:
    opt_vgcalib: ViewGraphCalibratorOptions = field(
        default_factory=ViewGraphCalibratorOptions)
    opt_relpose: RelPoseEstimationOptions = field(
        default_factory=RelPoseEstimationOptions)
    opt_ra: RotationEstimatorOptions = field(
        default_factory=RotationEstimatorOptions)
    opt_track: TrackEstablishmentOptions = field(
        default_factory=TrackEstablishmentOptions)
    opt_gp: GlobalPositionerOptions = field(
        default_factory=GlobalPositionerOptions)
    opt_ba: BundleAdjusterOptions = field(default_factory=BundleAdjusterOptions)
    opt_triangulator: TriangulatorOptions = field(
        default_factory=TriangulatorOptions)
    opt_gravity_refiner: GravityRefinerOptions = field(
        default_factory=GravityRefinerOptions)
    inlier_thresholds: InlierThresholds = field(default_factory=InlierThresholds)

    num_iteration_bundle_adjustment: int = 3
    num_iteration_retriangulation: int = 1

    # Subsample edges of over-connected nodes to this expected degree
    # during preprocessing (ViewGraphManipulater::SparsifyGraph,
    # view_graph_manipulation.cc:10-68 — present but never called by the
    # upstream pipeline either; disabled by default, set > 0 to enable).
    sparsify_expected_degree: int = -1

    skip_preprocessing: bool = False
    skip_view_graph_calibration: bool = False
    skip_relative_pose_estimation: bool = False
    skip_rotation_averaging: bool = False
    skip_track_establishment: bool = False
    skip_global_positioning: bool = False
    skip_bundle_adjustment: bool = False
    skip_retriangulation: bool = False
    skip_pruning: bool = True

    # TPU execution knobs (new; no reference counterpart)
    solver_dtype: str = "float64"   # float64 on CPU tests, float32 on TPU
    device_mesh_shape: Optional[tuple] = None  # e.g. (8,) for 8-chip DP/SP
    # Stage-boundary npz checkpoints (SURVEY.md §5 checkpoint/resume):
    # when set, GlobalMapper writes <dir>/stage_NN.npz after every
    # completed stage and auto-resumes from the latest one on the next
    # run (exact mid-pipeline state — finer than the reference's
    # mapper_resume, which restarts from a written COLMAP model)
    checkpoint_dir: str = ""


def mapper_resume_options() -> GlobalMapperOptions:
    """Preset used by `mapper_resume` (reference option_manager.cc:103-127):
    skip everything before global positioning, and retriangulation."""
    opt = GlobalMapperOptions()
    opt.skip_preprocessing = True
    opt.skip_view_graph_calibration = True
    opt.skip_relative_pose_estimation = True
    opt.skip_rotation_averaging = True
    opt.skip_track_establishment = True
    opt.skip_retriangulation = True
    return opt


def _iter_flat(obj, prefix=""):
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            yield from _iter_flat(v, prefix + f.name + ".")
        else:
            yield prefix + f.name, v


def flatten_options(opt) -> dict:
    """Dotted-name view of a nested options dataclass (for CLI/--help)."""
    return dict(_iter_flat(opt))


def set_option(opt, dotted_name: str, value: str):
    """Set a field by dotted name with string parsing (CLI flag handler)."""
    parts = dotted_name.split(".")
    target = opt
    for p in parts[:-1]:
        target = getattr(target, p)
    name = parts[-1]
    cur = getattr(target, name)
    if isinstance(cur, bool):
        parsed = value.lower() in ("1", "true", "yes", "on")
    elif isinstance(cur, int):
        parsed = int(value)
    elif isinstance(cur, float):
        parsed = float(value)
    elif isinstance(cur, tuple):
        parsed = tuple(float(x) for x in value.split(","))
    else:
        parsed = value
    setattr(target, name, parsed)
