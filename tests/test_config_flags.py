"""Flag-surface parity tests (fast): the CLI accepts the reference
OptionManager's exact flag spellings (option_manager.cc:23-24,65-68 and
the AddAndRegister*Option dotted registry) and dumps the registry in
--help."""

import logging

import pytest

from glomap_tpu.cli import (_apply_dotted_flags, _registry_epilog,
                            _resolve_flag_name)
from glomap_tpu.config import GlobalMapperOptions, mapper_resume_options


def test_reference_top_level_flags():
    """ba_iteration_num / retriangulation_iteration_num
    (option_manager.cc:65-68) map onto the mapper options."""
    opt = _apply_dotted_flags(GlobalMapperOptions(), [
        "--ba_iteration_num=5",
        "--retriangulation_iteration_num", "2",
        "--skip_pruning=0",
        "--skip_view_graph_calibration=1",
    ])
    assert opt.num_iteration_bundle_adjustment == 5
    assert opt.num_iteration_retriangulation == 2
    assert opt.skip_pruning is False
    assert opt.skip_view_graph_calibration is True


def test_reference_log_flags_accepted():
    """log_to_stderr / log_level (glog flags, option_manager.cc:23-24)
    are consumed, not rejected."""
    prev = logging.getLogger().level
    try:
        opt = _apply_dotted_flags(GlobalMapperOptions(), [
            "--log_to_stderr=1", "--log_level=1"])
        assert logging.getLogger().level == logging.DEBUG
        _apply_dotted_flags(opt, ["--log_level=0"])
        assert logging.getLogger().level == logging.INFO
    finally:
        logging.getLogger().setLevel(prev)


def test_reference_exact_mapper_command_line():
    """A command line copied from the reference docs parses verbatim."""
    opt = _apply_dotted_flags(GlobalMapperOptions(), [
        "--TrackEstablishment.max_num_tracks=50000",
        "--GlobalPositioning.thres_loss_function=0.5",
        "--BundleAdjustment.optimize_principal_point=1",
        "--Thresholds.max_epipolar_error_E=2.0",
        "--Triangulation.complete_max_reproj_error=10",
        "--GlobalPositioning.use_gpu=1",   # TPU build: consumed no-op
        "--ba_iteration_num=1",
    ])
    assert opt.opt_track.max_num_tracks == 50000
    assert opt.opt_gp.thres_loss_function == 0.5
    assert opt.opt_ba.optimize_principal_point is True
    assert opt.inlier_thresholds.max_epipolar_error_E == 2.0
    assert opt.opt_triangulator.tri_complete_max_reproj_error == 10
    assert opt.num_iteration_bundle_adjustment == 1


def test_unknown_flag_still_rejected():
    with pytest.raises(SystemExit):
        _apply_dotted_flags(GlobalMapperOptions(), ["--ba_iterationz=1"])
    with pytest.raises(SystemExit):
        _apply_dotted_flags(GlobalMapperOptions(),
                            ["--BundleAdjustment.bogus=1"])


def test_resolve_flag_name():
    assert _resolve_flag_name("ba_iteration_num") == \
        "num_iteration_bundle_adjustment"
    assert _resolve_flag_name("Triangulation.min_angle") == \
        "opt_triangulator.tri_min_angle"
    assert _resolve_flag_name("BundleAdjustment.use_gpu") is None
    assert _resolve_flag_name("skip_pruning") == "skip_pruning"


def test_help_epilog_dumps_registry():
    """--help prints every dotted flag with its default
    (option_manager.cc:322-327 prints the program_options description)."""
    text = _registry_epilog(GlobalMapperOptions())
    for needle in (
            "--ba_iteration_num (default: 3)",
            "--retriangulation_iteration_num (default: 1)",
            "--log_to_stderr",
            "--log_level",
            "--BundleAdjustment.optimize_principal_point (default: false)",
            "--Thresholds.max_epipolar_error_E (default: 1.0)",
            "--Triangulation.min_angle (default: 1.0)",
            "--TrackEstablishment.max_num_tracks (default: 10000000)",
            "--skip_pruning (default: true)"):
        assert needle in text, needle
    # resume preset shows its flipped defaults
    text2 = _registry_epilog(mapper_resume_options())
    assert "--skip_retriangulation (default: true)" in text2
