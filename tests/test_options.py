"""Options framework tests (analog of the reference's options module
behavior: TOML round-trip, unused-key detection, CLI override)."""

import pytest

from rootba_tpu.config.options import (
    BalAppOptions,
    RobustNorm,
    SolverOptions,
    SolverType,
    dump_toml,
    to_dict,
    update_from_dict,
)


def test_defaults_match_reference():
    o = SolverOptions()
    assert o.solver_type == SolverType.SQUARE_ROOT
    assert o.max_num_iterations == 20
    assert o.initial_trust_region_radius == 1e4
    assert o.min_trust_region_radius == 1e-32
    assert o.max_trust_region_radius == 1e16
    assert o.eta == 0.1
    assert o.max_linear_solver_iterations == 500
    assert o.function_tolerance == 1e-6
    assert o.initial_vee == 2.0 and o.vee_factor == 2.0
    assert o.power_order == 10
    assert o.use_double is True
    assert o.residual.robust_norm == RobustNorm.NONE
    assert o.residual.huber_parameter == 1.0
    assert not o.use_projection_validity_check()


def test_toml_roundtrip(tmp_path):
    import tomllib

    o = BalAppOptions()
    o.solver.max_num_iterations = 7
    o.solver.solver_type = SolverType.SCHUR_COMPLEMENT
    o.dataset.input = "foo.txt"
    o.solver.residual.robust_norm = RobustNorm.HUBER
    text = dump_toml(o)
    parsed = tomllib.loads(text)
    o2 = BalAppOptions()
    update_from_dict(o2, parsed)
    assert o2.solver.max_num_iterations == 7
    assert o2.solver.solver_type == SolverType.SCHUR_COMPLEMENT
    assert o2.dataset.input == "foo.txt"
    assert o2.solver.residual.robust_norm == RobustNorm.HUBER
    assert to_dict(o2) == to_dict(o)


def test_unused_key_detection():
    o = BalAppOptions()
    unknown = []
    update_from_dict(o, {"solver": {"nonexistent_option": 1},
                         "bogus_table": {"x": 2}}, unknown=unknown)
    assert "solver.nonexistent_option" in unknown
    assert "bogus_table" in unknown


def test_enum_parse_case_insensitive():
    assert SolverType.parse("square_root") == SolverType.SQUARE_ROOT
    with pytest.raises(ValueError, match="invalid value"):
        SolverType.parse("not_a_solver")


def test_cli_overrides_config(tmp_path):
    from rootba_tpu.cli.common import parse_bal_app_arguments

    cfg = tmp_path / "rootba_config.toml"
    cfg.write_text("""
[solver]
max_num_iterations = 5
eta = 0.2

[dataset]
input = "from_config.txt"
""")
    opts = parse_bal_app_arguments("t", argv=[
        "--config", str(cfg),
        "--max-num-iterations", "9",
        "--residual-robust-norm", "HUBER",
        "--no-jacobi-scaling",
    ])
    assert opts.solver.max_num_iterations == 9  # CLI wins
    assert opts.solver.eta == 0.2  # config survives
    assert opts.dataset.input == "from_config.txt"
    assert opts.solver.residual.robust_norm == RobustNorm.HUBER
    assert opts.solver.jacobi_scaling is False


def test_cli_rejects_unknown_config_key(tmp_path):
    from rootba_tpu.cli.common import parse_bal_app_arguments

    cfg = tmp_path / "rootba_config.toml"
    cfg.write_text("[solver]\nbogus = 1\n")
    with pytest.raises(SystemExit):
        parse_bal_app_arguments("t", argv=["--config", str(cfg)])


def test_inert_knob_warning():
    """Non-default values of parity-only knobs warn once (VERDICT r2
    item 7; matches the unused-key discipline of the reference options
    framework, options_interface.cpp:86-170)."""
    import warnings

    from rootba_tpu.config.options import SolverOptions

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        SolverOptions().warn_inert_knobs()
    assert not rec  # defaults stay silent

    opts = SolverOptions(staged_execution=False, max_lm_diagonal=1e10)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        opts.warn_inert_knobs()
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 2
    assert any("staged_execution" in m and "inert" in m for m in msgs)
    assert any("max_lm_diagonal" in m for m in msgs)


def test_strip_min_group_auto_resolution():
    """strip_min_group=-1 resolves by problem size: leftover-stream
    routing below the threshold, all-per-bucket strips above (the
    round-2 strip_min_group=0 default cost 11x at trafalgar)."""
    from rootba_tpu.config.options import SolverOptions

    opts = SolverOptions()
    assert opts.strip_min_group == -1
    assert opts.effective_strip_min_group(1_551_077) == 16384  # traf
    assert opts.effective_strip_min_group(5_001_946) == 0  # venice
    assert opts.effective_strip_min_group(28_987_644) == 0  # final13682
    assert SolverOptions(
        strip_min_group=7).effective_strip_min_group(10**9) == 7
    assert SolverOptions(
        strip_min_group=0).effective_strip_min_group(100) == 0
