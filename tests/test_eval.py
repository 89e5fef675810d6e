"""Tests for logging + eval tooling (log IO, metrics, experiments,
report, batch config generation)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rootba_tpu.config.options import BaLogOptions
from rootba_tpu.eval.log import _parse_ubjson, load_ba_log
from rootba_tpu.eval.metrics import METRICS, cost_threshold, time_to_threshold
from rootba_tpu.log.ba_log import _to_ubjson, build_log_dict, save_log
from rootba_tpu.log.summary import (
    IterationSummary,
    ResidualInfoHost,
    ResidualItemHost,
    SolverSummary,
    finish_iteration,
    finish_solve,
)


def make_summary(costs=(100.0, 50.0, 30.0, 30.0)):
    s = SolverSummary()
    for i, c in enumerate(costs):
        it = IterationSummary(iteration=i)
        it.cost = ResidualInfoHost(
            all=ResidualItemHost(num_obs=10, error=c, residual_sum=5.0),
            valid=ResidualItemHost(num_obs=9, error=c * 0.9,
                                   residual_sum=4.0))
        it.step_is_successful = i < 3  # last iteration rejected
        it.step_is_valid = True
        it.linear_solver_iterations = 5
        it.iteration_time_in_seconds = 0.1
        it.cumulative_time_in_seconds = 0.1 * (i + 1)
        it.trust_region_radius = 1e4
        it.linear_solver_type = "bal_qr"
        finish_iteration(s, it)
    finish_solve(s, "bal_qr")
    return s


def test_log_dict_schema():
    s = make_summary()
    d = build_log_dict(s)
    assert d["_type"] == "rootba"
    assert d["cost"] == [100.0, 50.0, 30.0, 30.0]  # rejected repeats prev
    assert d["cost_change"][3] == 0.0
    assert d["iteration"] == [0, 1, 2, 3]
    assert d["_static"]["solver"]["solver_type"] == "bal_qr"
    assert d["_static"]["solver"]["num_successful_steps"] == 2
    assert d["_static"]["solver"]["num_unsuccessful_steps"] == 1


def test_ubjson_roundtrip():
    obj = {"a": [1, 2, 3], "b": 1.5, "c": "hi", "d": True,
           "e": {"f": [1.0, -2.5]}, "g": 300, "h": 70000,
           "i": 2**40, "j": None}
    data = _to_ubjson(obj)
    back = _parse_ubjson(data)
    assert back == obj


def test_save_and_load_log(tmp_path):
    s = make_summary()
    opts = BaLogOptions(log_path=str(tmp_path / "ba_log.json"),
                        save_log_flags=["JSON", "UBJSON"])
    save_log(opts, s, quiet=True)
    for name in ("ba_log.json", "ba_log.ubjson"):
        log = load_ba_log(str(tmp_path / name))
        np.testing.assert_allclose(np.asarray(log["cost"]),
                                   [100.0, 50.0, 30.0, 30.0])
        assert log["_static"]["solver"]["termination_type"]


def test_metrics():
    s = make_summary()
    d = build_log_dict(s)
    assert METRICS["cost"].value(d) == 30.0
    assert METRICS["num_iterations"].value(d) == 3
    assert METRICS["linear_solver_iterations"].value(d) == 20
    th = cost_threshold(100.0, 30.0, 0.1)
    assert th == 37.0
    assert time_to_threshold(d, 37.0) == pytest.approx(0.3)
    assert time_to_threshold(d, 1.0) == float("inf")


def test_experiments_and_report(tmp_path):
    # build two fake experiment dirs
    for exp, seq, costs in [
        ("expA", "seq1", (100.0, 40.0, 20.0)),
        ("expA", "seq2", (200.0, 90.0, 60.0)),
        ("expB", "seq1", (100.0, 60.0, 25.0)),
        ("expB", "seq2", (200.0, 80.0, 55.0)),
    ]:
        d = tmp_path / "runs" / exp / seq
        d.mkdir(parents=True)
        s = make_summary(costs)
        save_log(BaLogOptions(log_path=str(d / "ba_log.json")), s,
                 quiet=True)
        (d / "status.log").write_text("completed\n")

    spec = tmp_path / "spec.toml"
    spec.write_text(f"""
[options]
base_path = "{tmp_path}"
output_path = "report"

[[experiments]]
name = "A"
display_name = "solver A"
pattern = "runs/expA/*"

[[experiments]]
name = "B"
display_name = "solver B"
pattern = "runs/expB/*"
""")
    from rootba_tpu.eval.experiments import load_all
    from rootba_tpu.eval.report import generate_report

    exps = load_all(str(spec))
    assert set(exps) == {"A", "B"}
    assert exps["A"].sequences() == ["seq1", "seq2"]
    path = generate_report(exps, str(tmp_path / "report"))
    text = open(path).read()
    assert "solver A" in text and "seq1" in text
    assert (tmp_path / "report" / "performance_profiles.png").exists()
    assert (tmp_path / "report" / "convergence.png").exists()
    assert (tmp_path / "report" / "bar_total_time.png").exists()
    tex = (tmp_path / "report" / "report.tex").read_text()
    assert r"\begin{tabular}" in tex and r"\textbf{" in tex


def test_batch_config_generator(tmp_path):
    (tmp_path / "rootba_batch_config.toml").write_text("""
[dataset]
input = "x.txt"

[solver]
max_num_iterations = 5

[_batch]
revision = "r1"

[_batch.config.qr]
solver = { solver_type = "SQUARE_ROOT" }

[_batch.config.sc]
solver = { solver_type = "SCHUR_COMPLEMENT" }

[_batch.config.d1]
dataset = { input = "a.txt" }

[_batch.alternatives]
solvers = ["qr", "sc"]

[_batch.combinations]
combo = ["d1", "solvers"]
""")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "generate-batch-configs.py")
    subprocess.run([sys.executable, script, str(tmp_path)], check=True,
                   capture_output=True)
    import tomllib

    cfg_qr = tmp_path / "r1" / "combo" / "d1_qr" / "rootba_config.toml"
    cfg_sc = tmp_path / "r1" / "combo" / "d1_sc" / "rootba_config.toml"
    assert cfg_qr.exists() and cfg_sc.exists()
    d = tomllib.loads(cfg_qr.read_text())
    assert d["solver"]["solver_type"] == "SQUARE_ROOT"
    assert d["solver"]["max_num_iterations"] == 5
    assert d["dataset"]["input"] == "a.txt"


def test_experiments_templates_and_cache(tmp_path):
    """Template/substitution expansion + spec-hash pickle caching
    (reference experiments.py:298-460 grammar, :39-48 caching)."""
    for kind in ("qr32", "sc32"):
        for seq in ("seq1", "seq2"):
            d = tmp_path / "runs" / f"2026_{kind}" / seq
            d.mkdir(parents=True)
            s = make_summary((100.0, 50.0, 25.0))
            save_log(BaLogOptions(log_path=str(d / "ba_log.json")), s,
                     quiet=True)
            (d / "status.log").write_text("completed\n")

    spec = tmp_path / "spec.toml"
    spec.write_text(f"""
[options]
base_path = "{tmp_path}"
cache_dir = "cache"

[[substitutions]]
date = "2026"

[[templates]]
_name = "exp_kind"
_arguments = ["kind"]
name = "${{kind}}"
display_name = "solver ${{kind}}"
pattern = "runs/${{date}}_${{kind}}/*"

[[experiments]]
_template = {{ _name = "exp_kind", kind = {{ _argument = "product", _value = ["qr32", "sc32"] }} }}
""")
    from rootba_tpu.eval.experiments import load_all

    exps = load_all(str(spec))
    assert set(exps) == {"qr32", "sc32"}
    assert exps["qr32"].display_name == "solver qr32"
    assert exps["sc32"].sequences() == ["seq1", "seq2"]

    # warm-cache load hits the pickles (delete the run dirs to prove it)
    import shutil

    assert (tmp_path / "cache").is_dir()
    shutil.rmtree(tmp_path / "runs")
    exps2 = load_all(str(spec))
    assert exps2["sc32"].sequences() == ["seq1", "seq2"]


def test_html_viewer(tmp_path):
    """Interactive HTML viewer (pangolin GUI analog): payload buffers
    decode back to the problem's geometry; emitted file is
    self-contained (no external URLs)."""
    import base64

    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.eval.html_view import (
        _reprojections,
        export_html,
        viewer_payload,
    )

    p = generate_synthetic_bal(num_cams=5, num_lms=60,
                               mean_obs_per_lm=3.0, seed=3)
    payload = viewer_payload(p)

    def unpack(b64, shape):
        return np.frombuffer(base64.b64decode(b64),
                             dtype="<f4").reshape(shape)

    pts = unpack(payload["points"], (-1, 3))
    np.testing.assert_allclose(pts, p.lm_p, rtol=1e-6)
    assert payload["num_cams"] == 5
    # overlay offsets partition the per-camera obs
    offs = payload["ov_off"]
    assert offs[-1] == p.num_observations
    ov_obs = unpack(payload["ov_obs"], (-1, 2))
    assert ov_obs.shape[0] == p.num_observations
    # reprojections match the host residual model: reproj - uv = res
    rep = _reprojections(p)
    assert np.isfinite(rep).all()

    out = tmp_path / "map.html"
    export_html(p, str(out))
    html = out.read_text()
    assert "http://" not in html and "https://" not in html
    assert "rootba_tpu map" in html


def test_live_view_server():
    """Live-optimize viewer (reference bal_gui.cpp:88-116 optimize
    button): POST /optimize runs the solver on a background thread;
    /state serves decreasing costs and fresh point buffers."""
    import json
    import threading
    import time
    import urllib.request

    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.eval import live_view

    p = generate_synthetic_bal(num_cams=6, num_lms=60,
                               mean_obs_per_lm=4.0, seed=5)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)

    opts = SolverOptions(use_double=False, lm_loop="host",
                         verbosity_level=0, max_num_iterations=3)
    port = 8123
    t = threading.Thread(
        target=live_view.serve,
        kwargs=dict(problem=p, options=opts, port=port),
        daemon=True)
    t.start()

    base = f"http://127.0.0.1:{port}"

    def get(path):
        return urllib.request.urlopen(base + path, timeout=10).read()

    for _ in range(50):  # wait for the server socket
        try:
            html = get("/").decode()
            break
        except OSError:
            time.sleep(0.1)
    assert "bopt" in html and "optimize" in html

    req = urllib.request.Request(base + "/optimize", method="POST")
    assert json.loads(urllib.request.urlopen(req, timeout=10).read())[
        "status"] == "started"

    costs = []
    deadline = time.monotonic() + 240
    last = -1
    while time.monotonic() < deadline:
        raw = get(f"/state?since={last}")
        assert b"NaN" not in raw  # NaN is invalid JSON; browsers reject
        d = json.loads(raw)
        if d["it"] > last:
            last = d["it"]
            costs.append(d["cost"])
            if d["it"] >= 0:
                assert "payload" in d and "points" in d["payload"]
        if d["done"]:
            break
        time.sleep(0.3)
    else:
        raise AssertionError("live solve did not finish in time")
    assert len(costs) >= 3
    assert costs[-1] < costs[0]  # the optimize button optimized
