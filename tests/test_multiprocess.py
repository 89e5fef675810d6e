"""Multi-host backend smoke: 2 processes x 4 virtual CPU devices must
reproduce the single-process 8-device mesh solve.

This is the TPU-native analog of the reference's strongest equivalence
guarantee (dual reduction paths giving identical results,
solver_options.hpp:266): the same solve, decomposed over a
jax.distributed two-process runtime with per-process shard loading and
DCN-boundary camera all-reduces, must match the single-runtime result.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
port = sys.argv[3]; out = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rootba_tpu.parallel.mesh import init_distributed
init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.log.summary import SolverSummary
from rootba_tpu.solver.lm import bundle_adjust

p = generate_synthetic_bal(num_cams=12, num_lms=200,
                           mean_obs_per_lm=4.5, seed=3)
p.normalize(100.0)
p.perturb(0.0, 0.01, 0.01, 38401)
p.filter_obs(0.1)
opts = SolverOptions(max_num_iterations=5, verbosity_level=0,
                     lm_loop="host", num_devices=0,
                     kernel_layout="einsum", use_double=True)
summary = bundle_adjust(p, opts)
if pid == 0:
    res = {
        "costs": [it.cost.valid.error for it in summary.iterations],
        "final_cost": summary.final_cost.valid.error,
        "cam_t": np.asarray(p.cam_t).tolist(),
    }
    import numpy as np  # noqa: F811
    json.dump(res, open(out, "w"))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp_result.json")
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fp:
        fp.write("import numpy as np\n" + _WORKER)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # replace (not extend) PYTHONPATH: site hooks on this machine
    # (e.g. a TPU-tunnel plugin dir) interfere with jax.distributed
    # on the CPU backend
    env["PYTHONPATH"] = repo_root
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            stdout, _ = pr.communicate()
        outs.append(stdout.decode(errors="replace"))
    for pr, text in zip(procs, outs):
        assert pr.returncode == 0, f"worker failed:\n{text[-4000:]}"
    mp = json.load(open(out))

    # single-process reference on the same 8-device virtual mesh
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import bundle_adjust

    p = generate_synthetic_bal(num_cams=12, num_lms=200,
                               mean_obs_per_lm=4.5, seed=3)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    opts = SolverOptions(max_num_iterations=5, verbosity_level=0,
                         lm_loop="host", num_devices=0,
                         kernel_layout="einsum", use_double=True)
    summary = bundle_adjust(p, opts)

    sp_costs = [it.cost.valid.error for it in summary.iterations]
    assert len(mp["costs"]) == len(sp_costs)
    np.testing.assert_allclose(mp["costs"], sp_costs, rtol=1e-8)
    np.testing.assert_allclose(mp["final_cost"],
                               summary.final_cost.valid.error, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mp["cam_t"]), p.cam_t,
                               rtol=1e-6, atol=1e-9)


_CKPT_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
port = sys.argv[3]; out = sys.argv[4]; ckpt = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rootba_tpu.parallel.mesh import init_distributed
init_distributed(f"localhost:{port}", nproc, pid)

from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.solver.lm import bundle_adjust


def problem():
    p = generate_synthetic_bal(num_cams=12, num_lms=200,
                               mean_obs_per_lm=4.5, seed=3)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


def opts(n, **kw):
    return SolverOptions(max_num_iterations=n, verbosity_level=0,
                         lm_loop="host", num_devices=0,
                         kernel_layout="einsum", use_double=True, **kw)


# straight-through 6-iteration solve (the reference trajectory)
s_full = bundle_adjust(problem(), opts(6))

# interrupted run: write a checkpoint every 2 iterations, stop at 3
bundle_adjust(problem(), opts(3, checkpoint_path=ckpt,
                              checkpoint_interval=2))
assert os.path.exists(ckpt), "process 0 must have written the checkpoint"

# resumed run continues from the checkpoint to 6 iterations
s_res = bundle_adjust(problem(), opts(6, checkpoint_path=ckpt,
                                      checkpoint_interval=2))

if pid == 0:
    json.dump({
        "full": [it.cost.valid.error for it in s_full.iterations],
        "resumed": [it.cost.valid.error for it in s_res.iterations],
    }, open(out, "w"))
"""


def test_two_process_checkpoint_resume(tmp_path):
    """Multi-process checkpoint/resume (VERDICT r3 item 6): save
    allgathers landmark shards (collective) with process 0 writing;
    resume re-shards on every process. The resumed trajectory must
    exactly continue the straight-through solve."""
    port = _free_port()
    out = str(tmp_path / "mp_ckpt.json")
    ckpt = str(tmp_path / "solve.ckpt.npz")
    worker = str(tmp_path / "ckpt_worker.py")
    with open(worker, "w") as fp:
        fp.write("import numpy as np\n" + _CKPT_WORKER)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out, ckpt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            stdout, _ = pr.communicate()
        outs.append(stdout.decode(errors="replace"))
    for pr, text in zip(procs, outs):
        assert pr.returncode == 0, f"worker failed:\n{text[-4000:]}"
    res = json.load(open(out))
    # iterations 0..3 match the interrupted run's record; 4..6 continue
    # identically to the straight-through solve
    assert len(res["resumed"]) == len(res["full"])
    np.testing.assert_allclose(res["resumed"], res["full"], rtol=1e-9)


_ELASTIC_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
port = sys.argv[3]; out = sys.argv[4]; ckpt = sys.argv[5]
iters = int(sys.argv[6])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rootba_tpu.parallel.mesh import init_distributed
init_distributed(f"localhost:{port}", nproc, pid)

from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.solver.lm import bundle_adjust

p = generate_synthetic_bal(num_cams=12, num_lms=200,
                           mean_obs_per_lm=4.5, seed=3)
p.normalize(100.0)
p.perturb(0.0, 0.01, 0.01, 38401)
p.filter_obs(0.1)
opts = SolverOptions(max_num_iterations=iters, verbosity_level=0,
                     lm_loop="host", num_devices=0,
                     kernel_layout="einsum", use_double=True,
                     checkpoint_path=ckpt, checkpoint_interval=2)
s = bundle_adjust(p, opts)
if pid == 0:
    json.dump({"costs": [it.cost.valid.error for it in s.iterations]},
              open(out, "w"))
"""


def _run_workers(worker_path, nproc, port, out, ckpt, iters):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    procs = [
        subprocess.Popen(
            [sys.executable, worker_path, str(pid), str(nproc),
             str(port), out, ckpt, str(iters)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)
    ]
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            stdout, _ = pr.communicate()
        assert pr.returncode == 0, \
            f"worker failed:\n{stdout.decode(errors='replace')[-4000:]}"


def _inline_solve(iters, ckpt=None):
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import bundle_adjust

    p = generate_synthetic_bal(num_cams=12, num_lms=200,
                               mean_obs_per_lm=4.5, seed=3)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    kw = {}
    if ckpt is not None:
        kw = dict(checkpoint_path=ckpt, checkpoint_interval=2)
    opts = SolverOptions(max_num_iterations=iters, verbosity_level=0,
                         lm_loop="host", num_devices=0,
                         kernel_layout="einsum", use_double=True, **kw)
    s = bundle_adjust(p, opts)
    return [it.cost.valid.error for it in s.iterations]


def test_elastic_resume_across_process_counts(tmp_path):
    """Elastic resume (VERDICT r4 weak item 6): a checkpoint written by
    a 2-process run resumes on 1 process and vice versa -- the
    checkpoint stores full (allgathered) arrays, so resume re-shards
    onto whatever mesh the resuming run has. Trajectories must continue
    the straight-through solve on either side."""
    worker = str(tmp_path / "elastic_worker.py")
    with open(worker, "w") as fp:
        fp.write("import numpy as np\n" + _ELASTIC_WORKER)

    # straight-through 6-iteration reference (1 process, 8 devices)
    full = _inline_solve(6)

    # --- 2 procs write, 1 proc resumes -----------------------------
    ckpt = str(tmp_path / "elastic_a.ckpt.npz")
    out = str(tmp_path / "elastic_a.json")
    _run_workers(worker, 2, _free_port(), out, ckpt, 3)
    assert os.path.exists(ckpt)
    resumed = _inline_solve(6, ckpt=ckpt)
    assert len(resumed) == len(full)
    np.testing.assert_allclose(resumed, full, rtol=1e-8)

    # --- 1 proc writes, 2 procs resume -----------------------------
    ckpt_b = str(tmp_path / "elastic_b.ckpt.npz")
    out_b = str(tmp_path / "elastic_b.json")
    _inline_solve(3, ckpt=ckpt_b)
    assert os.path.exists(ckpt_b)
    _run_workers(worker, 2, _free_port(), out_b, ckpt_b, 6)
    res_b = json.load(open(out_b))
    assert len(res_b["costs"]) == len(full)
    np.testing.assert_allclose(res_b["costs"], full, rtol=1e-8)
