"""The driver-facing bench contract: one JSON line, and the --mesh
scaling-efficiency harness emits the efficiency metric."""

import json
import os

import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # bench sets its own virtual mesh
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--platform=cpu", "--num_envs=32", "--agent_steps=4",
         "--warmup_steps=2", "--repeats=1"] + args,
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_bench_single_chip_line():
    line = _run([])
    assert line["unit"] == "env-steps/s/chip"
    assert line["value"] > 0 and "vs_baseline" in line


@pytest.mark.slow
def test_bench_mesh_scaling_efficiency():
    line = _run(["--mesh=2"])
    assert line["mesh_devices"] == 2
    assert 0 < line["scaling_efficiency"]
    assert line["single_device_env_steps_per_sec"] > 0


@pytest.mark.slow
def test_bench_native_cpu_line():
    line = _run(["--core=native"])
    assert line["unit"] == "env-steps/s/core"
    assert line["value"] > 0 and "vs_baseline" in line
