"""Multi-host (multi-process) training through the production CLI:
two jax.distributed processes form a global 2-device dp mesh and train
sharded (--coordinator/--num_processes/--process_id/--mesh_shape),
with the primary process writing the checkpoint (SURVEY.md §2.4's
distributed-backend replacement, exercised for real)."""

import json
import os

import pytest
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cli_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # fresh interpreters pick their platform from the CLI flag; drop
    # any pytest-harness device-count forcing
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def proc(pid):
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "traffic_test.py"),
             "--trainer=qlearn", "--platform=cpu",
             f"--coordinator=localhost:{port}",
             "--num_processes=2", f"--process_id={pid}",
             "--mesh_shape=2", "--num_envs=4", "--grid_m=1",
             "--grid_n=2", "--road_length=60", "--episode_secs=20",
             "--total_episodes=2", "--buffer_size=16", "--batch_size=4",
             "--summary_rate=1", "--validate_rate=5", "--save_rate=100",
             f"--logdir={tmp_path}/p{pid}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    p0, p1 = proc(0), proc(1)
    out0 = p0.communicate(timeout=420)[0].decode()
    out1 = p1.communicate(timeout=120)[0].decode()
    assert p0.returncode == 0, out0[-3000:]
    assert p1.returncode == 0, out1[-3000:]
    # primary wrote the checkpoint; both logged real metrics
    assert os.path.isdir(tmp_path / "p0" / "model.ckpt")
    assert not os.path.exists(tmp_path / "p1" / "model.ckpt")
    lines = [json.loads(ln) for ln in
             open(tmp_path / "p0" / "metrics.jsonl")]
    assert any(ln["name"] == "mean_reward" and ln["value"] != 0.0
               for ln in lines)
