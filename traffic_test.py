#!/usr/bin/env python
"""Training / validation driver (reference traffic_test.py).

Usage mirrors the reference CLI::

    python traffic_test.py --trainer=qlearn
    python traffic_test.py --trainer=greedy --mode=validate
    python traffic_test.py --trainer=a3c --conv_gru=true --num_envs=2048

The env factory (3x3 grid, 250 m roads, Repeater/Remi wrapper stack) is
built inside the algorithm harness from the parsed Config
(algorithms/common.py:build_env; reference traffic_test.py:78-91).
"""

from traffic_env_tpu.algorithms import run_alg
from traffic_env_tpu.config import parse_flags

if __name__ == "__main__":
    run_alg(parse_flags())
