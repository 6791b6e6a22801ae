#!/usr/bin/env python
"""CartPole fixture driver (reference cartpole-test.py): runs the same
algorithm stack on the jitted CartPole env with the reference's retuned
flags, separating algorithm bugs from simulator bugs."""

from traffic_env_tpu.algorithms import run_alg
from traffic_env_tpu.config import parse_flags

if __name__ == "__main__":
    cfg = parse_flags()
    cfg = cfg.replace(
        env_name="cartpole",
        learning_rate=0.1,
        episode_len=800,
        gamma=0.99,
        summary_rate=20,
        save_rate=10000,
        train_rate=1,
        batch_size=10,
        target_update_rate=5,
        annealing_episodes=1000,
        buffer_size=50,
        lam=1.0,
        start_eps=0.2,
        trace_size=1,
        validate_rate=20,
        print_discounted=False,
    ).derive()
    run_alg(cfg)
