"""CEM elite refit semantics (reference cem.py:21-31).

With vector (per-intersection) returns the reference selects elites per
column: ys.argsort(axis=0) + the expand_dims gather at cem.py:22-25.
The round-2 port collapsed ys to a scalar mean, which destroys
per-agent credit assignment and made CEM degrade on the 3x3 workload;
refit() restores the reference's column-wise behavior.
"""

import numpy as np

from traffic_env_tpu.algorithms.cem import make_eval, refit


def test_refit_selects_elites_per_intersection():
    S, O, I = 6, 3, 2
    rng = np.random.RandomState(0)
    ths = rng.randn(S, O, I).astype(np.float32)
    ys = np.zeros((S, I), np.float32)
    ys[2, 0] = 5.0   # candidate 2 is best at intersection 0
    ys[4, 1] = 7.0   # candidate 4 is best at intersection 1
    mean, std = refit(ths, ys, n_elite=1)
    assert mean.shape == (O, I) and std.shape == (O, I)
    np.testing.assert_allclose(mean[:, 0], ths[2, :, 0])
    np.testing.assert_allclose(mean[:, 1], ths[4, :, 1])
    np.testing.assert_allclose(std, 0.0)   # single elite


def test_refit_scalar_path_matches_reference():
    S, O = 5, 4
    rng = np.random.RandomState(1)
    ths = rng.randn(S, O).astype(np.float32)
    ys = np.asarray([3.0, 1.0, 4.0, 1.5, 9.0], np.float32)
    mean, std = refit(ths, ys, n_elite=2)
    elite = ths[[2, 4]]   # two highest ys
    np.testing.assert_allclose(mean, elite.mean(axis=0))
    np.testing.assert_allclose(std, elite.std(axis=0))


def test_num_tries_averages_per_candidate():
    """evaluate() reshapes (S*tries, I) env returns to (S, tries, I)
    and averages over tries: candidate k's score mixes only envs
    k*tries..(k+1)*tries-1."""
    import jax
    import jax.numpy as jnp
    from traffic_env_tpu.config import Config
    from traffic_env_tpu.algorithms.common import build_env

    cfg = Config(trainer="cem", grid_m=1, grid_n=1, num_tries=3,
                 seed=2, logdir="/tmp/cem_refit_test").derive()
    topo, cfg, benv = build_env(cfg, n_envs=4 * cfg.num_tries)
    evaluate = make_eval(cfg, benv, sample_size=4)
    I = benv.n_intersections
    obs_dim = benv.env.obs_dim
    thetas = jnp.asarray(
        np.random.RandomState(3).randn(4, obs_dim, I), jnp.float32)
    env = benv.init(jax.random.key(0))
    from traffic_env_tpu.algorithms.common import refresh_env_schedule
    env = refresh_env_schedule(benv, env)
    env, ys = evaluate(env, thetas, jax.random.key(1))
    assert ys.shape == (4, I)
    assert np.isfinite(np.asarray(ys)).all()
