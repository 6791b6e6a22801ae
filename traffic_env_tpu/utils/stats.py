"""Episode statistics and streaming reporting.

Ports the reference's observability utilities (util.py:13-94):
``episode_reward`` consumes an epoch generator and produces the
discounted / averaged mean-reward scalar plus validate-mode info
(action 0/1 fractions, light/trip times, unfinished cars);
``print_running_stats`` streams mean/std until interrupted;
``write_data`` dumps histograms + .npy artifacts.
"""

from __future__ import annotations

import math
from itertools import count

import numpy as np


def forever(f):
    while True:
        yield f()


def episode_reward(cfg, gen, env_unfinished=None, trip_times=None):
    """Reduce an epoch generator to (reward scalar, info dict).

    ``gen`` yields (t, obs, action, reward, info, ...) tuples like the
    reference's epoch generators (util.py:68-94)."""
    num_0s = num_1s = 0
    reward = 0.0
    multiplier = 1.0
    light_times: list = []
    i = 0
    for (i, _, a, r, info, *_) in gen:
        reward += float(np.mean(r)) * (multiplier if cfg.print_discounted
                                       else 1.0)
        multiplier *= cfg.gamma
        if info:
            lt = np.asarray(info.get("light_times", ()))
            light_times.extend(lt[np.nonzero(lt)].tolist()
                               if lt.ndim else [])
            a = np.asarray(a)
            nz = int(np.count_nonzero(a))
            num_1s += nz
            num_0s += a.size - nz
    if not cfg.print_avg:
        denom = 1.0
    elif cfg.gamma == 1:
        denom = i + 1
    else:
        denom = (math.pow(cfg.gamma, i + 1) - 1) / (cfg.gamma - 1)
    if cfg.mode == "validate":
        total = max(num_1s + num_0s, 1)
        info_struct = {
            "zerop": num_0s / total,
            "onep": num_1s / total,
            "light_times": light_times,
            "trip_times": list(trip_times) if trip_times is not None else [],
            "unfinished": (float(env_unfinished())
                           if env_unfinished is not None else 0.0),
        }
    else:
        info_struct = None
    return reward / denom, info_struct


def print_running_stats(iterator, max_iterations=None):
    """Streaming mean/std of per-episode rewards (util.py:13-34);
    returns (light_times, trip_times, unfinished) on interrupt/limit."""
    trip_times: list = []
    light_times: list = []
    unfinished: list = []
    try:
        reward_mean = 0.0
        reward_var = 0.0
        for iterations in count(1):
            reward, info = next(iterator)
            reward_mean = (reward + (iterations - 1) * reward_mean) / iterations
            if iterations >= 2:
                reward_var = (iterations - 2) / (iterations - 1) * reward_var \
                    + (reward - reward_mean) ** 2 / iterations
            print("Reward %2f\t Mean %2f\t Std %2f"
                  % (reward, reward_mean, math.sqrt(reward_var)))
            if info:
                print("One prob: %2f,\t Zero prob: %2f"
                      % (info["onep"], info["zerop"]))
                trip_times.extend(info["trip_times"])
                light_times.extend(info["light_times"])
                unfinished.append(info["unfinished"])
            if max_iterations is not None and iterations >= max_iterations:
                break
    except (KeyboardInterrupt, StopIteration):
        print("Interrupted")
    return (light_times, trip_times, unfinished)


def make_plot(cfg, light_times, trip_times, unfinished):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def sub(ax, data, title):
        ax.set_title(title)
        if len(data):
            ax.hist(data, color="c")
            ax.axvline(np.mean(data), color="b", linestyle="dashed",
                       linewidth=2)

    fig = plt.figure()
    fig.suptitle("Stats for " + cfg.trainer, fontweight="bold", fontsize=14)
    fig.subplots_adjust(hspace=0.5)
    sub(fig.add_subplot(311), light_times, "Light Times")
    sub(fig.add_subplot(312), trip_times, "Trip Times")
    sub(fig.add_subplot(313), unfinished, "Unfinished")
    return fig


def write_data(cfg, light_times, trip_times, unfinished, outdir="."):
    """hist.png + .npy dumps (util.py:36-59)."""
    import os

    fig = make_plot(cfg, light_times, trip_times, unfinished)
    fig.savefig(os.path.join(outdir, "hist.png"))
    np.save(os.path.join(outdir, "light_times.npy"), light_times)
    np.save(os.path.join(outdir, "trip_times.npy"), trip_times)
    np.save(os.path.join(outdir, "unfinished.npy"), unfinished)
