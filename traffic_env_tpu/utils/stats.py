"""Streaming episode statistics and validation artifacts.

Covers the reference's observability surface (util.py:13-59): a
streaming mean/std report over per-episode rewards, accumulation of
validate-mode telemetry (light/trip times, unfinished cars), and the
histogram + .npy artifact dump.

Output-format compat contract (kept verbatim so downstream log parsers
written for the reference keep working):

    Reward %2f\t Mean %2f\t Std %2f
    One prob: %2f,\t Zero prob: %2f

Everything else is reorganized for this codebase: Welford's online
moment update replaces the reference's incremental mean/variance
recurrences (same values, numerically stabler), telemetry accumulation
lives in a small dataclass instead of loose lists, and the epoch-
generator reducer (reference ``episode_reward``) has no equivalent —
episode reduction happens inside the jitted learner scans here, so the
host only ever sees one scalar per episode.
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np


def forever(f):
    while True:
        yield f()


@dataclasses.dataclass
class _Telemetry:
    """Validate-mode accumulators drained from episode info dicts."""
    light_times: list = dataclasses.field(default_factory=list)
    trip_times: list = dataclasses.field(default_factory=list)
    unfinished: list = dataclasses.field(default_factory=list)

    def absorb(self, info: dict) -> None:
        self.light_times.extend(info.get("light_times", ()))
        self.trip_times.extend(info.get("trip_times", ()))
        if "unfinished" in info:
            self.unfinished.append(info["unfinished"])

    def as_tuple(self):
        return (self.light_times, self.trip_times, self.unfinished)


class Welford:
    """Online mean/variance (Welford 1962): numerically stable single
    pass, equivalent to the reference's running recurrences."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self._m2 = 0.0

    def push(self, x: float) -> None:
        self.n += 1
        delta = x - self.mean
        self.mean += delta / self.n
        self._m2 += delta * (x - self.mean)

    @property
    def std(self) -> float:
        return math.sqrt(self._m2 / (self.n - 1)) if self.n > 1 else 0.0


def print_running_stats(episodes, max_iterations=None):
    """Consume an iterator of (reward, info) pairs, printing the
    streaming reward statistics after each episode, until the iterator
    ends, ``max_iterations`` is reached, or the user interrupts.
    Returns the accumulated (light_times, trip_times, unfinished)
    telemetry (empty lists outside validate mode)."""
    stats = Welford()
    telemetry = _Telemetry()
    try:
        for reward, info in episodes:
            stats.push(reward)
            print("Reward %2f\t Mean %2f\t Std %2f"
                  % (reward, stats.mean, stats.std))
            if info:
                print("One prob: %2f,\t Zero prob: %2f"
                      % (info["onep"], info["zerop"]))
                telemetry.absorb(info)
            if max_iterations is not None and stats.n >= max_iterations:
                break
    except (KeyboardInterrupt, StopIteration):
        print("Interrupted")
    return telemetry.as_tuple()


def make_plot(cfg, light_times, trip_times, unfinished):
    """Three stacked histograms with dashed mean markers, titled by
    trainer (the reference's hist.png layout, util.py:44-59)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(6.4, 4.8))
    fig.suptitle("Stats for " + cfg.trainer, fontweight="bold",
                 fontsize=14)
    fig.subplots_adjust(hspace=0.5)
    panels = [("Light Times", light_times), ("Trip Times", trip_times),
              ("Unfinished", unfinished)]
    for ax, (title, data) in zip(axes, panels):
        ax.set_title(title)
        if len(data):
            ax.hist(data, color="c")
            ax.axvline(float(np.mean(data)), color="b",
                       linestyle="dashed", linewidth=2)
    return fig


def write_data(cfg, light_times, trip_times, unfinished, outdir="."):
    """Persist the validation artifacts: hist.png plus one .npy per
    telemetry series (util.py:36-59's artifact set)."""
    fig = make_plot(cfg, light_times, trip_times, unfinished)
    fig.savefig(os.path.join(outdir, "hist.png"))
    series = {"light_times": light_times, "trip_times": trip_times,
              "unfinished": unfinished}
    for name, data in series.items():
        np.save(os.path.join(outdir, name + ".npy"), data)


def display_data(cfg, light_times, trip_times, unfinished):
    """Interactive summary (util.py:61-66): histogram figure plus
    mean/mode/std lines per telemetry series.  Headless-safe — the
    figure is returned (Agg backend) rather than plt.show()n."""
    fig = make_plot(cfg, light_times, trip_times, unfinished)
    for name, data in (("Light times", light_times),
                       ("Trip times", trip_times),
                       ("Unfinished", unfinished)):
        if not len(data):
            continue
        arr = np.asarray(data)
        vals, counts = np.unique(arr, return_counts=True)
        mode = float(vals[np.argmax(counts)])
        print("%s mean %2f, mode %2f, std %2f"
              % (name, float(np.mean(arr)), mode, float(np.std(arr))))
    return fig
