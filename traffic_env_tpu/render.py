"""Host-side renderer reading synced device state.

The reference renders with pyglet inside the env loop (fake frame-skip
render hook + GL lines, traffic_env.py:285-359, gym_traffic/__init__.py:6-8):
roads drawn as segments, each training road colored by its light
(green; yellow while ``elapsed < YELLOW_TICKS``; red), cars drawn as
``[x - l, x]`` sub-segments along the road transform.

A TPU-native build cannot render per tick from inside ``jit`` — and
should not.  Instead this module renders *snapshots*: fetch one env's
``SimState`` (one ``device_get`` of a few KB), draw it with matplotlib
(Agg), and optionally assemble episode frame sequences into an
animated GIF.  Drive it with ``--render`` (which forces
``mode=validate``, alg_flags.py:42) through the baselines runner, or
call ``render_frame`` directly.
"""

from __future__ import annotations

import os

import numpy as np

from .constants import ARCHETYPES, L, RING, YELLOW_TICKS

CAR_LENGTH = float(ARCHETYPES[0, L])
from .topology import GridRoad

GREEN = "#2e7d32"
YELLOW = "#f9a825"
RED = "#c62828"
ROAD = "#9e9e9e"
CAR = "#1565c0"


def _road_color(topo: GridRoad, rid: int, phase, elapsed):
    if rid >= topo.train_roads:
        return ROAD
    dst = topo.dest[rid]
    red = topo.phase_group[rid] == phase[dst]
    if red or elapsed[dst] < YELLOW_TICKS:
        return RED if red else YELLOW
    return GREEN


def render_frame(topo: GridRoad, sim, ax=None, env_index: int | None = None):
    """Draw one simulator snapshot onto a matplotlib Axes.

    ``sim`` is a SimState (single env, or batched with ``env_index``
    selecting the lane).  Works with both the full car layout
    (R, NPARAMS, S) and the compact (R, 3, S) fast-core layout, since
    row 0 is x in both."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    def get(leaf):
        a = np.asarray(leaf)
        return a[..., env_index] if env_index is not None else a

    cars = get(sim.cars)
    leading, lastcar = get(sim.leading), get(sim.lastcar)
    phase, elapsed = get(sim.phase), get(sim.elapsed)

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    L = topo.length
    for rid in range(topo.roads):
        (x0, y0), (x1, y1) = topo.locs[rid]
        ax.plot([x0, x1], [y0, y1],
                color=_road_color(topo, rid, phase, elapsed),
                linewidth=1.5, zorder=1)
        # occupied ring slots: distance-from-leading in [1, ncars]
        ncars = int((lastcar[rid] - leading[rid]) % RING)
        ux, uy = (x1 - x0) / L, (y1 - y0) / L
        for d in range(1, ncars + 1):
            slot = (int(leading[rid]) + d) % RING
            x = float(cars[rid, 0, slot])
            if not np.isfinite(x):
                continue
            a, b = max(x - CAR_LENGTH, 0.0), min(x, L)
            ax.plot([x0 + ux * a, x0 + ux * b],
                    [y0 + uy * a, y0 + uy * b],
                    color=CAR, linewidth=4, solid_capstyle="butt", zorder=2)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def save_frame(topo: GridRoad, sim, path: str, env_index: int | None = None):
    import matplotlib.pyplot as plt
    ax = render_frame(topo, sim, env_index=env_index)
    ax.figure.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(ax.figure)
    return path


def _iter_tick_frames(ticks, env_index: int):
    """Yield single-env SimState frames from a
    step_autoreset_lazy_ticks stack (SimState pytree with a leading
    tick axis, batch-trailing leaves).  Fetches only the rendered
    lane — one small device_get per agent step."""
    import jax
    lane = jax.device_get(jax.tree.map(
        lambda l: l[..., env_index] if l is not None else None, ticks))
    n = int(np.asarray(lane.steps).shape[0])
    for w in range(n):
        yield jax.tree.map(lambda l: l[w] if l is not None else None,
                           lane)


class EpisodeRenderer:
    """Collects one frame per agent step; writes PNGs (and a GIF when
    pillow is available)."""

    def __init__(self, topo: GridRoad, outdir: str, env_index: int = 0):
        self.topo, self.outdir, self.env_index = topo, outdir, env_index
        os.makedirs(outdir, exist_ok=True)
        self.frames: list[str] = []

    def add(self, sim):
        path = os.path.join(self.outdir, f"frame_{len(self.frames):04d}.png")
        save_frame(self.topo, sim, path, env_index=self.env_index)
        self.frames.append(path)
        return path

    def add_ticks(self, ticks):
        """--render_ticks: one frame per simulator tick."""
        for frame in _iter_tick_frames(ticks, self.env_index):
            path = os.path.join(self.outdir,
                                f"frame_{len(self.frames):04d}.png")
            save_frame(self.topo, frame, path, env_index=None)
            self.frames.append(path)

    def finish(self, gif_name: str = "episode.gif", duration_ms: int = 250):
        try:
            from PIL import Image
        except ImportError:
            return None
        if not self.frames:
            return None
        imgs = [Image.open(p) for p in self.frames]
        out = os.path.join(self.outdir, gif_name)
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=duration_ms, loop=0)
        return out


_ANSI_OF = {GREEN: "\x1b[32m", YELLOW: "\x1b[93m", RED: "\x1b[31m",
            ROAD: "\x1b[90m"}
_ANSI_CAR = "\x1b[96m"
_ANSI_NODE = "\x1b[37m"


class TermRenderer:
    """--render_live: watch the episode animate in the terminal.

    The reference pops a live pyglet window and redraws every simulator
    tick, sleeping rate/2 between frames (traffic_env.py:285-333, :332).
    A TPU host is headless, so the live view is an ANSI animation drawn
    from the same SimState snapshots the PNG renderer uses: roads as
    line cells colored by their light (green / yellow while
    ``elapsed < YELLOW_TICKS`` / red), cars as bright blocks positioned
    by their ``x`` along the road transform, opposing directions offset
    into their own lanes (the ``locs`` eps offsets, roadgraph.py:5-22).
    Same ``add``/``add_ticks``/``finish`` surface as EpisodeRenderer so
    the --render drivers can swap it in.
    """

    def __init__(self, topo: GridRoad, rate_s: float = 0.25,
                 cells_per_road: int = 12, env_index: int | None = 0,
                 out=None):
        import sys
        self.topo, self.rate_s, self.env_index = topo, rate_s, env_index
        self.K = cells_per_road            # horizontal cells per road
        self.Kv = max(cells_per_road // 2, 2)   # rows per road
        self.out = out or sys.stdout
        self.outdir = "<terminal>"   # drivers print "rendered N to {outdir}"
        self.frames: list[int] = []
        self._w = self._cx(topo.n) + 1
        self._h = self._cy(topo.m) + 1

    def _cx(self, gx: float) -> int:
        return int(round((gx + 1) * (self.K + 1)))

    def _cy(self, gy: float) -> int:
        return int(round((gy + 1) * (self.Kv + 1)))

    def _put(self, canvas, cy: int, cx: int, ch: str, color: str):
        if 0 <= cy < self._h and 0 <= cx < self._w:
            canvas[cy][cx] = (ch, color)

    @staticmethod
    def _lane_shift(g: float) -> tuple[int, int]:
        """(snapped grid coordinate, ±1 lane offset in cells) from a
        locs coordinate carrying the eps lane offset."""
        snap = int(round(g))
        d = g - snap
        return snap, (0 if abs(d) < 1e-6 else (1 if d > 0 else -1))

    def frame_str(self, sim, env_index: int | None = None) -> str:
        """One frame as an ANSI string (pure; tests call this)."""
        def get(leaf):
            a = np.asarray(leaf)
            return a[..., env_index] if env_index is not None else a

        cars = get(sim.cars)
        leading, lastcar = get(sim.leading), get(sim.lastcar)
        phase, elapsed = get(sim.phase), get(sim.elapsed)
        topo, L = self.topo, float(self.topo.length)
        canvas = [[(" ", "")] * self._w for _ in range(self._h)]

        for r in range(topo.m):
            for c in range(topo.n):
                self._put(canvas, self._cy(r), self._cx(c), "┼",
                          _ANSI_NODE)

        for rid in range(topo.roads):
            color = _ANSI_OF[_road_color(topo, rid, phase, elapsed)]
            (x0, y0), (x1, y1) = topo.locs[rid] / L
            horiz = abs(y1 - y0) < 0.25
            if horiz:
                snap, shift = self._lane_shift((y0 + y1) / 2)
                cy = self._cy(snap) + shift
                ca, cb = self._cx(x0), self._cx(x1)
                lo, hi = min(ca, cb), max(ca, cb)
                for cx in range(lo, hi + 1):
                    self._put(canvas, cy, cx, "─", color)
            else:
                snap, shift = self._lane_shift((x0 + x1) / 2)
                cx = self._cx(snap) + shift
                ca, cb = self._cy(y0), self._cy(y1)
                lo, hi = min(ca, cb), max(ca, cb)
                for cy in range(lo, hi + 1):
                    self._put(canvas, cy, cx, "│", color)
            # occupied ring slots, same walk as render_frame
            ncars = int((lastcar[rid] - leading[rid]) % RING)
            for d in range(1, ncars + 1):
                slot = (int(leading[rid]) + d) % RING
                x = float(cars[rid, 0, slot])
                if not np.isfinite(x):
                    continue
                f = min(max(x / L, 0.0), 1.0)
                if horiz:
                    self._put(canvas, cy, int(round(ca + (cb - ca) * f)),
                              "█", _ANSI_CAR)
                else:
                    self._put(canvas, int(round(ca + (cb - ca) * f)), cx,
                              "█", _ANSI_CAR)

        lines = []
        for row in canvas:
            parts, cur = [], None
            for ch, color in row:
                if color != cur:
                    parts.append("\x1b[0m" if not color else color)
                    cur = color
                parts.append(ch)
            parts.append("\x1b[0m")
            lines.append("".join(parts))
        return "\n".join(lines)

    def _show(self, frame, env_index):
        import time
        if not self.frames:
            self.out.write("\x1b[2J")         # clear once
        self.out.write("\x1b[H" + self.frame_str(frame, env_index)
                       + "\x1b[0m\n")
        self.out.flush()
        self.frames.append(len(self.frames))
        if self.rate_s:
            time.sleep(self.rate_s)

    def add(self, sim):
        self._show(sim, self.env_index)

    def add_ticks(self, ticks):
        for frame in _iter_tick_frames(ticks, self.env_index):
            self._show(frame, None)

    def finish(self, *a, **k):
        return None
