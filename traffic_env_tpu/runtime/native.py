"""ctypes binding + build for the native simulator core.

Builds traffic_native.cpp into a cached shared library on first use.
Compile flags matter for parity: -fno-fast-math -ffp-contract=off keep
every float32 op IEEE and un-fused, matching the NumPy oracle and the
guarded XLA kernels bit-for-bit.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "traffic_native.cpp")
_FLAGS = ["-O2", "-shared", "-fPIC", "-std=c++17",
          "-fno-fast-math", "-ffp-contract=off"]


def _build() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read() + " ".join(_FLAGS).encode()).hexdigest()[:16]
    out = os.path.join(_DIR, f"_traffic_native_{tag}.so")
    if not os.path.exists(out):
        subprocess.run(["g++", *_FLAGS, _SRC, "-o", out + ".tmp"],
                       check=True)
        os.replace(out + ".tmp", out)
    return out


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sim_create.restype = ctypes.c_void_p
    lib.sim_create.argtypes = [ctypes.c_int] * 5 + [ctypes.c_float,
                               i32p, i32p, i32p, ctypes.c_float,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sim_destroy.argtypes = [ctypes.c_void_p]
    lib.sim_reset.argtypes = [ctypes.c_void_p, i32p]
    lib.sim_step.restype = ctypes.c_int
    lib.sim_step.argtypes = [ctypes.c_void_p, i32p, i32p, ctypes.c_int,
                             i32p, f32p]
    lib.sim_remi.argtypes = [ctypes.c_void_p, f32p]
    lib.sim_run.restype = ctypes.c_int64
    lib.sim_run.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                            ctypes.c_int, ctypes.c_int, i32p,
                            ctypes.c_int]
    lib.sim_cars_per_road.argtypes = [ctypes.c_void_p, i32p]
    lib.sim_trip_count.restype = ctypes.c_int
    lib.sim_trip_count.argtypes = [ctypes.c_void_p]
    lib.sim_trips.argtypes = [ctypes.c_void_p, f32p]
    lib.sim_generated.restype = ctypes.c_int64
    lib.sim_generated.argtypes = [ctypes.c_void_p]
    lib.sim_get_pointers.argtypes = [ctypes.c_void_p, i32p, i32p]
    lib.sim_get_cars.argtypes = [ctypes.c_void_p, f32p]
    _lib = lib
    return lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32))


class NativeSim:
    """Reference-semantics simulator backed by the C++ core.  Spawns
    are data-driven per tick (entry-road lists), so callers keep RNG
    parity by building streams with envs/spawn.py."""

    def __init__(self, topo, cfg, validate: bool = False):
        self.lib = _load()
        self.topo = topo
        self.cfg = cfg
        R, Rt, I = topo.roads, topo.train_roads, topo.intersections
        self._obs = np.zeros(2 * Rt + 2 * I, np.int32)
        self._rew = np.zeros(I, np.float32)
        self._h = self.lib.sim_create(
            R, Rt, I, topo.m, topo.n, ctypes.c_float(float(topo.length)),
            _i32(topo.dest), _i32(topo.nxt), _i32(topo.phase_group),
            ctypes.c_float(cfg.rate), int(cfg.learn_switch), int(validate),
            int(getattr(cfg, "decel_penalty", False)))

    def __del__(self):
        if getattr(self, "_h", None):
            self.lib.sim_destroy(self._h)
            self._h = None

    def reset(self, phase):
        self.lib.sim_reset(self._h, _i32(phase))
        return self.obs()

    def step(self, action, spawn_roads=()):
        roads = np.ascontiguousarray(spawn_roads, np.int32)
        done = self.lib.sim_step(
            self._h, _i32(action), _i32(roads), len(roads),
            self._obs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._rew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return self._obs.copy(), self._rew.copy(), bool(done), None

    def obs(self):
        # obs refreshed by step; after reset compose from pointers
        return self._obs.copy()

    def run(self, actions, spawn_off, spawn_roads, remi_every,
            reset_phases):
        """T ticks entirely inside C++ (benchmark driver; see sim_run).
        actions: (T, I) int32; spawn_off: (T+1,) prefix offsets into
        spawn_roads; reset_phases: (K, I) cycled per overflow reset.
        Returns the reset count."""
        actions = np.ascontiguousarray(actions, np.int32)
        reset_phases = np.ascontiguousarray(reset_phases, np.int32)
        return int(self.lib.sim_run(
            self._h, _i32(actions), _i32(spawn_off), _i32(spawn_roads),
            int(actions.shape[0]), int(remi_every), _i32(reset_phases),
            int(reset_phases.shape[0])))

    def remi_reward(self):
        self.lib.sim_remi(self._h, self._rew.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
        return self._rew.copy()

    def cars_per_road(self):
        out = np.zeros(self.topo.roads, np.int32)
        self.lib.sim_cars_per_road(self._h, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)))
        return out

    def trip_times(self):
        n = self.lib.sim_trip_count(self._h)
        out = np.zeros(n, np.float32)
        if n:
            self.lib.sim_trips(self._h, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
        return out

    @property
    def generated_cars(self):
        return int(self.lib.sim_generated(self._h))

    def pointers(self):
        R = self.topo.roads
        lead = np.zeros(R, np.int32)
        last = np.zeros(R, np.int32)
        self.lib.sim_get_pointers(self._h, _i32_view(lead), _i32_view(last))
        return lead, last

    def raw_cars(self):
        R = self.topo.roads
        out = np.zeros((R, 10, 20), np.float32)
        self.lib.sim_get_cars(self._h, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
        return out


def _i32_view(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
