"""ctypes bindings for the native deployment runtime (native/locoman_runtime.cc).

Builds the shared library on first use if it isn't present (g++ one-liner,
like the reference's codegen/README.md gcc instructions); falls back loudly
if no toolchain is available.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "locoman_runtime.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "liblocoman_runtime.so")


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
         "-lpthread"],
        check=True,
    )


def lib():
    global _LIB
    if _LIB is None:
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            _build()
        _LIB = ctypes.CDLL(_SO)
        _LIB.locoman_spline_vel_z.restype = ctypes.c_double
        _LIB.locoman_ring_create.restype = ctypes.c_void_p
        _LIB.locoman_ring_read_latest.restype = ctypes.c_uint64
        _LIB.locoman_pack_params.restype = ctypes.c_int
    return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


GAIT_IDS = {"trot": 0, "walk": 1, "stand": 2}


def geometric_dts(dt_min, dt_max, nodes):
    out = np.zeros(nodes)
    lib().locoman_geometric_dts(
        ctypes.c_double(dt_min), ctypes.c_double(dt_max), nodes, _dptr(out)
    )
    return out


def gait_schedule(gait_type, gait_period, t_current, dts):
    nodes = len(dts)
    dts = np.ascontiguousarray(dts, dtype=np.float64)
    contact = np.zeros((4, nodes))
    swing = np.zeros((4, nodes))
    lib().locoman_gait_schedule(
        GAIT_IDS[gait_type], ctypes.c_double(gait_period),
        ctypes.c_double(t_current), _dptr(dts), nodes,
        _dptr(contact), _dptr(swing),
    )
    return contact, swing


def spline_vel_z(swing_phase, swing_period, h_max=0.1, v_liftoff=0.1,
                 v_touchdown=-0.2):
    return lib().locoman_spline_vel_z(
        ctypes.c_double(swing_phase), ctypes.c_double(swing_period),
        ctypes.c_double(h_max), ctypes.c_double(v_liftoff),
        ctypes.c_double(v_touchdown),
    )


def pack_params(x_init, contact, swing, base_vel_des, ext_force_des,
                arm_vel_des, tau_prev):
    x_init = np.ascontiguousarray(x_init, dtype=np.float64)
    contact = np.ascontiguousarray(contact, dtype=np.float64)
    swing = np.ascontiguousarray(swing, dtype=np.float64)
    nodes = contact.shape[1]
    nj = len(tau_prev)
    out = np.zeros(len(x_init) + 8 * nodes + 12 + nj)
    n = lib().locoman_pack_params(
        _dptr(x_init), len(x_init), _dptr(contact), _dptr(swing), nodes,
        _dptr(np.ascontiguousarray(base_vel_des, dtype=np.float64)),
        _dptr(np.ascontiguousarray(ext_force_des, dtype=np.float64)),
        _dptr(np.ascontiguousarray(arm_vel_des, dtype=np.float64)),
        _dptr(np.ascontiguousarray(tau_prev, dtype=np.float64)), nj,
        _dptr(out),
    )
    return out[:n]


class StateRing:
    """Lock-free latest-value buffer for robot-state ingestion."""

    def __init__(self, width, slots=8):
        self.width = width
        self._ring = ctypes.c_void_p(lib().locoman_ring_create(slots, width))

    def push(self, value):
        v = np.ascontiguousarray(value, dtype=np.float64)
        assert v.size == self.width
        lib().locoman_ring_push(self._ring, _dptr(v))

    def read_latest(self):
        out = np.zeros(self.width)
        seq = lib().locoman_ring_read_latest(self._ring, _dptr(out))
        return (out, int(seq)) if seq else (None, 0)

    def __del__(self):
        try:
            lib().locoman_ring_destroy(self._ring)
        except Exception:
            pass
