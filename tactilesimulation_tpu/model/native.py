"""ctypes bindings for the native (C++) model compiler.

The reference performs model compilation in its C++ core (SURVEY.md C1); this
module exposes our C++ implementation (native/model_compiler.cpp) to Python
and converts its output into a ``SceneSpec``-equivalent ``(Structure, Model)``
pair via the same flattening path as the Python front-end. The Python parser
(xml_parser.py) remains the reference implementation; the native one is
cross-validated against it in tests/test_native_compiler.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libtsim_model.so")


def build_native(force: bool = False) -> str:
    """Compile the shared library (cmake + make) if needed."""
    src = os.path.join(_NATIVE_DIR, "model_compiler.cpp")
    if (os.path.exists(_SO_PATH) and not force
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src)):
        return _SO_PATH
    build_dir = os.path.join(_NATIVE_DIR, "build")
    subprocess.run(["cmake", "-B", build_dir, "-S", _NATIVE_DIR,
                    "-DCMAKE_BUILD_TYPE=Release"], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", build_dir, "-j"], check=True,
                   capture_output=True)
    return _SO_PATH


def _lib():
    global _LIB
    if _LIB is None:
        path = build_native()
        lib = ctypes.CDLL(path)
        lib.tsim_compile.restype = ctypes.c_void_p
        lib.tsim_compile.argtypes = [ctypes.c_char_p, ctypes.c_double]
        lib.tsim_error.restype = ctypes.c_char_p
        lib.tsim_error.argtypes = [ctypes.c_void_p]
        lib.tsim_free.argtypes = [ctypes.c_void_p]
        lib.tsim_timestep.restype = ctypes.c_double
        lib.tsim_solver_tol.restype = ctypes.c_double
        for name in ("tsim_timestep", "tsim_solver_tol"):
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name in ("tsim_integrator", "tsim_has_ground", "tsim_njoints",
                     "tsim_nbodies", "tsim_ndof", "tsim_npoints",
                     "tsim_npairs", "tsim_nmotors", "tsim_nsensors",
                     "tsim_nmarkers", "tsim_nee", "tsim_solver_max_iter"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p]
        for name in ("gravity", "ground_pos", "ground_normal"):
            fn = getattr(lib, f"tsim_{name}")
            fn.restype = ctypes.POINTER(ctypes.c_double)
            fn.argtypes = [ctypes.c_void_p]
        for name in ("joint_names", "body_names", "tac_names", "ee_names"):
            fn = getattr(lib, f"tsim_{name}")
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p]
        for name in _DOUBLE_ARRAYS | _INT_ARRAYS:
            fn = getattr(lib, f"tsim_{name}")
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


_DOUBLE_ARRAYS = {
    "joint_pos", "joint_quat", "joint_axis0", "joint_axis1", "joint_damping",
    "joint_lim_lower", "joint_lim_upper", "joint_lim_stiffness", "body_pos",
    "body_quat", "body_size", "body_mass", "body_inertia", "cp_pos",
    "pair_params", "motor_P", "motor_D", "motor_lo", "motor_hi", "tac_pos",
    "tac_normal", "tac_axis0", "tac_axis1", "tac_params", "ee_pos",
}
_INT_ARRAYS = {
    "joint_type", "joint_parent", "body_gtype", "body_joint", "cp_body",
    "pair_general", "pair_primitive", "motor_joint", "motor_is_position",
    "tac_body", "tac_count", "tac_image_pos", "ee_joint",
}


def _names(ptr, n):
    if n == 0:
        return []
    out = []
    raw = ctypes.cast(ptr, ctypes.c_char_p)
    addr = ctypes.cast(ptr, ctypes.c_void_p).value
    for _ in range(n):
        s = ctypes.string_at(addr).decode()
        out.append(s)
        addr += len(s.encode()) + 1
    del raw
    return out


class NativeModel:
    """Raw output of the native compiler as numpy arrays + name lists."""

    def __init__(self, path: str, mesh_fallback_extent: float = 0.04):
        lib = _lib()
        self._blob = lib.tsim_compile(path.encode(),
                                      ctypes.c_double(mesh_fallback_extent))
        err = lib.tsim_error(self._blob)
        if err:
            msg = err.decode()
            lib.tsim_free(self._blob)
            self._blob = None
            raise RuntimeError(f"native compile failed: {msg}")
        g = lambda n: getattr(lib, f"tsim_{n}")(self._blob)
        self.timestep = g("timestep")
        self.integrator = "BDF2" if g("integrator") == 2 else "BDF1"
        self.has_ground = bool(g("has_ground"))
        self.solver_tol = g("solver_tol")
        self.solver_max_iter = g("solver_max_iter")
        self.njoints = g("njoints")
        self.nbodies = g("nbodies")
        self.ndof = g("ndof")
        self.npoints = g("npoints")
        self.npairs = g("npairs")
        self.nmotors = g("nmotors")
        self.nsensors = g("nsensors")
        self.nmarkers = g("nmarkers")
        self.nee = g("nee")
        self.gravity = np.ctypeslib.as_array(lib.tsim_gravity(self._blob),
                                             (3,)).copy()
        self.ground_pos = np.ctypeslib.as_array(
            lib.tsim_ground_pos(self._blob), (3,)).copy()
        self.ground_normal = np.ctypeslib.as_array(
            lib.tsim_ground_normal(self._blob), (3,)).copy()

        counts = {
            "joint_pos": 3 * self.njoints, "joint_quat": 4 * self.njoints,
            "joint_axis0": 3 * self.njoints, "joint_axis1": 3 * self.njoints,
            "joint_damping": self.njoints, "joint_lim_lower": self.njoints,
            "joint_lim_upper": self.njoints,
            "joint_lim_stiffness": self.njoints,
            "body_pos": 3 * self.nbodies, "body_quat": 4 * self.nbodies,
            "body_size": 3 * self.nbodies, "body_mass": self.nbodies,
            "body_inertia": 3 * self.nbodies, "cp_pos": 3 * self.npoints,
            "pair_params": 4 * self.npairs, "motor_P": self.nmotors,
            "motor_D": self.nmotors, "motor_lo": self.nmotors,
            "motor_hi": self.nmotors, "tac_pos": 3 * self.nmarkers,
            "tac_normal": 3 * self.nmarkers, "tac_axis0": 3 * self.nmarkers,
            "tac_axis1": 3 * self.nmarkers, "tac_params": 4 * self.nsensors,
            "ee_pos": 3 * self.nee,
            "joint_type": self.njoints, "joint_parent": self.njoints,
            "body_gtype": self.nbodies, "body_joint": self.nbodies,
            "cp_body": self.npoints, "pair_general": self.npairs,
            "pair_primitive": self.npairs, "motor_joint": self.nmotors,
            "motor_is_position": self.nmotors, "tac_body": self.nsensors,
            "tac_count": self.nsensors, "tac_image_pos": 2 * self.nmarkers,
            "ee_joint": self.nee,
        }
        for name, n in counts.items():
            ptr = getattr(lib, f"tsim_{name}")(self._blob)
            ctype = (ctypes.c_double if name in _DOUBLE_ARRAYS
                     else ctypes.c_int)
            if n == 0:
                arr = np.zeros(0, dtype=np.float64 if name in _DOUBLE_ARRAYS
                               else np.int32)
            else:
                arr = np.ctypeslib.as_array(
                    ctypes.cast(ptr, ctypes.POINTER(ctype)), (n,)).copy()
            setattr(self, name, arr)

        self.joint_names = _names(lib.tsim_joint_names(self._blob),
                                  self.njoints)
        self.body_names = _names(lib.tsim_body_names(self._blob), self.nbodies)
        self.tac_names = _names(lib.tsim_tac_names(self._blob), self.nsensors)
        self.ee_names = _names(lib.tsim_ee_names(self._blob), self.nee)

    def __del__(self):
        if getattr(self, "_blob", None):
            _lib().tsim_free(self._blob)


def compile_scene(path: str, mesh_fallback_extent: float = 0.04) -> NativeModel:
    return NativeModel(path, mesh_fallback_extent)
