"""ctypes binding for the native C++ asset-loader core (SURVEY.md §2 N3).

Builds ``libig_assets.so`` from ``urdf_parser.cpp`` + ``mjcf_parser.cpp`` on
first use (g++, no external deps) and exposes :func:`parse_urdf_native` /
:func:`parse_mjcf_native`, both returning the same
:class:`isaacgym_tpu.models.urdf.UrdfModel` as the Python parsers. The
Python parsers remain the verified fallbacks (equivalence-tested in
tests/test_native.py); set ``ISAACGYM_TPU_NATIVE=0`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libig_assets.so")
_SRCS = [os.path.join(_DIR, "urdf_parser.cpp"),
         os.path.join(_DIR, "mjcf_parser.cpp")]
_HDRS = [os.path.join(_DIR, "xml_mini.h"), os.path.join(_DIR, "ig_asset.h")]

_lib = None
_build_err: Optional[str] = None


class _IgUrdf(ctypes.Structure):
    _fields_ = [
        ("n_links", ctypes.c_int),
        ("n_joints", ctypes.c_int),
        ("n_geoms", ctypes.c_int),
        ("link_mass", ctypes.POINTER(ctypes.c_double)),
        ("link_com", ctypes.POINTER(ctypes.c_double)),
        ("link_inertia", ctypes.POINTER(ctypes.c_double)),
        ("link_names", ctypes.POINTER(ctypes.c_char_p)),
        ("joint_kind", ctypes.POINTER(ctypes.c_int)),
        ("joint_parent", ctypes.POINTER(ctypes.c_int)),
        ("joint_child", ctypes.POINTER(ctypes.c_int)),
        ("joint_origin", ctypes.POINTER(ctypes.c_double)),
        ("joint_axis", ctypes.POINTER(ctypes.c_double)),
        ("joint_limit", ctypes.POINTER(ctypes.c_double)),
        ("joint_dynamics", ctypes.POINTER(ctypes.c_double)),
        ("joint_names", ctypes.POINTER(ctypes.c_char_p)),
        ("geom_link", ctypes.POINTER(ctypes.c_int)),
        ("geom_kind", ctypes.POINTER(ctypes.c_int)),
        ("geom_origin", ctypes.POINTER(ctypes.c_double)),
        ("geom_size", ctypes.POINTER(ctypes.c_double)),
        ("robot_name", ctypes.c_char_p),
    ]


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO] + _SRCS,
            check=True, capture_output=True, timeout=180)
        return None
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", b"") or b""
        return f"{exc}: {detail.decode(errors='replace')[:500]}"


def _load():
    global _lib, _build_err
    if _lib is not None or _build_err is not None:
        return _lib
    newest_src = max(os.path.getmtime(p) for p in _SRCS + _HDRS)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
        _build_err = _build()
        if _build_err is not None:
            return None
    lib = ctypes.CDLL(_SO)
    for fn in ("ig_parse_urdf", "ig_parse_mjcf"):
        getattr(lib, fn).restype = ctypes.POINTER(_IgUrdf)
        getattr(lib, fn).argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.ig_free_urdf.argtypes = [ctypes.POINTER(_IgUrdf)]
    _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("ISAACGYM_TPU_NATIVE", "1") == "0":
        return False
    return _load() is not None


def _unpack(lib, ptr):
    """IgUrdf* -> models.urdf.UrdfModel (shared by the URDF + MJCF cores)."""
    from isaacgym_tpu.models import urdf as U

    try:
        u = ptr.contents
        nL, nJ, nG = u.n_links, u.n_joints, u.n_geoms

        def arr(p, n):
            return np.ctypeslib.as_array(p, shape=(n,)).copy() if n else np.zeros(0)

        link_names = [u.link_names[i].decode() for i in range(nL)]
        links = {}
        mass = arr(u.link_mass, nL)
        com = arr(u.link_com, nL * 3).reshape(nL, 3)
        inertia = arr(u.link_inertia, nL * 9).reshape(nL, 3, 3)
        for i, name in enumerate(link_names):
            links[name] = U.Link(name=name, mass=float(mass[i]), com=com[i],
                                 inertia=inertia[i])
        if nG:
            geom_link = np.ctypeslib.as_array(u.geom_link, shape=(nG,)).copy()
            geom_kind = np.ctypeslib.as_array(u.geom_kind, shape=(nG,)).copy()
            geom_origin = arr(u.geom_origin, nG * 6).reshape(nG, 6)
            geom_size = arr(u.geom_size, nG * 3).reshape(nG, 3)
            kind_map = {0: U.GEOM_SPHERE, 1: U.GEOM_BOX, 2: U.GEOM_CYLINDER}
            for g in range(nG):
                links[link_names[int(geom_link[g])]].geoms.append(U.Geom(
                    kind=kind_map[int(geom_kind[g])],
                    xyz=geom_origin[g, :3], rpy=geom_origin[g, 3:],
                    size=geom_size[g]))

        joints = []
        j_origin = arr(u.joint_origin, nJ * 6).reshape(nJ, 6)
        j_axis = arr(u.joint_axis, nJ * 3).reshape(nJ, 3)
        j_limit = arr(u.joint_limit, nJ * 4).reshape(nJ, 4)
        j_dyn = arr(u.joint_dynamics, nJ * 3).reshape(nJ, 3)
        kind_map = {0: U.JOINT_FIXED, 1: U.JOINT_REVOLUTE, 2: U.JOINT_PRISMATIC}
        for j in range(nJ):
            joints.append(U.Joint(
                name=u.joint_names[j].decode(),
                kind=kind_map[int(u.joint_kind[j])],
                parent=link_names[u.joint_parent[j]],
                child=link_names[u.joint_child[j]],
                xyz=j_origin[j, :3], rpy=j_origin[j, 3:], axis=j_axis[j],
                lower=float(j_limit[j, 0]), upper=float(j_limit[j, 1]),
                effort=float(j_limit[j, 2]), velocity=float(j_limit[j, 3]),
                damping=float(j_dyn[j, 0]), friction=float(j_dyn[j, 1]),
                armature=float(j_dyn[j, 2]),
            ))

        children = {j.child for j in joints}
        roots = [n for n in link_names if n not in children]
        if len(roots) != 1:
            raise ValueError(f"expected one root, got {roots}")
        return U.UrdfModel(name=u.robot_name.decode(), links=links,
                           joints=joints, root=roots[0])
    finally:
        lib.ig_free_urdf(ptr)


def parse_urdf_native(path: str):
    """Parse URDF via the C++ core -> UrdfModel (raises on parse errors)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_err}")
    errbuf = ctypes.create_string_buffer(512)
    ptr = lib.ig_parse_urdf(path.encode(), errbuf, len(errbuf))
    if not ptr:
        raise ValueError(f"native URDF parse failed: {errbuf.value.decode()}")
    return _unpack(lib, ptr)


def parse_mjcf_native(path: str):
    """Parse MJCF via the C++ core -> UrdfModel (raises on parse errors)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_err}")
    errbuf = ctypes.create_string_buffer(512)
    ptr = lib.ig_parse_mjcf(path.encode(), errbuf, len(errbuf))
    if not ptr:
        raise ValueError(f"native MJCF parse failed: {errbuf.value.decode()}")
    return _unpack(lib, ptr)
