"""ctypes binding for the native fastio library (native/fastio.cpp).

Builds libfastio.so with g++ on first use (cached next to the package);
every entry point has a pure-Python fallback, so the native layer is a
transparent accelerator for the prep stage, never a hard dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..constants import residues as rc

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "fastio.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libfastio.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    cp = ctypes.c_char_p
    lib.fp_parse_pdb.restype = ctypes.c_int
    lib.fp_parse_pdb.argtypes = [cp, cp, ctypes.c_int, f32p, f32p, f32p,
                                 i32p, cp, cp, cp]
    lib.fp_parse_sdf_v2000.restype = ctypes.c_int
    lib.fp_parse_sdf_v2000.argtypes = [cp, ctypes.c_int, ctypes.c_int, f32p,
                                       cp, i32p, i32p, i32p, i32p]
    lib.fp_pocket_hits.restype = None
    lib.fp_pocket_hits.argtypes = [f32p, i32p, ctypes.c_int, f32p,
                                   ctypes.c_int, ctypes.c_float, u8p]
    _lib = lib
    return _lib


_A37_NAMES = "".join(f"{n:<4}" for n in rc.atom37_names).encode()


def parse_pdb_native(path: str, max_res: int = 20000):
    """Protein-or-None: atom37 arrays parsed in C++."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.zeros((max_res, 37, 3), np.float32)
    mask = np.zeros((max_res, 37), np.float32)
    bfac = np.zeros((max_res, 37), np.float32)
    resnum = np.zeros(max_res, np.int32)
    chains = ctypes.create_string_buffer(max_res)
    icodes = ctypes.create_string_buffer(max_res)
    resnames = ctypes.create_string_buffer(max_res * 3)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    n = lib.fp_parse_pdb(
        path.encode(), _A37_NAMES, max_res,
        pos.ctypes.data_as(f32p), mask.ctypes.data_as(f32p),
        bfac.ctypes.data_as(f32p), resnum.ctypes.data_as(i32p),
        chains, icodes, resnames,
    )
    if n < 0:
        return None
    from .pdb import Protein

    rn = [resnames.raw[3 * i : 3 * i + 3].decode().strip() for i in range(n)]
    ch = [chains.raw[i : i + 1].decode() for i in range(n)]
    ic = [icodes.raw[i : i + 1].decode() or " " for i in range(n)]
    chain_ids: list = []
    chain_idx = np.zeros(n, np.int64)
    for i, c in enumerate(ch):
        if c not in chain_ids:
            chain_ids.append(c)
        chain_idx[i] = chain_ids.index(c)
    aatype = np.array([rc.aatype_from_resname(r) for r in rn], np.int64)
    return Protein(
        atom_positions=pos[:n],
        atom_mask=mask[:n],
        aatype=aatype,
        residue_index=resnum[:n].astype(np.int64),
        chain_index=chain_idx,
        b_factors=bfac[:n],
        chain_ids=chain_ids,
        resnames=rn,
        insertion_codes=ic,
    )


def pocket_hits_native(atom_xyz, atom_res, n_res, ref_xyz, cutoff):
    """[n_res] bool: residue has any atom within cutoff of ref points."""
    lib = get_lib()
    if lib is None:
        return None
    atom_xyz = np.ascontiguousarray(atom_xyz, np.float32)
    atom_res = np.ascontiguousarray(atom_res, np.int32)
    ref_xyz = np.ascontiguousarray(ref_xyz, np.float32)
    hit = np.zeros(n_res, np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.fp_pocket_hits(
        atom_xyz.ctypes.data_as(f32p), atom_res.ctypes.data_as(i32p),
        int(atom_xyz.shape[0]), ref_xyz.ctypes.data_as(f32p),
        int(ref_xyz.shape[0]), float(cutoff), hit.ctypes.data_as(u8p),
    )
    return hit.astype(bool)
