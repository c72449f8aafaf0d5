"""Explicit polar-hydrogen placement (protonation model).

Covers the role of the reference relax pipeline's pdbfixer protonation
step (DiffBindFR/relax/pl.py:38-120 adds hydrogens before the OpenMM
minimization so hydrogen bonds act directionally). Heavy atoms never
move here — only polar hydrogens are constructed, host-side NumPy, once
per pair (like the reference's pdbfixer call):

  * geometry-determined H's — backbone amide, Arg guanidinium, Asn/Gln
    amide, Trp/His ring N-H, secondary amines — are placed exactly from
    the covalent frame (sp2 in-plane / bisector constructions)
  * rotatable H's — Ser/Thr/Tyr hydroxyls, Lys ammonium, ligand
    hydroxyls & sp3 amines — scan their torsion and keep the rotamer
    maximizing a distance+angle H-bond gain against nearby acceptors
    (the hydrogen-bond-network optimization role of protonation tools)
  * ligand donor hydrogens come from the perceived bond graph + implied
    hydrogen counts (chem/mol.py valence model)

Downstream, ops/vina.py's angular H-bond term can swap its heavy-atom
cone axis for the explicit H direction (`build_receptor(...,
explicit_polar_h=True)`): the cone approximation is exact for ring/amide
N-H but poor for hydroxyls, whose H sits at ~109 deg off the O-C bond,
not opposite it.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import residues as rc

NH_LEN = 1.01
OH_LEN = 0.96
SH_LEN = 1.34
# torsion grid for rotatable hydrogens
N_ROT_SAMPLES = 24

# residue -> {donor atom: (kind, params)}
#   kind 'sp2_1H'  : one in-plane H bisecting / opposing the two neighbors
#   kind 'sp2_2H'  : two in-plane H at +-120 deg from the single neighbor
#   kind 'rot_OH'  : one rotatable H at 109.5 deg off the single bond
#   kind 'rot_NH3' : three rotatable staggered H at 109.5 deg
_SIDECHAIN_DONOR_H = {
    "ARG": {"NE": "sp2_1H", "NH1": "sp2_2H", "NH2": "sp2_2H"},
    "ASN": {"ND2": "sp2_2H"},
    "GLN": {"NE2": "sp2_2H"},
    "HIS": {"ND1": "sp2_1H", "NE2": "sp2_1H"},
    "LYS": {"NZ": "rot_NH3"},
    "SER": {"OG": "rot_OH"},
    "THR": {"OG1": "rot_OH"},
    "TRP": {"NE1": "sp2_1H"},
    "TYR": {"OH": "rot_OH"},
    "CYS": {"SG": "rot_OH"},  # thiol: same construction, longer bond
}
# neighbor atoms used to build each donor's covalent frame
_DONOR_NEIGHBORS = {
    ("ARG", "NE"): ("CD", "CZ"),
    ("ARG", "NH1"): ("CZ", "NE"),
    ("ARG", "NH2"): ("CZ", "NE"),
    ("ASN", "ND2"): ("CG", "OD1"),
    ("GLN", "NE2"): ("CD", "OE1"),
    ("HIS", "ND1"): ("CG", "CE1"),
    ("HIS", "NE2"): ("CD2", "CE1"),
    ("LYS", "NZ"): ("CE", "CD"),
    ("SER", "OG"): ("CB", "CA"),
    ("THR", "OG1"): ("CB", "CA"),
    ("TRP", "NE1"): ("CD1", "CE2"),
    ("TYR", "OH"): ("CZ", "CE1"),
    ("CYS", "SG"): ("CB", "CA"),
}


@dataclasses.dataclass
class PolarHydrogens:
    """Flat explicit-H set. `parent` indexes the donor heavy atom:
    r*14+slot for proteins, the atom index for ligands."""

    pos: np.ndarray  # [M, 3]
    parent: np.ndarray  # [M] int
    # rotatable groups: list of (member H row indices, axis_origin xyz,
    # axis_dir unit xyz) — members rotate rigidly about the axis
    rot_groups: list


def _unit(v, eps=1e-9):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + eps)


def _rodrigues(v, axis, angle):
    """Rotate v about unit axis by angle (radians)."""
    c, s = np.cos(angle), np.sin(angle)
    return (v * c + np.cross(axis, v) * s
            + axis * np.dot(axis, v) * (1.0 - c))


def _sp2_1h(x, b1, b2, blen):
    """H opposite the bisector of the two bonds (ring N-H, sec. amine)."""
    d = -( _unit(b1 - x) + _unit(b2 - x))
    n = np.linalg.norm(d)
    if n < 1e-6:
        return None
    return x + d / n * blen


def _sp2_2h(x, b, ref, blen):
    """Two in-plane H's at +-120 deg from the X->B bond, in the plane of
    (X, B, ref) — amide / guanidinium NH2."""
    u = _unit(b - x)
    n = np.cross(u, _unit(ref - x))
    nn = np.linalg.norm(n)
    if nn < 1e-6:  # colinear fallback: any perpendicular
        n = np.cross(u, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(n) < 1e-6:
            n = np.cross(u, np.array([0.0, 1.0, 0.0]))
        nn = np.linalg.norm(n)
    n = n / nn
    h1 = _rodrigues(u, n, np.deg2rad(120.0))
    h2 = _rodrigues(u, n, np.deg2rad(-120.0))
    return [x + h1 * blen, x + h2 * blen]


def _tetra_h(x, b, ref, blen, n_h):
    """n_h staggered H's at 109.5 deg off the X->B axis; torsion zero is
    anti to ref. Returns (positions, axis_origin, axis_dir)."""
    u = _unit(b - x)  # axis X->B; H's tilt away from it
    p = _unit(ref - b) if ref is not None else np.array([1.0, 0.0, 0.0])
    perp = p - u * np.dot(p, u)
    if np.linalg.norm(perp) < 1e-6:
        perp = np.cross(u, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(perp) < 1e-6:
            perp = np.cross(u, np.array([0.0, 1.0, 0.0]))
    perp = _unit(perp)
    tilt = np.deg2rad(180.0 - 109.5)
    base = _rodrigues(-u, perp, tilt)  # 109.5 deg from the X->B bond
    step = 2.0 * np.pi / max(n_h, 1)
    hs = [x + _rodrigues(base, u, np.pi + k * step) * blen
          for k in range(n_h)]
    return hs, x, u


def protein_polar_h(aatype, atom14_pos, atom14_mask) -> PolarHydrogens:
    """Place polar hydrogens on an atom14 protein/pocket (pocket frame).

    Backbone amide H uses the previous residue's carbonyl C when the
    chain is contiguous (|C_prev - N| < 2 A), else falls back to the
    in-residue bisector construction.
    """
    aatype = np.asarray(aatype)
    pos = np.asarray(atom14_pos, np.float64)
    msk = np.asarray(atom14_mask) > 0
    nres = aatype.shape[0]
    h_pos, h_parent, rot_groups = [], [], []

    def slot(res3, name):
        names = rc.restype_name_to_atom14_names[res3]
        return names.index(name) if name in names else -1

    for r in range(nres):
        ri = int(aatype[r])
        if ri >= len(rc.restypes):
            continue
        res3 = rc.restype_1to3[rc.restypes[ri]]
        # ---- backbone amide (PRO has none)
        if res3 != "PRO" and msk[r, 0] and msk[r, 1]:
            n_xyz, ca_xyz = pos[r, 0], pos[r, 1]
            c_prev = None
            if r > 0 and msk[r - 1, 2]:
                cp = pos[r - 1, 2]
                if np.linalg.norm(cp - n_xyz) < 2.0:
                    c_prev = cp
            h = (_sp2_1h(n_xyz, ca_xyz, c_prev, NH_LEN)
                 if c_prev is not None else
                 n_xyz + _unit(n_xyz - ca_xyz) * NH_LEN)
            if h is not None:
                h_pos.append(h)
                h_parent.append(r * 14 + 0)
        # ---- side chains
        for name, kind in _SIDECHAIN_DONOR_H.get(res3, {}).items():
            sx = slot(res3, name)
            nb1, nb2 = _DONOR_NEIGHBORS[(res3, name)]
            s1, s2 = slot(res3, nb1), slot(res3, nb2)
            if sx < 0 or s1 < 0 or not (msk[r, sx] and msk[r, s1]):
                continue
            x, b1 = pos[r, sx], pos[r, s1]
            b2 = pos[r, s2] if (s2 >= 0 and msk[r, s2]) else None
            blen = (OH_LEN if name[0] == "O"
                    else SH_LEN if name[0] == "S" else NH_LEN)
            if kind == "sp2_1H":
                if b2 is None:
                    continue
                h = _sp2_1h(x, b1, b2, blen)
                if h is not None:
                    h_pos.append(h)
                    h_parent.append(r * 14 + sx)
            elif kind == "sp2_2H":
                if b2 is None:
                    continue
                for h in _sp2_2h(x, b1, b2, blen):
                    h_pos.append(h)
                    h_parent.append(r * 14 + sx)
            else:  # rot_OH / rot_NH3
                n_h = 3 if kind == "rot_NH3" else 1
                hs, ax_o, ax_d = _tetra_h(x, b1, b2, blen, n_h)
                rows = list(range(len(h_pos), len(h_pos) + n_h))
                for h in hs:
                    h_pos.append(h)
                    h_parent.append(r * 14 + sx)
                rot_groups.append((rows, ax_o, ax_d))

    return PolarHydrogens(
        pos=(np.asarray(h_pos, np.float32) if h_pos
             else np.zeros((0, 3), np.float32)),
        parent=np.asarray(h_parent, np.int32),
        rot_groups=rot_groups,
    )


def ligand_polar_h(elements, pos, bonds, bond_orders,
                   implicit_h) -> PolarHydrogens:
    """Place donor hydrogens on a perceived ligand (N/O/S with implied
    H's). sp2 centers (any multiple-order bond at the atom) use in-plane
    constructions; sp3 single-neighbor groups are rotatable."""
    pos = np.asarray(pos, np.float64)
    na = pos.shape[0]
    nbrs: list = [[] for _ in range(na)]
    order_at = np.zeros(na)
    for (a, b), o in zip(np.asarray(bonds, int), np.asarray(bond_orders)):
        nbrs[a].append(b)
        nbrs[b].append(a)
        order_at[a] = max(order_at[a], o)
        order_at[b] = max(order_at[b], o)
    h_pos, h_parent, rot_groups = [], [], []
    for i in range(na):
        nh = int(implicit_h[i])
        if nh <= 0 or elements[i] not in ("N", "O", "S"):
            continue
        blen = (OH_LEN if elements[i] == "O"
                else SH_LEN if elements[i] == "S" else NH_LEN)
        bs = nbrs[i]
        sp2 = order_at[i] > 1.01  # any double/aromatic bond at the atom
        if len(bs) >= 3 and nh >= 1:
            d = -sum(_unit(pos[b] - pos[i]) for b in bs[:3])
            if np.linalg.norm(d) > 1e-6:
                h_pos.append(pos[i] + _unit(d) * blen)
                h_parent.append(i)
        elif len(bs) == 2 and nh >= 1:
            h = _sp2_1h(pos[i], pos[bs[0]], pos[bs[1]], blen)
            if h is not None:
                h_pos.append(h)
                h_parent.append(i)
        elif len(bs) == 1:
            b1 = pos[bs[0]]
            ref_cands = [c for c in nbrs[bs[0]] if c != i]
            ref = pos[ref_cands[0]] if ref_cands else None
            if sp2 and nh >= 2 and ref is not None:
                for h in _sp2_2h(pos[i], b1, ref, blen):
                    h_pos.append(h)
                    h_parent.append(i)
            elif sp2 and nh == 1 and ref is not None:
                # imine-like: one in-plane H anti to ref
                u = _unit(b1 - pos[i])
                n = _unit(np.cross(u, _unit(ref - pos[i])))
                h_pos.append(
                    pos[i] + _rodrigues(u, n, np.deg2rad(120.0)) * blen)
                h_parent.append(i)
            else:
                hs, ax_o, ax_d = _tetra_h(pos[i], b1, ref, blen,
                                          min(nh, 3))
                rows = list(range(len(h_pos), len(h_pos) + min(nh, 3)))
                for h in hs:
                    h_pos.append(h)
                    h_parent.append(i)
                rot_groups.append((rows, ax_o, ax_d))
    return PolarHydrogens(
        pos=(np.asarray(h_pos, np.float32) if h_pos
             else np.zeros((0, 3), np.float32)),
        parent=np.asarray(h_parent, np.int32),
        rot_groups=rot_groups,
    )


def optimize_rotatable(ph: PolarHydrogens, acceptor_pos,
                       acceptor_parent_pos=None) -> PolarHydrogens:
    """Pick each rotatable group's torsion maximizing an H-bond gain
    against `acceptor_pos` [K, 3]: sum over (H, acceptor) of a distance
    ramp (full gain at <= 2.0 A H..A, zero at 3.2 A) times the D-H..A
    alignment (cos, clipped at 0). In-place on a copy; returns it."""
    acc = np.asarray(acceptor_pos, np.float64)
    out = np.array(ph.pos, np.float64)
    if acc.shape[0] == 0 or not ph.rot_groups:
        return PolarHydrogens(out.astype(np.float32), ph.parent,
                              ph.rot_groups)
    for rows, ax_o, ax_d in ph.rot_groups:
        best, best_score = None, -1.0
        base = out[rows] - ax_o
        for k in range(N_ROT_SAMPLES):
            ang = 2.0 * np.pi * k / N_ROT_SAMPLES
            cand = np.stack(
                [_rodrigues(v, ax_d, ang) for v in base]) + ax_o
            # D-H..A geometry vs every acceptor
            hv = cand[:, None, :] - acc[None, :, :]
            dist = np.linalg.norm(hv, axis=-1)
            ramp = np.clip((3.2 - dist) / 1.2, 0.0, 1.0)
            dh = _unit(cand - ax_o)  # donor->H
            cosa = np.sum(-_unit(hv) * dh[:, None, :], axis=-1)
            score = float(np.sum(ramp * np.clip(cosa, 0.0, 1.0)))
            if score > best_score:
                best, best_score = cand, score
        out[rows] = best
    return PolarHydrogens(out.astype(np.float32), ph.parent,
                          ph.rot_groups)


def donor_h_axes(ph: PolarHydrogens, parent_pos, n_parents: int):
    """Per-parent mean H direction: [n_parents, 3] unit axes + [n_parents]
    has-flags, for ops/vina.py's angular H-bond term (replaces the
    heavy-atom cone axis with the explicit H direction)."""
    axes = np.zeros((n_parents, 3), np.float64)
    cnt = np.zeros(n_parents)
    pp = np.asarray(parent_pos, np.float64)
    for h, p in zip(ph.pos, ph.parent):
        axes[p] += _unit(h - pp[p])
        cnt[p] += 1
    has = cnt > 0
    axes[has] = _unit(axes[has] / cnt[has, None])
    return axes.astype(np.float32), has.astype(np.float32)
