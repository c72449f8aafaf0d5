"""Secondary structure + solvent accessibility without external binaries.

The reference shells out to vendored mkdssp and msms executables for the
optional `use_ss` / MSMS residue features (druglib/ops/dssp, druglib/ops/
msms; consumed by pdb_parser at druglib/utils/obj/protein.py:807-830 and
OFF in the shipped inference config). Here both are reimplemented:

  * assign_ss: Kabsch–Sander hydrogen-bond energies (the DSSP criterion,
    E = 0.084 q1 q2 332 (1/rON + 1/rCH - 1/rOH - 1/rCN) < -0.5 kcal/mol,
    amide H rebuilt from backbone geometry) + the H/E/C pattern rules
    (4-turn helices, parallel/antiparallel bridges).
  * backbone_dihedrals: phi/psi.
  * shrake_rupley_sasa: per-residue solvent accessible surface area and
    relative accessibility (the MSMS/SASA substitute).
  * residue_depth: mean distance of a residue's atoms to the solvent-
    accessible surface (the Bio.PDB.ResidueDepth/MSMS role, reference
    protein.py:822-830), from the same Shrake-Rupley sphere points.
"""
from __future__ import annotations

import numpy as np

from ..constants import residues as rc

_QQ = 0.084 * 332.0  # Kabsch-Sander electrostatic H-bond factor
_HBOND_CUT = -0.5  # kcal/mol


def _unit(v, eps=1e-9):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + eps)


def _amide_h(n, ca, c_prev, has_prev):
    """Backbone amide H position (DSSP convention: along the bisector of
    (N->C_prev, N->CA) inverted, 1.01 A from N)."""
    d = _unit(_unit(n - c_prev) + _unit(n - ca))
    h = n + 1.01 * d
    # first residue / chain break: place H opposite CA (rough)
    h_fallback = n + 1.01 * _unit(n - ca)
    return np.where(has_prev[:, None], h, h_fallback)


def hbond_energy_matrix(prot) -> np.ndarray:
    """[N, N] Kabsch-Sander energies: donor residue i (N-H) -> acceptor
    residue j (C=O). inf where undefined."""
    pos = prot.atom_positions
    mask = prot.atom_mask
    n_res = prot.num_res
    N = pos[:, rc.atom37_order["N"]]
    CA = pos[:, rc.atom37_order["CA"]]
    C = pos[:, rc.atom37_order["C"]]
    O = pos[:, rc.atom37_order["O"]]
    ok = (
        mask[:, rc.atom37_order["N"]]
        * mask[:, rc.atom37_order["CA"]]
        * mask[:, rc.atom37_order["C"]]
        * mask[:, rc.atom37_order["O"]]
    ).astype(bool)

    prev_ok = np.zeros(n_res, dtype=bool)
    prev_ok[1:] = (
        ok[:-1]
        & (prot.chain_index[1:] == prot.chain_index[:-1])
        & (np.linalg.norm(N[1:] - C[:-1], axis=-1) < 2.5)
    )
    c_prev = np.roll(C, 1, axis=0)
    H = _amide_h(N, CA, c_prev, prev_ok)

    def dist(a, b):
        return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1) + 1e-9

    # donor i, acceptor j
    r_on = dist(N, O)
    r_ch = dist(H, C)
    r_oh = dist(H, O)
    r_cn = dist(N, C)
    E = _QQ * (1.0 / r_on + 1.0 / r_ch - 1.0 / r_oh - 1.0 / r_cn)
    bad = ~(ok[:, None] & ok[None, :])
    idx = np.arange(n_res)
    near = np.abs(idx[:, None] - idx[None, :]) < 2  # no self/adjacent bonds
    E[bad | near] = np.inf
    # PRO has no amide H: cannot donate
    E[prot.aatype == rc.restype_order["P"], :] = np.inf
    return E


def assign_ss(prot) -> np.ndarray:
    """['H' | 'E' | 'C'] per residue (3-state DSSP-lite)."""
    E = hbond_energy_matrix(prot)
    hb = E < _HBOND_CUT  # hb[i, j]: N-H of i donates to C=O of j
    n = prot.num_res
    ss = np.full(n, "C", dtype="<U1")

    # 4-turns: C=O of i accepts from N-H of i+4 -> helix at i+1..i+4
    turn4 = np.zeros(n, dtype=bool)
    for i in range(n - 4):
        if hb[i + 4, i]:
            turn4[i] = True
    for i in range(1, n - 4):
        if turn4[i] and turn4[i - 1]:
            ss[i : i + 4] = "H"

    # bridges: parallel (i-1<-j and j<-i+1) or antiparallel (i<->j or
    # (i-1<-j+1 and j-1<-i+1))
    for i in range(1, n - 1):
        for j in range(i + 3, n - 1):
            para = (hb[j, i - 1] and hb[i + 1, j]) or (hb[i, j - 1] and hb[j + 1, i])
            anti = (hb[i, j] and hb[j, i]) or (hb[j + 1, i - 1] and hb[i + 1, j - 1])
            if para or anti:
                if ss[i] != "H":
                    ss[i] = "E"
                if ss[j] != "H":
                    ss[j] = "E"
    return ss


def backbone_dihedrals(prot) -> tuple:
    """(phi [N], psi [N]) radians; 0 where undefined."""
    pos = prot.atom_positions
    N = pos[:, rc.atom37_order["N"]]
    CA = pos[:, rc.atom37_order["CA"]]
    C = pos[:, rc.atom37_order["C"]]

    def dihed(p0, p1, p2, p3):
        # IUPAC sign convention (praxeolitic formula: first bond negated)
        b0, b1, b2 = p0 - p1, p2 - p1, p3 - p2
        b1h = _unit(b1)
        v = b0 - np.sum(b0 * b1h, -1, keepdims=True) * b1h
        w = b2 - np.sum(b2 * b1h, -1, keepdims=True) * b1h
        x = np.sum(v * w, -1)
        y = np.sum(np.cross(b1h, v) * w, -1)
        return np.arctan2(y, x)

    n = prot.num_res
    phi = np.zeros(n)
    psi = np.zeros(n)
    same_prev = np.zeros(n, dtype=bool)
    same_prev[1:] = prot.chain_index[1:] == prot.chain_index[:-1]
    if n > 1:
        phi[1:] = dihed(C[:-1], N[1:], CA[1:], C[1:])
        phi[~same_prev] = 0.0
        psi[:-1] = dihed(N[:-1], CA[:-1], C[:-1], N[1:])
        psi[-1] = 0.0
        psi[np.roll(~same_prev, -1)] = 0.0
    return phi, psi


# Tien et al. 2013 theoretical max ASA per residue (A^2), by 1-letter code
_MAX_ASA = {
    "A": 129.0, "R": 274.0, "N": 195.0, "D": 193.0, "C": 167.0,
    "Q": 225.0, "E": 223.0, "G": 104.0, "H": 224.0, "I": 197.0,
    "L": 201.0, "K": 236.0, "M": 224.0, "F": 240.0, "P": 159.0,
    "S": 155.0, "T": 172.0, "W": 285.0, "Y": 263.0, "V": 174.0,
}


def _sphere_points(n: int = 92) -> np.ndarray:
    """Fibonacci sphere."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=-1,
    )


def shrake_rupley_sasa(prot, probe: float = 1.4, n_points: int = 92):
    """(residue_sasa [N] A^2, relative_asa [N] in [0, 1]).

    Shrake-Rupley on heavy atoms with element vdW radii — the in-process
    substitute for the reference's MSMS binary."""
    mask = prot.atom_mask.astype(bool)
    ridx, aidx = np.nonzero(mask)
    xyz = prot.atom_positions[ridx, aidx]
    el = np.array([rc.atom37_names[a][0] for a in aidx])
    rad_map = {"N": 1.55, "C": 1.7, "O": 1.52, "S": 1.8}
    radii = np.array([rad_map.get(e, 1.7) for e in el]) + probe

    pts = _sphere_points(n_points)
    n_atoms = xyz.shape[0]
    # neighbor prefilter with a generous cutoff
    areas = np.zeros(n_atoms)
    cutoff = radii.max() * 2.0
    # chunked pairwise to bound memory
    for i0 in range(0, n_atoms, 256):
        i1 = min(i0 + 256, n_atoms)
        d = np.linalg.norm(xyz[i0:i1, None] - xyz[None, :], axis=-1)
        for k in range(i0, i1):
            nb = np.nonzero(
                (d[k - i0] < radii[k] + radii) & (d[k - i0] > 1e-6)
            )[0]
            surf = xyz[k] + radii[k] * pts
            if nb.size:
                dd = np.linalg.norm(surf[:, None, :] - xyz[nb][None], axis=-1)
                exposed = np.all(dd >= radii[nb][None, :], axis=1)
            else:
                exposed = np.ones(n_points, dtype=bool)
            areas[k] = (
                4.0 * np.pi * radii[k] ** 2 * exposed.sum() / n_points
            )
    res_sasa = np.zeros(prot.num_res)
    np.add.at(res_sasa, ridx, areas)
    rasa = np.zeros(prot.num_res)
    for i in range(prot.num_res):
        aa = prot.aatype[i]
        letter = rc.restypes[aa] if aa < 20 else "A"
        rasa[i] = min(res_sasa[i] / _MAX_ASA.get(letter, 200.0), 1.0)
    return res_sasa, rasa


def residue_depth(prot, probe: float = 1.4, n_points: int = 92):
    """Per-residue depth below the solvent-accessible surface [N] (A).

    The reference gets this optional feature from the MSMS binary via
    Bio.PDB.ResidueDepth (druglib/utils/obj/protein.py:822-830; off in the
    shipped config). Here the surface is approximated by the exposed
    Shrake-Rupley sphere points (same construction as
    shrake_rupley_sasa): a point on an atom's solvent-accessible sphere
    is a surface sample iff it lies outside every other atom's sphere;
    depth(atom) = min distance to any surface sample; depth(residue) =
    mean over its heavy atoms. Fully-buried proteins with no exposed
    points (impossible in practice) would return zeros."""
    mask = prot.atom_mask.astype(bool)
    ridx, aidx = np.nonzero(mask)
    xyz = prot.atom_positions[ridx, aidx]
    el = np.array([rc.atom37_names[a][0] for a in aidx])
    rad_map = {"N": 1.55, "C": 1.7, "O": 1.52, "S": 1.8}
    radii = np.array([rad_map.get(e, 1.7) for e in el]) + probe

    pts = _sphere_points(n_points)
    n_atoms = xyz.shape[0]
    surface = []
    for i0 in range(0, n_atoms, 256):
        i1 = min(i0 + 256, n_atoms)
        d = np.linalg.norm(xyz[i0:i1, None] - xyz[None, :], axis=-1)
        for k in range(i0, i1):
            nb = np.nonzero(
                (d[k - i0] < radii[k] + radii) & (d[k - i0] > 1e-6))[0]
            surf = xyz[k] + radii[k] * pts
            if nb.size:
                dd = np.linalg.norm(
                    surf[:, None, :] - xyz[nb][None], axis=-1)
                exposed = np.all(dd >= radii[nb][None, :], axis=1)
            else:
                exposed = np.ones(n_points, dtype=bool)
            if exposed.any():
                surface.append(surf[exposed])
    if not surface:
        return np.zeros(prot.num_res, np.float32)
    surface = np.concatenate(surface, axis=0)

    depth = np.zeros(n_atoms)
    for i0 in range(0, n_atoms, 64):
        i1 = min(i0 + 64, n_atoms)
        dd = np.linalg.norm(
            xyz[i0:i1, None, :] - surface[None, :, :], axis=-1)
        depth[i0:i1] = dd.min(axis=1)

    res_depth = np.zeros(prot.num_res)
    counts = np.zeros(prot.num_res)
    np.add.at(res_depth, ridx, depth)
    np.add.at(counts, ridx, 1.0)
    return (res_depth / np.maximum(counts, 1.0)).astype(np.float32)
