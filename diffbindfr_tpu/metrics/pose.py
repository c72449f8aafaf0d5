"""Docking pose metrics: symmetric L-RMSD, centroid, chi1 accuracy, sc-RMSD.

Rebuilds DiffBindFR/metrics/{lrmsd,centroid,angbin,scrmsd}.py semantics:

  * ligand_rmsd: symmetry-corrected heavy-atom RMSD — minimum over
    element+bond-preserving graph automorphisms (the reference uses
    networkx isomorphism / spyrmsd, lrmsd.py:287-373). No alignment:
    docking RMSD is computed in the common receptor frame.
  * centroid_distance: distance between heavy-atom centroids.
  * chi1_accuracy: fraction of pocket residues whose chi1 deviates < 15
    deg (angbin.py:48-97), with pi-periodic chi handling.
  * sidechain_rmsd: per-residue side-chain heavy-atom RMSD with
    180-deg-symmetric alternative naming (ASP OD1/OD2 etc., scrmsd.py:64-89)
    resolved to the minimum.
"""
from __future__ import annotations

import itertools

import networkx as nx
import numpy as np

from ..constants import residues as rc

# ---------------------------------------------------------------------------
# ligand RMSD
# ---------------------------------------------------------------------------

_MAX_AUTOMORPHISMS = 10_000


def _automorphisms(bonds: np.ndarray, elements: list, n_atoms: int):
    g = nx.Graph()
    g.add_nodes_from(range(n_atoms))
    for a, b in map(tuple, bonds):
        g.add_edge(int(a), int(b))
    nm = nx.algorithms.isomorphism.categorical_node_match("el", "")
    for i, el in enumerate(elements):
        g.nodes[i]["el"] = el
    gm = nx.algorithms.isomorphism.GraphMatcher(g, g, node_match=nm)
    out = []
    for m in gm.isomorphisms_iter():
        out.append(np.array([m[i] for i in range(n_atoms)], dtype=np.int64))
        if len(out) >= _MAX_AUTOMORPHISMS:
            break
    return out


def ligand_rmsd(
    pred: np.ndarray,  # [A, 3]
    ref: np.ndarray,  # [A, 3]
    bonds: np.ndarray,  # [B, 2] undirected
    elements: list,
) -> float:
    """Symmetry-corrected RMSD in the receptor frame (no superposition)."""
    perms = _automorphisms(bonds, elements, pred.shape[0])
    if not perms:
        perms = [np.arange(pred.shape[0])]
    best = np.inf
    for p in perms:
        r = float(np.sqrt(np.mean(np.sum((pred[p] - ref) ** 2, axis=-1))))
        best = min(best, r)
    return best


def centroid_distance(pred: np.ndarray, ref: np.ndarray) -> float:
    return float(np.linalg.norm(pred.mean(axis=0) - ref.mean(axis=0)))


# ---------------------------------------------------------------------------
# side chains
# ---------------------------------------------------------------------------


def _dihedral(p: np.ndarray) -> float:
    """p: [4, 3] -> dihedral angle in radians."""
    b0, b1, b2 = p[1] - p[0], p[2] - p[1], p[3] - p[2]
    n1 = np.cross(b0, b1)
    n2 = np.cross(b1, b2)
    m1 = np.cross(n1, b1 / max(np.linalg.norm(b1), 1e-9))
    x = np.dot(n1, n2)
    y = np.dot(m1, n2)
    return float(np.arctan2(y, x))


def _ang_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = abs(a - b) % period
    return min(d, period - d)


def chi1_accuracy(
    aatype: np.ndarray,  # [R]
    pred14: np.ndarray,  # [R, 14, 3]
    ref14: np.ndarray,  # [R, 14, 3]
    mask14: np.ndarray,  # [R, 14]
    cutoff_deg: float = 15.0,
) -> float:
    """Fraction of chi1-bearing residues with |chi1_pred - chi1_ref| < cutoff."""
    ok, tot = 0, 0
    for i, aa in enumerate(aatype):
        if not rc.chi_angles_mask[aa][0]:
            continue
        quad = rc.chi_angles_to_atom14[aa, 0]
        if not mask14[i, quad].all():
            continue
        period = np.pi if rc.chi_pi_periodic[aa, 0] else 2 * np.pi
        d = _ang_diff(_dihedral(pred14[i, quad]), _dihedral(ref14[i, quad]), period)
        tot += 1
        ok += int(np.degrees(d) < cutoff_deg)
    return ok / tot if tot else float("nan")


# 180-deg-equivalent atom14 index swaps per residue type (reference
# scrmsd.py symmetric-alternative handling; same set as AF2's
# residue_atom_renaming_swaps)
_SYMM_SWAPS = {
    "D": [("OD1", "OD2")],
    "E": [("OE1", "OE2")],
    "F": [("CD1", "CD2"), ("CE1", "CE2")],
    "Y": [("CD1", "CD2"), ("CE1", "CE2")],
    "R": [("NH1", "NH2")],
}


def _swap_indices(aa: int):
    """Returns list of (i, j) atom14 index pairs that may be exchanged."""
    letter = rc.restypes_with_x[aa]
    if letter not in _SYMM_SWAPS:
        return []
    names = rc.restype_name_to_atom14_names[rc.restype_1to3[letter]]
    return [(names.index(a), names.index(b)) for a, b in _SYMM_SWAPS[letter]]


def sidechain_rmsd(
    aatype: np.ndarray,
    pred14: np.ndarray,
    ref14: np.ndarray,
    mask14: np.ndarray,
) -> float:
    """Pocket side-chain heavy-atom RMSD (atoms beyond the backbone 4),
    minimizing over 180-deg-symmetric naming per residue."""
    se_sum, n_sum = 0.0, 0
    for i, aa in enumerate(aatype):
        sc = np.asarray(mask14[i], dtype=bool).copy()
        sc[:4] = False  # N, CA, C, O are backbone (atom14 layout slots 0-3)
        if not sc.any():
            continue
        swaps = _swap_indices(int(aa))
        best = None
        # at most 2 swap pairs -> enumerate all subsets
        for pick in itertools.product([False, True], repeat=len(swaps)):
            p = pred14[i].copy()
            for do, (a, b) in zip(pick, swaps):
                if do:
                    p[[a, b]] = p[[b, a]]
            se = float(np.sum((p[sc] - ref14[i][sc]) ** 2))
            best = se if best is None else min(best, se)
        se_sum += best
        n_sum += int(sc.sum())
    return float(np.sqrt(se_sum / n_sum)) if n_sum else float("nan")
