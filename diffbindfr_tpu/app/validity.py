"""Pose physical-validity checks (PoseBusters-style subset).

Rebuilds the checks the reference runs through its PoseBusters wrapper
(DiffBindFR/evaluation/pb.py:147-416) that are computable without RDKit:

  * bond_lengths: output bond lengths within 25% of the input conformer
  * bond_angles: angles within 25% of the input conformer
  * internal_clash: no non-bonded intra-ligand pair closer than 0.7 x
    the sum of covalent radii proxies
  * protein_clash: no ligand heavy atom closer than 0.75 x sum of vdW
    radii to a pocket heavy atom
  * in_pocket: ligand centroid within the pocket bounding sphere

Each check returns bool; `check_pose` aggregates into a dict + pass flag.
"""
from __future__ import annotations

import numpy as np

from ..chem.ligand_feats import LigandRecord
from ..chem.protein_feats import PocketRecord
from ..ops.vina import _DEFAULT_RADIUS, _RADII


def _bond_vectors(pos, bonds):
    return pos[bonds[:, 0]] - pos[bonds[:, 1]]


def _angles(pos, bonds):
    """All bonded angle triplets (j is the apex)."""
    nbrs: dict = {}
    for a, b in map(tuple, bonds):
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    trips = []
    for j, ns in nbrs.items():
        for x in range(len(ns)):
            for y in range(x + 1, len(ns)):
                trips.append((ns[x], j, ns[y]))
    if not trips:
        return np.zeros((0,))
    t = np.asarray(trips)
    v1 = pos[t[:, 0]] - pos[t[:, 1]]
    v2 = pos[t[:, 2]] - pos[t[:, 1]]
    cos = np.sum(v1 * v2, -1) / (
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-9
    )
    return np.arccos(np.clip(cos, -1, 1))


def check_pose(
    lig: LigandRecord,
    pocket: PocketRecord,
    lig_pos_pocket_frame: np.ndarray,
    tol: float = 0.25,
) -> dict:
    na = lig.num_atoms
    pos = np.asarray(lig_pos_pocket_frame)[:na]
    ref = lig.pos[:na] if lig.pos.shape[0] >= na else lig.pos
    bonds = np.asarray(lig.bonds)

    out = {}
    # bond lengths vs input conformer
    d_out = np.linalg.norm(_bond_vectors(pos, bonds), axis=-1)
    d_ref = np.linalg.norm(_bond_vectors(ref, bonds), axis=-1)
    out["bond_lengths"] = bool(
        np.all(np.abs(d_out - d_ref) <= tol * np.maximum(d_ref, 1e-6))
    )
    # bond angles
    a_out = _angles(pos, bonds)
    a_ref = _angles(ref, bonds)
    out["bond_angles"] = bool(
        a_out.size == 0
        or np.all(np.abs(a_out - a_ref) <= tol * np.maximum(a_ref, 1e-2))
    )
    # internal clash: non-bonded pairs (graph dist >= 2 approximated by
    # excluding bonded pairs) closer than 0.7 * (r_i + r_j)
    radii = np.array(
        [_RADII.get(e, _DEFAULT_RADIUS) for e in lig.elements], np.float32
    )
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    bonded = np.zeros((na, na), bool)
    bonded[bonds[:, 0], bonds[:, 1]] = True
    bonded |= bonded.T
    np.fill_diagonal(d, 1e6)
    d[bonded] = 1e6
    lim = 0.7 * (radii[:, None] + radii[None, :]) * 0.55  # covalent proxy
    out["internal_clash"] = bool(np.all(d > lim))
    # protein clash
    exists = pocket.atom14_mask.astype(bool)
    ppos = pocket.atom14_pos[exists]
    dd = np.linalg.norm(pos[:, None] - ppos[None, :], axis=-1)
    out["protein_clash"] = bool(np.min(dd) > 0.75 * (1.7 + 1.7) * 0.5 + 1.0)
    # in pocket: centroid within pocket extent
    ca = pocket.atom14_pos[:, 1][pocket.atom14_mask[:, 1] > 0]
    rad = np.linalg.norm(ca, axis=-1).max() + 5.0
    out["in_pocket"] = bool(np.linalg.norm(pos.mean(0)) < rad)
    out["pass"] = all(v for k, v in out.items() if k != "pass")
    return out
