"""Fixed-shape padded sample schema: the TPU-native replacement for the
reference's variable-size PyG graphs (druglib/data/*, PLData in
druglib/datasets/Docking/formatting.py:6-38).

Design: every (pocket, ligand) pair is frozen into a `DockingSample` of
dense arrays padded to a `Buckets` size class. A batch is a simple
`jax.tree.map(stack)` over samples of the same bucket — no per-key __inc__
offset bookkeeping, no dynamic shapes, one XLA compilation per bucket.

Pocket atoms use a *packed* layout: the existing atom14 slots of all pocket
residues flattened in (residue, slot) order (reference
Atom14ToAllAtomsRepr, druglib/datasets/Docking/formatting.py:40-52), so the
score net sees a flat atom cloud while the sampler rebuilds positions
residue-wise from chi angles and scatters them back through `pack_flat`.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from ..chem.ligand_feats import LigandRecord
from ..chem.protein_feats import PocketRecord
from ..constants import residues as rc

CA37, CB37 = 1, 3  # atom37 ids of CA / CB (constants/residues.py atom37_order)


@dataclasses.dataclass(frozen=True)
class Buckets:
    """Static size class; one XLA compilation per distinct value."""

    n_lig: int = 64  # max ligand heavy atoms
    n_lig_edges: int = 160  # max directed covalent edges
    n_tor: int = 24  # max rotatable bonds
    n_res: int = 64  # max pocket residues
    n_atm: int = 512  # max packed pocket heavy atoms
    # neighbor-list degrees are MODEL config, not data schema: the dense
    # pair blocks here are unbounded and ScoreNetConfig.atom_knn etc. set
    # the fixed degrees where the model uses gather-form lists

    @property
    def n_cab(self) -> int:  # CA+CB compact list length
        return 2 * self.n_res


# Standard size classes; `choose_bucket` rounds a pair up to the smallest
# class that fits (compile-cache friendly). The LIGAND and POCKET ladders
# are INDEPENDENT: a small ligand in a large pocket must not pay the
# large-ligand pad — jointly bucketing 3dbs (35 lig atoms, 113 residues)
# forced n_lig 35->128 and n_tor 5->48, doubling the cross-conv block and
# quadrupling the torsion-update unroll; decoupling measured the 14-step
# sampler at that shape 12.5 -> 20+ poses/s on v5e (ROUND5_NOTES). At most
# len(LIG) x len(POCKET) = 16 shape combos can ever compile; a screen is
# dominated by one.
LIG_BUCKET_LEVELS = (
    (32, 80, 12),
    (64, 160, 24),
    (96, 224, 32),
    (128, 288, 48),
)
POCKET_BUCKET_LEVELS = (
    (48, 384),
    (64, 512),
    (96, 768),
    (128, 1024),
)
# joint ladder kept for consumers that iterate standard classes
BUCKET_LEVELS = tuple(
    Buckets(nl, ne, nt, nr, na)
    for (nl, ne, nt), (nr, na) in zip(LIG_BUCKET_LEVELS,
                                      POCKET_BUCKET_LEVELS)
)


def choose_bucket(n_lig: int, n_edges: int, n_tor: int, n_res: int, n_atm: int):
    for nl, ne, nt in LIG_BUCKET_LEVELS:
        if n_lig <= nl and n_edges <= ne and n_tor <= nt:
            break
    else:
        raise ValueError(
            f"ligand too large for all buckets: lig={n_lig} "
            f"edges={n_edges} tor={n_tor}"
        )
    for nr, na in POCKET_BUCKET_LEVELS:
        if n_res <= nr and n_atm <= na:
            break
    else:
        raise ValueError(
            f"pocket too large for all buckets: res={n_res} atm={n_atm}"
        )
    return Buckets(nl, ne, nt, nr, na)


class DockingSample(NamedTuple):
    """One padded (pocket, ligand) pair. Leading axis B is added by stacking."""

    # --- ligand
    lig_feat: np.ndarray  # [NL, 27] f32
    lig_pos: np.ndarray  # [NL, 3] f32 (current, diffused)
    lig_ref_pos: np.ndarray  # [NL, 3] f32 (input conformer, for torsion updates)
    lig_mask: np.ndarray  # [NL] f32
    lig_e_src: np.ndarray  # [EL] i32 (covalent, directed both ways)
    lig_e_dst: np.ndarray  # [EL] i32
    lig_e_feat: np.ndarray  # [EL, 10] f32
    lig_e_mask: np.ndarray  # [EL] f32
    tor_src: np.ndarray  # [T] i32 rotatable bond u (fixed side)
    tor_dst: np.ndarray  # [T] i32 rotatable bond v (rotating side)
    tor_mask: np.ndarray  # [T] f32
    rot_node_mask: np.ndarray  # [T, NL] f32 (atoms that rotate with the bond)
    # --- pocket, packed atom cloud
    atm_pos: np.ndarray  # [NA, 3] f32 (current, rebuilt from chi)
    atm_mask: np.ndarray  # [NA] f32
    atm_feat: np.ndarray  # [NA, 5] i32 categorical
    cab_idx: np.ndarray  # [NCAB] i32 -> packed index of CA/CB atoms
    cab_mask: np.ndarray  # [NCAB] f32
    noncab_mask: np.ndarray  # [NA] f32 (valid and not CA/CB)
    sc_src: np.ndarray  # [R, 4] i32 packed idx of chi bond atom j
    sc_dst: np.ndarray  # [R, 4] i32 packed idx of chi bond atom k
    chi_mask: np.ndarray  # [R, 4] f32 diffusable chi angles
    # --- side-chain rebuild state (frames fixed, chi diffused)
    aatype: np.ndarray  # [R] i32
    res_mask: np.ndarray  # [R] f32
    backbone_rots: np.ndarray  # [R, 3, 3] f32
    backbone_transl: np.ndarray  # [R, 3] f32
    default_frame: np.ndarray  # [R, 8, 4, 4] f32
    template_pos: np.ndarray  # [R, 14, 3] f32
    group_idx: np.ndarray  # [R, 14] i32
    atom14_mask: np.ndarray  # [R, 14] f32
    torsion_angle: np.ndarray  # [R, 5] f32 (psi, chi1-4); chi slice diffused
    pack_flat: np.ndarray  # [NA] i32 -> r * 14 + a of each packed atom
    pocket_center: np.ndarray  # [3] f32 original-frame centroid (move-back)


def _pad(a: np.ndarray, n: int, axis: int = 0, fill=0):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(a, pad, constant_values=fill)


def make_sample(
    lig: LigandRecord, pocket: PocketRecord, buckets: Buckets | None = None
) -> DockingSample:
    """Freeze one featurized pair into a padded DockingSample (numpy)."""
    nl, el, nt = lig.num_atoms, lig.edge_index.shape[1], lig.num_torsions
    r = pocket.num_res

    # --- packed pocket atoms
    exists = pocket.atom14_mask.astype(bool)  # [R, 14]
    ridx, aidx = np.nonzero(exists)
    na = ridx.shape[0]
    b = buckets or choose_bucket(nl, el, nt, r, na)
    if not (
        nl <= b.n_lig
        and el <= b.n_lig_edges
        and nt <= b.n_tor
        and r <= b.n_res
        and na <= b.n_atm
    ):
        raise ValueError("sample exceeds requested bucket")

    pack_flat = ridx * 14 + aidx
    atm_pos = pocket.atom14_pos.reshape(-1, 3)[pack_flat]
    atm_feat = pocket.node_feat[ridx, aidx].astype(np.int32)  # [NA, 5]
    a37 = rc.restype_atom14_to_atom37[pocket.aatype][ridx, aidx]
    is_cab = (a37 == CA37) | (a37 == CB37)

    # inverse map: (r, a14) -> packed index (0 for missing; masked out)
    inv = np.zeros((r, 14), dtype=np.int64)
    inv[ridx, aidx] = np.arange(na)

    # chi rotation bonds j->k in packed coordinates
    chi_bonds = rc.restype_chi_bond_atom14[pocket.aatype]  # [R, 4, 2]
    rr = np.arange(r)[:, None]
    sc_src = inv[rr, chi_bonds[..., 0]]
    sc_dst = inv[rr, chi_bonds[..., 1]]
    chi_mask = pocket.chi_mask.astype(np.float32)
    sc_src = sc_src * (chi_mask > 0)
    sc_dst = sc_dst * (chi_mask > 0)

    cab_pos = np.nonzero(is_cab)[0]
    ncab = cab_pos.shape[0]

    return DockingSample(
        lig_feat=_pad(lig.node_feat.astype(np.float32), b.n_lig),
        lig_pos=_pad(lig.pos.astype(np.float32), b.n_lig),
        lig_ref_pos=_pad(lig.pos.astype(np.float32), b.n_lig),
        lig_mask=_pad(np.ones(nl, np.float32), b.n_lig),
        lig_e_src=_pad(lig.edge_index[0].astype(np.int32), b.n_lig_edges),
        lig_e_dst=_pad(lig.edge_index[1].astype(np.int32), b.n_lig_edges),
        lig_e_feat=_pad(lig.edge_feat.astype(np.float32), b.n_lig_edges),
        lig_e_mask=_pad(np.ones(el, np.float32), b.n_lig_edges),
        tor_src=_pad(
            lig.edge_index[0][lig.tor_edge_mask].astype(np.int32), b.n_tor
        ),
        tor_dst=_pad(
            lig.edge_index[1][lig.tor_edge_mask].astype(np.int32), b.n_tor
        ),
        tor_mask=_pad(np.ones(nt, np.float32), b.n_tor),
        rot_node_mask=_pad(
            _pad(lig.rot_node_mask.astype(np.float32), b.n_lig, axis=1), b.n_tor
        ),
        atm_pos=_pad(atm_pos.astype(np.float32), b.n_atm),
        atm_mask=_pad(np.ones(na, np.float32), b.n_atm),
        atm_feat=_pad(atm_feat, b.n_atm),
        cab_idx=_pad(cab_pos.astype(np.int32), b.n_cab),
        cab_mask=_pad(np.ones(ncab, np.float32), b.n_cab),
        noncab_mask=_pad((~is_cab).astype(np.float32), b.n_atm),
        sc_src=_pad(sc_src.astype(np.int32), b.n_res),
        sc_dst=_pad(sc_dst.astype(np.int32), b.n_res),
        chi_mask=_pad(chi_mask, b.n_res),
        aatype=_pad(pocket.aatype.astype(np.int32), b.n_res),
        res_mask=_pad(np.ones(r, np.float32), b.n_res),
        backbone_rots=_pad(pocket.backbone_rots.astype(np.float32), b.n_res),
        backbone_transl=_pad(pocket.backbone_transl.astype(np.float32), b.n_res),
        default_frame=_pad(pocket.default_frame.astype(np.float32), b.n_res),
        template_pos=_pad(pocket.rigid_group_positions.astype(np.float32), b.n_res),
        group_idx=_pad(pocket.group_idx.astype(np.int32), b.n_res),
        atom14_mask=_pad(pocket.atom14_mask.astype(np.float32), b.n_res),
        torsion_angle=_pad(pocket.torsion_angle.astype(np.float32), b.n_res),
        pack_flat=_pad(pack_flat.astype(np.int32), b.n_atm),
        pocket_center=pocket.center.astype(np.float32),
    )


def stack_samples(samples: list) -> DockingSample:
    """Batch samples of the same bucket along a new leading axis."""
    return DockingSample(
        *[np.stack([getattr(s, f) for s in samples]) for f in DockingSample._fields]
    )
