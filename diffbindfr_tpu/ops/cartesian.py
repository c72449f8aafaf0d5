"""Batched all-atom Cartesian fine-relaxation of docked complexes.

TPU-native replacement for the reference's OpenMM relax stage
(DiffBindFR/relax/pl.py:38-766): there, the exported complex is energy-
minimized with a real force field — bonded terms (bonds/angles/impropers),
nonbonded LJ, and harmonic heavy-atom restraints on the protein — in
Cartesian space, repairing the local strain and steric clashes that
pose-space moves (translation/rotation/torsion/chi) cannot reach.

Here the same role is filled by a pure-JAX energy over the framework's
fixed-shape arrays, minimized by Adam under `lax.scan` and vmapped over
poses, so thousands of complexes fine-relax in parallel on device:

ligand internal geometry (restrained to the input-conformer reference, the
same reference the validity suite checks against — app/validity.py):
  * harmonic bond lengths            k (|r| - |r0|)^2
  * harmonic bond angles             k (cos th - cos th0)^2  (arccos-free)
  * planarity: every torsion quad (x, a, b, y) across a double or aromatic
    bond penalized by k sin^2(phi) — minima at BOTH 0 and pi, so the input
    cis/trans assignment is preserved while the group flattens
  * sp2 pyramidalization: out-of-plane height of a 3-neighbor sp2 center
    above its substituent plane, k h^2
steric terms (matched to the PoseBusters criteria the validity suite
implements, with a 10% margin so passing is robust):
  * ligand internal clash: graph-distance >= 3 pairs held above
    0.7 x (Bondi_i + Bondi_j)
  * ligand-protein clash: all pairs held above 0.75 x (Bondi_i + Bondi_j)
physics:
  * the full Vina inter + intra energy (ops/vina.py terms) so relieving a
    clash trades off against real contacts instead of drifting freely
restraints (the OpenMM-relax analogues):
  * receptor heavy atoms move with a harmonic positional restraint about
    their input (per-pose, post-diffusion) coordinates
  * ligand atoms carry a weak positional restraint about the input pose so
    the relax repairs geometry without re-docking (L-RMSD preserved)

The minimizer moves ligand Cartesian coordinates [NL, 3] and per-atom
receptor displacements [NA, 3] jointly. Receptor bonded terms are not
needed: at the restraint stiffness used the displacements stay well under
the scale where covalent geometry would distort (same reasoning as the
reference's heavy-atom-restrained minimization).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.ligand_feats import LigandRecord
from ..chem.protein_feats import PocketRecord
from ..constants import residues as rc
from . import vina

# Bondi van-der-Waals radii (A) — the PoseBusters clash criterion radii
# (literature values; app/validity.py uses the same table for the checks).
BONDI = {
    "H": 1.20, "C": 1.70, "N": 1.55, "O": 1.52, "S": 1.80, "P": 1.80,
    "F": 1.47, "Cl": 1.75, "Br": 1.85, "I": 1.98, "B": 1.92, "Se": 1.90,
}
BONDI_DEFAULT = 1.70

CLASH_SCALE_INTERNAL = 0.7   # PoseBusters internal-clash scale
CLASH_SCALE_PROTEIN = 0.75   # PoseBusters protein-clash scale
CLASH_MARGIN = 1.10          # relax 10% past the check threshold


class RelaxWeights(NamedTuple):
    """Energy weights (Vina-unit scale; positions in Angstrom)."""

    k_bond: float = 100.0      # per A^2
    k_angle: float = 50.0      # per cos^2
    k_planar: float = 10.0     # per sin^2
    k_sp2: float = 25.0        # per A^2 of out-of-plane height
    k_int_clash: float = 30.0  # per A^2 of overlap past the margin
    k_prot_clash: float = 30.0
    k_pos_lig: float = 0.3     # per A^2 (weak anchor to the input pose)
    k_pos_rec: float = 2.0     # per A^2 (OpenMM-style heavy-atom restraint)
    k_chiral: float = 15.0     # signed-volume hinge (per A^6)
    k_ez: float = 15.0         # E/Z cos-sign hinge
    w_vina: float = 1.0


class CartesianLigand(NamedTuple):
    """Fixed-shape bonded-topology tables for one ligand."""

    bonds: jnp.ndarray       # [NB, 2] int32
    bond_mask: jnp.ndarray   # [NB]
    ref_len: jnp.ndarray     # [NB] input-conformer bond lengths
    angles: jnp.ndarray      # [NG, 3] int32 (i, j=apex, k)
    angle_mask: jnp.ndarray  # [NG]
    ref_cos: jnp.ndarray     # [NG] input-conformer cos(angle)
    quads: jnp.ndarray       # [NQ, 4] int32 (x, a, b, y) planar torsions
    quad_mask: jnp.ndarray   # [NQ]
    sp2: jnp.ndarray         # [NS, 4] int32 (center, n1, n2, n3)
    sp2_mask: jnp.ndarray    # [NS]
    nb3_mask: jnp.ndarray    # [NL, NL] graph-distance >= 3 pairs
    bondi: jnp.ndarray       # [NL]
    mask: jnp.ndarray        # [NL]
    chiral: jnp.ndarray      # [NC, 4] int32 (center, n1, n2, n3)
    chiral_mask: jnp.ndarray  # [NC]
    chiral_sign: jnp.ndarray  # [NC] input-record signed-volume sign
    ez_quads: jnp.ndarray    # [NZ, 4] int32 (sa, a, b, sb) stereo dbonds
    ez_mask: jnp.ndarray     # [NZ]
    ez_sign: jnp.ndarray     # [NZ] sign of cos(phi) in the input record


class CartesianReceptor(NamedTuple):
    """Packed-pocket receptor typing + the atom14 gather map, so per-pose
    (post-diffusion) atom14 coordinates can be packed inside the jit."""

    pack_idx: jnp.ndarray  # [NA] int32 into flattened [R*14] arrays
    mask: jnp.ndarray      # [NA]
    radius: jnp.ndarray    # [NA] X-Score radii (Vina terms)
    hydro: jnp.ndarray
    donor: jnp.ndarray
    acceptor: jnp.ndarray
    bondi: jnp.ndarray     # [NA] Bondi radii (clash criterion)


def _protein_bondi_table() -> np.ndarray:
    """[21, 14] Bondi radius by (restype, atom14 slot)."""
    out = np.full((21, 14), BONDI_DEFAULT, np.float32)
    for res3, names in rc.restype_name_to_atom14_names.items():
        if res3 == "UNK":
            continue
        ri = rc.restype_order[rc.restype_3to1[res3]]
        for slot, name in enumerate(names):
            if name:
                out[ri, slot] = BONDI.get(name[0], BONDI_DEFAULT)
    return out


_PBONDI = _protein_bondi_table()


def _pad_rows(a: np.ndarray, n: int, what: str) -> np.ndarray:
    if a.shape[0] > n:
        raise ValueError(
            f"cartesian relax: {what} count {a.shape[0]} exceeds pad {n} "
            f"(grow the bucket-derived pad in build_cartesian_ligand)")
    return np.pad(a, [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1))


def build_cartesian_ligand(
    lig: LigandRecord,
    pad_atoms: int,
    pad_bonds: int | None = None,
    pad_angles: int | None = None,
    pad_quads: int | None = None,
) -> CartesianLigand:
    """Host-NumPy topology tables (builders run in prep/prefetch threads).

    Pad sizes default to generous multiples of `pad_atoms`: heavy-atom
    degree <= 4 bounds bonds by 2*NL and angles by 6*NL; planar bonds
    carry at most 4 quads each (sp2 degree <= 3)."""
    na = lig.num_atoms
    ref = np.asarray(lig.pos[:na], np.float64)
    bonds = np.asarray(lig.bonds, np.int32).reshape(-1, 2)
    orders = np.asarray(lig.bond_orders).reshape(-1)
    pad_bonds = pad_bonds or 2 * pad_atoms
    pad_angles = pad_angles or 6 * pad_atoms
    pad_quads = pad_quads or 6 * pad_atoms

    nbrs: dict = {i: [] for i in range(na)}
    for a, b in map(tuple, bonds):
        nbrs[a].append(int(b))
        nbrs[b].append(int(a))

    # bonds
    ref_len = np.linalg.norm(ref[bonds[:, 0]] - ref[bonds[:, 1]], axis=-1)
    nb = bonds.shape[0]

    # angles (apex j)
    trips = []
    for j, ns in nbrs.items():
        for x in range(len(ns)):
            for y in range(x + 1, len(ns)):
                trips.append((ns[x], j, ns[y]))
    trips = np.asarray(trips, np.int32).reshape(-1, 3)
    if trips.size:
        v1 = ref[trips[:, 0]] - ref[trips[:, 1]]
        v2 = ref[trips[:, 2]] - ref[trips[:, 1]]
        ref_cos = np.sum(v1 * v2, -1) / (
            np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-9)
    else:
        ref_cos = np.zeros((0,))
    ng = trips.shape[0]

    # planar torsion quads across double (2) / aromatic (4) bonds
    quads = []
    sp2_atoms = set()
    for (a, b), o in zip(map(tuple, bonds), orders):
        if int(o) not in (2, 4):
            continue
        sp2_atoms.update((a, b))
        for x in nbrs[a]:
            if x == b:
                continue
            for y in nbrs[b]:
                if y == a:
                    continue
                quads.append((x, a, b, y))
    quads = np.asarray(quads, np.int32).reshape(-1, 4)
    nq = quads.shape[0]

    # sp2 pyramidalization centers: 3-neighbor atoms on a planar bond
    sp2 = [(j, *nbrs[j][:3]) for j in sorted(sp2_atoms) if len(nbrs[j]) == 3]
    sp2 = np.asarray(sp2, np.int32).reshape(-1, 4)
    ns2 = sp2.shape[0]

    # tetrahedral chirality: atoms with >= 3 heavy neighbors keep the sign
    # of their input-record signed volume (the validity suite's stereo
    # reference, app/validity.py tetrahedral check). Without this hinge the
    # clash terms measurably push centers through planarity (eval_r4_cart:
    # tetrahedral_stereo failures 5 -> 40 before the term).
    cquads, csigns = [], []
    for j, ns in nbrs.items():
        if len(ns) < 3:
            continue
        ns3 = sorted(ns)[:3]
        v = np.dot(
            np.cross(ref[ns3[0]] - ref[j], ref[ns3[1]] - ref[j]),
            ref[ns3[2]] - ref[j])
        if abs(v) < 0.25:  # effectively planar center (sp2) — skip
            continue
        cquads.append([j] + ns3)
        csigns.append(np.sign(v))
    cquads = np.asarray(cquads, np.int32).reshape(-1, 4)
    nc = cquads.shape[0]

    # E/Z: cos(phi) sign across each stereo-capable double bond, judged on
    # the same substituent quad the validity check uses
    from ..app.validity import _stereo_double_bonds

    ezq, ezs = [], []
    for a, b, sa, sb, saa, sbb in _stereo_double_bonds(lig):
        b0 = ref[a] - ref[sa]
        b1 = ref[b] - ref[a]
        b2 = ref[sb] - ref[b]
        n1 = np.cross(b0, b1)
        n2 = np.cross(b1, b2)
        cos = float(np.dot(n1, n2) / (
            np.linalg.norm(n1) * np.linalg.norm(n2) + 1e-9))
        if abs(cos) < 0.3:  # ill-defined in the reference geometry
            continue
        ezq.append((sa, a, b, sb))
        ezs.append(np.sign(cos))
    ezq = np.asarray(ezq, np.int32).reshape(-1, 4)
    nz = ezq.shape[0]

    # non-bonded (graph distance >= 3) pair mask
    adj = np.zeros((na, na), bool)
    adj[bonds[:, 0], bonds[:, 1]] = True
    adj |= adj.T
    two = (adj @ adj) | adj
    np.fill_diagonal(two, True)
    nb3 = np.zeros((pad_atoms, pad_atoms), np.float32)
    nb3[:na, :na] = (~two).astype(np.float32)

    bondi = np.array(
        [BONDI.get(e, BONDI_DEFAULT) for e in lig.elements], np.float32)
    mask = np.zeros(pad_atoms, np.float32)
    mask[:na] = 1.0

    bm = np.zeros(pad_bonds, np.float32)
    bm[:nb] = 1.0
    gm = np.zeros(pad_angles, np.float32)
    gm[:ng] = 1.0
    qm = np.zeros(pad_quads, np.float32)
    qm[:nq] = 1.0
    sm = np.zeros(pad_atoms, np.float32)
    sm[:ns2] = 1.0
    return CartesianLigand(
        bonds=_pad_rows(bonds, pad_bonds, "bond"),
        bond_mask=bm,
        ref_len=np.pad(ref_len.astype(np.float32), (0, pad_bonds - nb),
                       constant_values=1.5),
        angles=_pad_rows(trips, pad_angles, "angle"),
        angle_mask=gm,
        ref_cos=np.pad(ref_cos.astype(np.float32), (0, pad_angles - ng)),
        quads=_pad_rows(quads, pad_quads, "planar quad"),
        quad_mask=qm,
        sp2=_pad_rows(sp2, pad_atoms, "sp2 center"),
        sp2_mask=sm,
        nb3_mask=nb3,
        bondi=np.pad(bondi, (0, pad_atoms - na)),
        mask=mask,
        chiral=_pad_rows(cquads, pad_atoms, "chiral center"),
        chiral_mask=np.pad(np.ones(nc, np.float32), (0, pad_atoms - nc)),
        chiral_sign=np.pad(
            np.asarray(csigns, np.float32), (0, pad_atoms - nc)),
        ez_quads=_pad_rows(ezq, pad_atoms, "stereo double bond"),
        ez_mask=np.pad(np.ones(nz, np.float32), (0, pad_atoms - nz)),
        ez_sign=np.pad(np.asarray(ezs, np.float32), (0, pad_atoms - nz)),
    )


def build_cartesian_receptor(pocket: PocketRecord,
                             pad_atoms: int) -> CartesianReceptor:
    """Typing + gather map for the packed existing pocket atoms. Positions
    are NOT baked in — per-pose atom14 coordinates are packed through
    `pack_idx` inside the jit (the diffusion samples side chains per pose,
    so the receptor the relax sees is the per-pose prediction, exactly the
    structure the exporter writes and the validity suite re-reads)."""
    exists = pocket.atom14_mask.astype(bool)
    ridx, aidx = np.nonzero(exists)
    n = ridx.shape[0]
    rad, hyd, don, acc = vina._PTABLES
    aat = pocket.aatype

    def pack(tab):
        return np.pad(tab[aat][ridx, aidx], (0, pad_atoms - n))

    mask = np.zeros(pad_atoms, np.float32)
    mask[:n] = 1.0
    return CartesianReceptor(
        pack_idx=np.pad(
            (ridx * 14 + aidx).astype(np.int32), (0, pad_atoms - n)),
        mask=mask,
        radius=np.asarray(pack(rad), np.float32),
        hydro=np.asarray(pack(hyd), np.float32),
        donor=np.asarray(pack(don), np.float32),
        acceptor=np.asarray(pack(acc), np.float32),
        bondi=np.asarray(pack(_PBONDI), np.float32),
    )


# ---------------------------------------------------------------------------
# energy
# ---------------------------------------------------------------------------


class _BondedGather(NamedTuple):
    """One-hot gather matrix covering EVERY bonded-term index column.

    When the topology trees are jit ARGUMENTS (the production
    CartesianRelaxEngine stages systems as _DeviceStager blocks),
    ``x[cl.bonds[:, 0]]``-style dynamic indices lower to TPU gathers
    whose gradients are scatter-adds — per term, per optimizer step,
    300 steps deep (the same pathology measured 6.8x on the EC
    minimizer, tools/probe_engine_fn.py). One [K, NL] one-hot matmul
    per energy eval replaces all ~20 gathers; its gradient is a dense
    [K, NL]^T @ [K, 3] matmul."""

    oh: jnp.ndarray  # [K, NL] f32 one-hot rows


def _bonded_gather(cl: CartesianLigand) -> _BondedGather:
    cols = [cl.bonds[:, 0], cl.bonds[:, 1],
            cl.angles[:, 0], cl.angles[:, 1], cl.angles[:, 2],
            cl.quads[:, 0], cl.quads[:, 1], cl.quads[:, 2], cl.quads[:, 3],
            cl.sp2[:, 0], cl.sp2[:, 1], cl.sp2[:, 2], cl.sp2[:, 3],
            cl.chiral[:, 0], cl.chiral[:, 1], cl.chiral[:, 2],
            cl.chiral[:, 3],
            cl.ez_quads[:, 0], cl.ez_quads[:, 1], cl.ez_quads[:, 2],
            cl.ez_quads[:, 3]]
    idx = jnp.concatenate(cols)
    nl = cl.mask.shape[0]
    oh = (idx[:, None] == jnp.arange(nl, dtype=idx.dtype)[None, :]
          ).astype(jnp.float32)
    return _BondedGather(oh=oh)


def ligand_bonded_energy(x, cl: CartesianLigand, w: RelaxWeights,
                         gat: _BondedGather | None = None):
    """Restraint energy of the ligand's internal geometry about the
    input-conformer reference. ``gat`` (precompute once per minimize
    call, outside the step loop) replaces per-term index gathers with
    one one-hot matmul — see _BondedGather."""
    if gat is None:
        gat = _bonded_gather(cl)
    # HIGHEST: this matmul MOVES coordinates — default MXU precision
    # rounds f32 inputs to bf16 (round-3 lesson, CLAUDE.md)
    g = jnp.einsum("kl,ld->kd", gat.oh, x,
                   precision=jax.lax.Precision.HIGHEST)
    off = 0

    def take(n):
        nonlocal off
        s = jax.lax.slice_in_dim(g, off, off + n)
        off += n
        return s

    nb, ng = cl.bonds.shape[0], cl.angles.shape[0]
    nq, ns = cl.quads.shape[0], cl.sp2.shape[0]
    nc, nz = cl.chiral.shape[0], cl.ez_quads.shape[0]
    bu, bv = take(nb), take(nb)
    a0, a1, a2 = take(ng), take(ng), take(ng)
    q0, q1, q2, q3 = take(nq), take(nq), take(nq), take(nq)
    s0, s1, s2, s3 = take(ns), take(ns), take(ns), take(ns)
    c0, c1, c2, c3 = take(nc), take(nc), take(nc), take(nc)
    z0, z1, z2, z3 = take(nz), take(nz), take(nz), take(nz)

    # bonds
    d = jnp.linalg.norm(bu - bv + 1e-9, axis=-1)
    e_bond = w.k_bond * jnp.sum(cl.bond_mask * (d - cl.ref_len) ** 2)
    # angles (arccos-free: quadratic in cos keeps gradients finite at
    # linear configurations)
    v1 = a0 - a1
    v2 = a2 - a1
    cos = jnp.sum(v1 * v2, -1) / (
        jnp.linalg.norm(v1 + 1e-9, axis=-1)
        * jnp.linalg.norm(v2 + 1e-9, axis=-1) + 1e-9)
    e_ang = w.k_angle * jnp.sum(cl.angle_mask * (cos - cl.ref_cos) ** 2)
    # planar torsions: sin^2(phi) has minima at 0 AND pi -> flattens the
    # group while preserving the input cis/trans well
    b0 = q1 - q0
    b1 = q2 - q1
    b2 = q3 - q2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    cos_t2 = jnp.sum(n1 * n2, -1) ** 2 / (
        jnp.sum(n1 * n1, -1) * jnp.sum(n2 * n2, -1) + 1e-9)
    e_quad = w.k_planar * jnp.sum(
        cl.quad_mask * (1.0 - jnp.clip(cos_t2, 0.0, 1.0)))
    # sp2 out-of-plane height
    nrm = jnp.cross(s2 - s1, s3 - s1)
    nrm = nrm / (jnp.linalg.norm(nrm + 1e-9, axis=-1, keepdims=True) + 1e-9)
    h = jnp.sum((s0 - s1) * nrm, -1)
    e_sp2 = w.k_sp2 * jnp.sum(cl.sp2_mask * h**2)
    # tetrahedral chirality hinge: keep each center's signed volume on the
    # input-record side with margin (embed.py uses the same form)
    vol = jnp.sum(jnp.cross(c1 - c0, c2 - c0) * (c3 - c0), -1)
    e_chi = w.k_chiral * jnp.sum(
        cl.chiral_mask
        * jnp.maximum(0.5 - cl.chiral_sign * vol, 0.0) ** 2)
    # E/Z hinge: cos(phi) across the stereo double bond stays on the
    # input-record side (the sin^2 planar term alone has minima at BOTH
    # 0 and pi, so a flipped bond would otherwise stay flipped)
    eb0 = z1 - z0
    eb1 = z2 - z1
    eb2 = z3 - z2
    en1 = jnp.cross(eb0, eb1)
    en2 = jnp.cross(eb1, eb2)
    ecos = jnp.sum(en1 * en2, -1) / jnp.sqrt(
        jnp.sum(en1 * en1, -1) * jnp.sum(en2 * en2, -1) + 1e-9)
    e_ez = w.k_ez * jnp.sum(
        cl.ez_mask * jnp.maximum(0.5 - cl.ez_sign * ecos, 0.0) ** 2)
    return e_bond + e_ang + e_quad + e_sp2 + e_chi + e_ez


class _PairTabs(NamedTuple):
    """Pose-independent pair tables hoisted out of the step loop (the
    clash limits/masks and the Vina typing products are rebuilt from the
    topology trees inside every energy eval otherwise — see vina._PairTab
    for the measured cost of leaving them inside)."""

    lim: jnp.ndarray     # [NL, NL] internal-clash limit
    pair_m: jnp.ndarray  # [NL, NL] internal-clash pair mask
    plim: jnp.ndarray    # [NL, NA] ligand-protein clash limit
    pm: jnp.ndarray      # [NL, NA] ligand-protein pair mask
    vtab: vina._PairTab  # ligand-receptor Vina typing
    itab: vina._PairTab  # ligand intra Vina typing


def _pair_tabs(cl: CartesianLigand, vl: vina.VinaLigand,
               cr: CartesianReceptor) -> _PairTabs:
    return _PairTabs(
        lim=CLASH_MARGIN * CLASH_SCALE_INTERNAL * (
            cl.bondi[:, None] + cl.bondi[None, :]),
        pair_m=cl.nb3_mask * cl.mask[:, None] * cl.mask[None, :],
        plim=CLASH_MARGIN * CLASH_SCALE_PROTEIN * (
            cl.bondi[:, None] + cr.bondi[None, :]),
        pm=cl.mask[:, None] * cr.mask[None, :],
        vtab=vina._tab(vl.radius, vl.hydro, vl.donor, vl.acceptor, vl.mask,
                       cr.radius, cr.hydro, cr.donor, cr.acceptor, cr.mask),
        itab=vina._intra_tab(vl),
    )


def clash_energy(x, rec_pos, cl: CartesianLigand, cr: CartesianReceptor,
                 w: RelaxWeights, tabs: _PairTabs | None = None):
    """Quadratic overlap penalties matched to the PoseBusters thresholds
    (with CLASH_MARGIN headroom)."""
    if tabs is None:
        lim = CLASH_MARGIN * CLASH_SCALE_INTERNAL * (
            cl.bondi[:, None] + cl.bondi[None, :])
        pair_m = cl.nb3_mask * cl.mask[:, None] * cl.mask[None, :]
        plim = CLASH_MARGIN * CLASH_SCALE_PROTEIN * (
            cl.bondi[:, None] + cr.bondi[None, :])
        pm = cl.mask[:, None] * cr.mask[None, :]
    else:
        lim, pair_m, plim, pm = tabs.lim, tabs.pair_m, tabs.plim, tabs.pm
    # ligand internal, graph distance >= 3
    d = jnp.linalg.norm(x[:, None, :] - x[None, :, :] + 1e-9, axis=-1)
    e_int = 0.5 * jnp.sum(pair_m * jnp.maximum(lim - d, 0.0) ** 2)
    # ligand-protein
    dp = jnp.linalg.norm(
        x[:, None, :] - rec_pos[None, :, :] + 1e-9, axis=-1)
    e_prot = jnp.sum(pm * jnp.maximum(plim - dp, 0.0) ** 2)
    return w.k_int_clash * e_int + w.k_prot_clash * e_prot


def _vina_inter(x, rec_pos, vl: vina.VinaLigand, cr: CartesianReceptor,
                vtab: vina._PairTab | None = None):
    """Vina inter-molecular terms against the (displaced) packed receptor."""
    if vtab is None:
        vtab = vina._tab(vl.radius, vl.hydro, vl.donor, vl.acceptor,
                         vl.mask, cr.radius, cr.hydro, cr.donor,
                         cr.acceptor, cr.mask)
    d = jnp.linalg.norm(
        x[:, None, :] - rec_pos[None, :, :] + 1e-9, axis=-1)
    e = vina._pair_terms_tab(d - vtab.rr, vtab)
    return jnp.sum(jnp.where((d <= vina.CUTOFF) & vtab.mask, e, 0.0))


def relax_energy(x, drec, x0, rec_pos0, cl: CartesianLigand,
                 vl: vina.VinaLigand, cr: CartesianReceptor,
                 w: RelaxWeights, gat: _BondedGather | None = None,
                 tabs: _PairTabs | None = None):
    rec_pos = rec_pos0 + drec
    e = ligand_bonded_energy(x, cl, w, gat=gat)
    e += clash_energy(x, rec_pos, cl, cr, w, tabs=tabs)
    if tabs is None:
        e += w.w_vina * (_vina_inter(x, rec_pos, vl, cr)
                         + vina.intra_energy(x, vl))
    else:
        e += w.w_vina * (_vina_inter(x, rec_pos, vl, cr, vtab=tabs.vtab)
                         + vina._intra_energy_tab(x, tabs.itab))
    e += w.k_pos_lig * jnp.sum(cl.mask[:, None] * (x - x0) ** 2)
    e += w.k_pos_rec * jnp.sum(cr.mask[:, None] * drec**2)
    return e


# ---------------------------------------------------------------------------
# minimization
# ---------------------------------------------------------------------------


def cartesian_minimize(
    lig_pos0,     # [NL, 3] pose (pocket frame)
    atom14_pos,   # [R, 14, 3] per-pose receptor (pocket frame)
    cl: CartesianLigand,
    vl: vina.VinaLigand,
    cr: CartesianReceptor,
    steps: int = 300,
    lr: float = 0.02,
    weights: RelaxWeights = RelaxWeights(),
    step_unroll: int = 1,
):
    """All-atom Cartesian fine-relax of one complex. Returns
    (lig_pos [NL, 3], atom14_pos [R, 14, 3]) with receptor displacements
    scattered back into the atom14 layout."""
    import optax

    rec_pos0 = atom14_pos.reshape(-1, 3)[cr.pack_idx]
    x0 = lig_pos0
    p0 = {"x": lig_pos0, "d": jnp.zeros_like(rec_pos0)}

    # hoist everything pose-independent out of the 300-step grad loop
    gat = _bonded_gather(cl)
    tabs = _pair_tabs(cl, vl, cr)

    def energy(p):
        return relax_energy(p["x"], p["d"], x0, rec_pos0, cl, vl, cr,
                            weights, gat=gat, tabs=tabs)

    opt = optax.adam(optax.cosine_decay_schedule(lr, steps))

    def body(carry, _):
        p, opt_state = carry
        e, g = jax.value_and_grad(energy)(p)
        updates, opt_state = opt.update(g, opt_state)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), e

    (p, _), _ = jax.lax.scan(body, (p0, opt.init(p0)), None, length=steps,
                             unroll=step_unroll)
    x = jnp.where(cl.mask[:, None] > 0, p["x"], lig_pos0)
    d = p["d"] * cr.mask[:, None]
    a14 = atom14_pos.reshape(-1, 3).at[cr.pack_idx].add(d)
    return x, a14.reshape(atom14_pos.shape)


def cartesian_minimize_batch(lig_pos0, atom14_pos, cls: CartesianLigand,
                             vls: vina.VinaLigand, crs: CartesianReceptor,
                             steps: int = 300, lr: float = 0.02,
                             weights: RelaxWeights = RelaxWeights(),
                             step_unroll: int = 1):
    """vmap over a [B, ...] batch of poses (jit me)."""
    return jax.vmap(lambda lp, a14, c, v, r: cartesian_minimize(
        lp, a14, c, v, r, steps, lr, weights, step_unroll))(
        lig_pos0, atom14_pos, cls, vls, crs)
