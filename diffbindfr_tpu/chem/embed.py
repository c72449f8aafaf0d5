"""DG-lite multi-conformer embedding (the ETKDG analogue).

The reference embeds fresh RDKit ETKDG conformers at load time
(DiffBindFR druglib loading.py:64-117) so docking never reuses the input
— often crystal — 3D geometry, and so ring conformers get diversity the
torsion-only diffusion moves cannot create. This module regenerates
conformers from topology + stereo assignment alone:

  * 1-2 and 1-3 target distances (bond lengths / angles — these are
    topology-determined, not conformational)
  * planarity restraints for aromatic/sp2 rings and stereo double bonds
  * chirality signed-volume restraints and E/Z 1-4 distances copied from
    the input stereo ASSIGNMENT (signs/classes, not geometry)
  * vdW lower bounds on all pairs at graph distance >= 3

minimized with Adam from random gaussian starts, vmapped over conformers.
Torsions and saturated-ring pucker come out randomized; stereochemistry is
preserved. Validated against the PoseBusters-style validity suite
(app/validity.py) in tests.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .ligand_feats import LigandRecord

_VDW = {
    "H": 1.1, "C": 1.7, "N": 1.55, "O": 1.52, "F": 1.47, "P": 1.8,
    "S": 1.8, "Cl": 1.75, "Br": 1.85, "I": 1.98, "B": 1.92, "Si": 2.1,
}


class EmbedRestraints(NamedTuple):
    """Host-built static restraint tables for one ligand."""

    pair_idx: np.ndarray  # [P, 2] 1-2 and 1-3 pairs
    pair_target: np.ndarray  # [P]
    nb_mask: np.ndarray  # [A, A] graph distance >= 3
    lower: np.ndarray  # [A, A] lower bounds for nb pairs
    planar_quads: np.ndarray  # [Q, 4] signed volume -> 0
    chiral_quads: np.ndarray  # [S, 4] center + 3 neighbors
    chiral_sign: np.ndarray  # [S] sign of input signed volume
    ez_pairs: np.ndarray  # [Z, 2] substituent pairs across double bonds
    ez_target: np.ndarray  # [Z] input 1-4 distance (cis short / trans long)


def build_restraints(lig: LigandRecord) -> EmbedRestraints:
    from ..app.validity import (_graph_distance_ge3, _neighbor_lists,
                                _sp2_rings, _stereo_double_bonds)

    na = lig.num_atoms
    pos0 = lig.pos - lig.pos.mean(0)
    bonds = lig.bonds
    nbrs = _neighbor_lists(bonds, na)

    # 1-2 + 1-3 pairs with targets from the input conformer (these encode
    # element/hybridization-typical geometry, not the pose)
    pairs, targets = [], []
    for a, b in map(tuple, bonds):
        pairs.append((a, b))
        targets.append(np.linalg.norm(pos0[a] - pos0[b]))
    for j, ns in nbrs.items():
        for x in range(len(ns)):
            for y in range(x + 1, len(ns)):
                a, b = ns[x], ns[y]
                pairs.append((a, b))
                targets.append(np.linalg.norm(pos0[a] - pos0[b]))

    nb_mask = _graph_distance_ge3(bonds, na)
    radii = np.array([_VDW.get(e, 1.7) for e in lig.elements], np.float32)
    lower = 0.75 * (radii[:, None] + radii[None, :])

    # planarity: aromatic rings (consecutive quadruples) + stereo double
    # bonds (the two substituent quadruples)
    quads = []
    for ring in _sp2_rings(lig):
        n = len(ring)
        for k in range(n):
            quads.append([ring[k], ring[(k + 1) % n], ring[(k + 2) % n],
                          ring[(k + 3) % n]])
    stereo = _stereo_double_bonds(lig)
    for a, b, sa, sb, saa, sbb in stereo:
        quads.append([sa, a, b, sb])

    # chirality: atoms with >= 3 heavy neighbors keep their input signed
    # volume's sign (stereo assignment, not geometry)
    cquads, csigns = [], []
    for j, ns in nbrs.items():
        if len(ns) < 3:
            continue
        ns3 = sorted(ns)[:3]
        v = np.dot(
            np.cross(pos0[ns3[0]] - pos0[j], pos0[ns3[1]] - pos0[j]),
            pos0[ns3[2]] - pos0[j],
        )
        if abs(v) < 0.25:  # effectively planar center (sp2) — skip
            continue
        cquads.append([j] + ns3)
        csigns.append(np.sign(v))

    # E/Z: 1-4 distance across each stereo double bond for EVERY
    # substituent pair (fixes the full cis/trans pattern)
    ez_p, ez_t = [], []
    for a, b, sa, sb, saa, sbb in stereo:
        for x in saa:
            for y in sbb:
                ez_p.append((x, y))
                ez_t.append(np.linalg.norm(pos0[x] - pos0[y]))

    z = lambda n: np.zeros((0, n), np.int32)
    return EmbedRestraints(
        pair_idx=np.asarray(pairs, np.int32) if pairs else z(2),
        pair_target=np.asarray(targets, np.float32),
        nb_mask=nb_mask,
        lower=lower.astype(np.float32),
        planar_quads=np.asarray(quads, np.int32) if quads else z(4),
        chiral_quads=np.asarray(cquads, np.int32) if cquads else z(4),
        chiral_sign=np.asarray(csigns, np.float32),
        ez_pairs=np.asarray(ez_p, np.int32) if ez_p else z(2),
        ez_target=np.asarray(ez_t, np.float32),
    )


def _distance_bounds(lig: LigandRecord, r: EmbedRestraints):
    """Classic DG bounds: upper = shortest bond-path sum, lower = vdW (or
    the exact 1-2/1-3 target). [A, A] (lo, hi) float64."""
    na = lig.num_atoms
    inf = 1e6
    hi = np.full((na, na), inf)
    np.fill_diagonal(hi, 0.0)
    for (a, b), t in zip(r.pair_idx, r.pair_target):
        hi[a, b] = hi[b, a] = min(hi[a, b], t)
    # Floyd-Warshall on the 1-2/1-3 skeleton
    for k in range(na):
        hi = np.minimum(hi, hi[:, k, None] + hi[None, k, :])
    lo = r.lower.astype(np.float64).copy()
    for (a, b), t in zip(r.pair_idx, r.pair_target):
        lo[a, b] = lo[b, a] = t
        hi[a, b] = hi[b, a] = t
    np.fill_diagonal(lo, 0.0)
    return lo, np.minimum(np.maximum(hi, lo), 40.0)


def _mds_init(lo, hi, rng):
    """Random-distance-matrix metric embedding (the classic DG move that
    ETKDG refines): sample D within bounds, double-center, take the top-3
    eigenvectors of the Gram matrix."""
    na = lo.shape[0]
    # bias long-range distances toward the upper (extended) bound: compact
    # random matrices embed as interlocked tangles the refiner cannot undo
    d = lo + (hi - lo) * np.sqrt(rng.random((na, na)))
    d = 0.5 * (d + d.T)
    np.fill_diagonal(d, 0.0)
    d2 = d**2
    j = np.eye(na) - np.ones((na, na)) / na
    g = -0.5 * j @ d2 @ j
    w, v = np.linalg.eigh(g)
    idx = np.argsort(w)[::-1][:3]
    return (v[:, idx] * np.sqrt(np.maximum(w[idx], 1e-6))).astype(np.float32)


def embed_conformers(
    lig: LigandRecord,
    n_conf: int,
    seed: int = 0,
    steps: int = 500,
    lr: float = 0.02,
) -> np.ndarray:
    """[n_conf, A, 3] embedded conformers, centered, sorted by restraint
    loss (best first). Pure jax refinement over classical-MDS inits; runs
    fine on CPU for prep-time use."""
    import jax
    import jax.numpy as jnp
    import optax

    r = build_restraints(lig)
    na = lig.num_atoms
    pi = jnp.asarray(r.pair_idx)
    pt = jnp.asarray(r.pair_target)
    nb = jnp.asarray(r.nb_mask)
    lower = jnp.asarray(r.lower)
    pq = jnp.asarray(r.planar_quads)
    cq = jnp.asarray(r.chiral_quads)
    cs = jnp.asarray(r.chiral_sign)
    ez = jnp.asarray(r.ez_pairs)
    ezt = jnp.asarray(r.ez_target)

    def vol(pos, quad):
        p0, p1, p2, p3 = (pos[quad[:, k]] for k in range(4))
        return jnp.sum(jnp.cross(p1 - p0, p2 - p0) * (p3 - p0), axis=-1)

    def loss(pos, w_nb):
        e = 0.0
        if pi.shape[0]:
            d = jnp.linalg.norm(
                pos[pi[:, 0]] - pos[pi[:, 1]] + 1e-9, axis=-1
            )
            e += 30.0 * jnp.sum((d - pt) ** 2)
        dall = jnp.linalg.norm(
            pos[:, None, :] - pos[None, :, :] + 1e-9, axis=-1
        )
        e += w_nb * jnp.sum(
            jnp.where(nb, jnp.maximum(lower - dall, 0.0) ** 2, 0.0)
        )
        if pq.shape[0]:
            e += 3.0 * jnp.sum(vol(pos, pq) ** 2)
        if cq.shape[0]:
            # hinge: keep the signed volume on the input side with margin
            e += 6.0 * jnp.sum(jnp.maximum(0.5 - cs * vol(pos, cq), 0.0) ** 2)
        if ez.shape[0]:
            d = jnp.linalg.norm(
                pos[ez[:, 0]] - pos[ez[:, 1]] + 1e-9, axis=-1
            )
            e += 10.0 * jnp.sum((d - ezt) ** 2)
        return e

    def run_one(pos0):
        # phase 1: hard geometry (bonds/angles/planarity/stereo) without
        # the nonbonded hinge — untangles the MDS init; phase 2 adds the
        # vdW lower bounds at full weight
        def make_scan(w_nb, n, lr0):
            opt = optax.adam(optax.cosine_decay_schedule(lr0, n))

            def body(carry, _):
                pos, st = carry
                l, g = jax.value_and_grad(loss)(pos, w_nb)
                up, st = opt.update(g, st)
                return (optax.apply_updates(pos, up), st), l

            def run(pos):
                (p, _), _ = jax.lax.scan(
                    body, (pos, opt.init(pos)), None, length=n
                )
                return p

            return run

        pos = make_scan(0.02, steps, 0.08)(pos0)
        pos = make_scan(2.0, steps, 0.03)(pos)
        return pos - pos.mean(0), loss(pos, 2.0)

    rng = np.random.default_rng(seed)
    lo, hi = _distance_bounds(lig, r)
    refine = jax.jit(jax.vmap(run_one))
    bonds = lig.bonds
    blen0 = np.linalg.norm(
        (lig.pos[bonds[:, 0]] - lig.pos[bonds[:, 1]]), axis=-1
    )

    def batch(n_try):
        inits = np.stack([_mds_init(lo, hi, rng) for _ in range(n_try)])
        # hand every init the input handedness before refinement: mirror
        # when the first defined stereo center disagrees (the hinge
        # restraint then only fine-tunes, never flips through planarity)
        if r.chiral_quads.shape[0]:
            q = r.chiral_quads[0]
            s0 = r.chiral_sign[0]
            for i in range(n_try):
                p = inits[i]
                v = np.dot(np.cross(p[q[1]] - p[q[0]], p[q[2]] - p[q[0]]),
                           p[q[3]] - p[q[0]])
                if np.sign(v) != s0:
                    inits[i, :, 2] *= -1.0
        return refine(jnp.asarray(inits))

    def ok(c):
        blen = np.linalg.norm(c[bonds[:, 0]] - c[bonds[:, 1]], axis=-1)
        if np.max(np.abs(blen - blen0) / blen0) > 0.08:
            return False
        d = np.linalg.norm(c[:, None] - c[None, :] + 1e-9, axis=-1)
        return bool(d[r.nb_mask].min() > 1.9) if r.nb_mask.any() else True

    # MDS inits occasionally land in interlocked basins the refiner cannot
    # undo; quality-filter and resample until n_conf pass (bounded retries)
    good: list = []
    fallback: list = []
    for _ in range(4):
        need = n_conf - len(good)
        if need <= 0:
            break
        pos, losses = batch(2 * need)
        order = np.argsort(np.asarray(losses))
        for i in order:
            c = np.asarray(pos[i])
            fallback.append((float(losses[i]), c))
            if ok(c) and len(good) < n_conf:
                good.append(c)
    if len(good) < n_conf:
        fallback.sort(key=lambda t: t[0])
        for _, c in fallback:
            if len(good) >= n_conf:
                break
            if not any(c is g for g in good):
                good.append(c)
    return np.stack(good[:n_conf])
