"""Synthetic DockingSample generator for tests, benchmarks, and dry runs.

Produces geometrically plausible random pocket/ligand clouds exercising all
mask paths (padded nodes/edges/torsions/chis) without any file IO.
"""
from __future__ import annotations

import numpy as np

from .sample import Buckets, DockingSample


def synthetic_sample(
    rng: np.random.Generator,
    buckets: Buckets | None = None,
    fill: float = 0.8,
) -> DockingSample:
    b = buckets or Buckets(n_lig=16, n_lig_edges=40, n_tor=6, n_res=8, n_atm=48)
    nl, el, nt, r, na = b.n_lig, b.n_lig_edges, b.n_tor, b.n_res, b.n_atm
    ncab = b.n_cab

    nl_real = max(4, int(nl * fill))
    na_real = max(8, int(na * fill))
    r_real = max(2, int(r * fill))
    nt_real = max(1, min(nt - 1, nl_real - 3))

    lig_pos = np.zeros((nl, 3), np.float32)
    lig_pos[:nl_real] = rng.normal(size=(nl_real, 3)) * 2.0
    lig_mask = np.zeros(nl, np.float32)
    lig_mask[:nl_real] = 1

    # chain covalent bonds, both directions
    src = np.arange(nl_real - 1)
    e_src = np.zeros(el, np.int32)
    e_dst = np.zeros(el, np.int32)
    n_cov = min(2 * (nl_real - 1), el)
    half = n_cov // 2
    e_src[:half], e_dst[:half] = src[:half], src[:half] + 1
    e_src[half:n_cov], e_dst[half:n_cov] = src[: n_cov - half] + 1, src[: n_cov - half]
    e_mask = np.zeros(el, np.float32)
    e_mask[:n_cov] = 1

    tor_src = np.zeros(nt, np.int32)
    tor_dst = np.zeros(nt, np.int32)
    tor_mask = np.zeros(nt, np.float32)
    tor_src[:nt_real] = np.arange(nt_real) + 1
    tor_dst[:nt_real] = np.arange(nt_real) + 2
    tor_mask[:nt_real] = 1
    rot_node_mask = np.zeros((nt, nl), np.float32)
    for k in range(nt_real):
        rot_node_mask[k, k + 2 : nl_real] = 1

    atm_pos = np.zeros((na, 3), np.float32)
    atm_pos[:na_real] = rng.normal(size=(na_real, 3)) * 6.0
    atm_mask = np.zeros(na, np.float32)
    atm_mask[:na_real] = 1
    atm_feat = np.zeros((na, 5), np.int64)
    atm_feat[:na_real] = np.stack(
        [
            rng.integers(0, 37, na_real),
            rng.integers(0, 22, na_real),
            rng.integers(0, 4, na_real),
            rng.integers(0, 21, na_real),
            rng.integers(0, 2, na_real),
        ],
        axis=-1,
    )
    ncab_real = min(ncab - 1, max(2, na_real // 4))
    cab_idx = np.zeros(ncab, np.int32)
    cab_idx[:ncab_real] = rng.choice(na_real, ncab_real, replace=False)
    cab_mask = np.zeros(ncab, np.float32)
    cab_mask[:ncab_real] = 1
    noncab_mask = atm_mask.copy()
    noncab_mask[cab_idx[:ncab_real]] = 0

    sc_src = np.zeros((r, 4), np.int32)
    sc_dst = np.zeros((r, 4), np.int32)
    chi_mask = np.zeros((r, 4), np.float32)
    for i in range(r_real):
        nchi = int(rng.integers(1, 5))
        sc_src[i, :nchi] = rng.integers(0, na_real, nchi)
        sc_dst[i, :nchi] = rng.integers(0, na_real, nchi)
        chi_mask[i, :nchi] = 1

    # identity frames / templates keep the rebuild well-defined
    eye3 = np.tile(np.eye(3, dtype=np.float32), (r, 1, 1))
    eye4 = np.tile(np.eye(4, dtype=np.float32), (r, 8, 1, 1))
    res_mask = np.zeros(r, np.float32)
    res_mask[:r_real] = 1
    atom14_mask = np.zeros((r, 14), np.float32)
    atom14_mask[:r_real, :8] = 1

    return DockingSample(
        lig_feat=(rng.normal(size=(nl, 27)).astype(np.float32) * lig_mask[:, None]),
        lig_pos=lig_pos,
        lig_ref_pos=lig_pos.copy(),
        lig_mask=lig_mask,
        lig_e_src=e_src,
        lig_e_dst=e_dst,
        lig_e_feat=(rng.normal(size=(el, 10)).astype(np.float32) * e_mask[:, None]),
        lig_e_mask=e_mask,
        tor_src=tor_src,
        tor_dst=tor_dst,
        tor_mask=tor_mask,
        rot_node_mask=rot_node_mask,
        atm_pos=atm_pos,
        atm_mask=atm_mask,
        atm_feat=atm_feat,
        cab_idx=cab_idx,
        cab_mask=cab_mask,
        noncab_mask=noncab_mask,
        sc_src=sc_src,
        sc_dst=sc_dst,
        chi_mask=chi_mask,
        aatype=np.zeros(r, np.int32),
        res_mask=res_mask,
        backbone_rots=eye3,
        backbone_transl=(rng.normal(size=(r, 3)).astype(np.float32) * 6.0),
        default_frame=eye4,
        template_pos=(rng.normal(size=(r, 14, 3)).astype(np.float32)
                      * atom14_mask[..., None]),
        group_idx=np.zeros((r, 14), np.int32),
        atom14_mask=atom14_mask,
        torsion_angle=(rng.uniform(-np.pi, np.pi, (r, 5)).astype(np.float32)),
        pack_flat=np.arange(na, dtype=np.int32) % (r * 14),
        pocket_center=np.zeros(3, np.float32),
    )


def synthetic_batch(rng: np.random.Generator, n: int, buckets=None, fill=0.8):
    import jax
    import jax.numpy as jnp

    from .sample import stack_samples

    samples = [synthetic_sample(rng, buckets, fill) for _ in range(n)]
    return jax.tree.map(jnp.asarray, stack_samples(samples))
