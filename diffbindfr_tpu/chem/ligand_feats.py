"""Ligand graph featurization: 27-dim nodes, 10-dim edges, torsion factory.

Feature layout mirrors the reference featurizer
(druglib/datasets/Docking/mol_pipeline.py:16-134 with properties built in
druglib/utils/obj/ligand.py:495-545):
  node  [27] = symbol, atomic weight, hybridization, degree, implicit
               valence, explicit valence, #rings, aromatic, chirality,
               radical, numHs, formal charge, partial charge,
               ring-size membership [6], pharmacophore families [8]
  edge  [10] = connect-type one-hot [6], stereo, in-ring, conjugated, label
Pharmacophore families use documented structural heuristics instead of
RDKit's BaseFeatures.fdef SMARTS (see _pharmacophores below).
"""
from __future__ import annotations

import dataclasses

import networkx as nx
import numpy as np

from ..constants import ligands as lc
from ..constants import periodic as pt
from .gasteiger import gasteiger_charges
from .mol import Molecule, ring_bond_mask


@dataclasses.dataclass
class LigandRecord:
    """Featurized ligand ready for padding/batching."""

    name: str
    pos: np.ndarray  # [A, 3]
    node_feat: np.ndarray  # [A, 27]
    edge_index: np.ndarray  # [2, E] directed, both ways
    edge_feat: np.ndarray  # [E, 10]
    tor_edge_mask: np.ndarray  # [E] bool
    rot_node_mask: np.ndarray  # [T, A] bool (fragment that rotates)
    elements: list
    bonds: np.ndarray  # [B, 2] undirected
    bond_orders: np.ndarray  # [B]
    formal_charges: np.ndarray  # [A]

    @property
    def num_atoms(self) -> int:
        return self.pos.shape[0]

    @property
    def num_torsions(self) -> int:
        return self.rot_node_mask.shape[0]


def _pharmacophores(mol: Molecule) -> np.ndarray:
    """[A, 8] structural pharmacophore flags (see module docstring)."""
    na = mol.num_atoms
    out = np.zeros((na, lc.num_pharmacophores), dtype=np.float32)
    g = mol.graph
    el = mol.elements
    n_h = mol.implicit_h

    def neighbors(i):
        return list(g.neighbors(i))

    for i in range(na):
        e = el[i]
        nbs = neighbors(i)
        nb_el = [el[j] for j in nbs]
        # Acceptor: O always; N without positive charge and with a lone pair
        if e == "O" and mol.formal_charges[i] <= 0:
            out[i, lc.pharmacophore_to_id["Acceptor"]] = 1
        if e == "N" and mol.formal_charges[i] <= 0 and mol.degree[i] < 4:
            out[i, lc.pharmacophore_to_id["Acceptor"]] = 1
        # Donor: N/O with at least one hydrogen
        if e in ("N", "O") and n_h[i] > 0:
            out[i, lc.pharmacophore_to_id["Donor"]] = 1
        # Aromatic
        if mol.aromatic_atoms[i]:
            out[i, lc.pharmacophore_to_id["Aromatic"]] = 1
        # Hydrophobe: carbon or halogen with no polar neighbors
        if (e == "C" and not any(x in ("N", "O", "S", "P") for x in nb_el)) or e in (
            "Cl",
            "Br",
            "I",
        ):
            out[i, lc.pharmacophore_to_id["Hydrophobe"]] = 1
        # ZnBinder: thiol/thioether S, imidazole-like aromatic N, hydroxyl O
        if e == "S" or (e == "N" and mol.aromatic_atoms[i] and n_h[i] == 0):
            out[i, lc.pharmacophore_to_id["ZnBinder"]] = 1

    # NegIonizable: carboxylate / phosphate / sulfonate heads
    for i in range(na):
        if el[i] not in ("C", "P", "S"):
            continue
        o_term = [
            j
            for j in neighbors(i)
            if el[j] == "O" and mol.graph.degree(j) == 1
        ]
        if len(o_term) >= 2:
            for j in o_term + [i]:
                out[j, lc.pharmacophore_to_id["NegIonizable"]] = 1
    # PosIonizable: sp3 amine with H (not amide), guanidinium carbon
    for i in range(na):
        if el[i] == "N" and mol.hybridization[i] == "SP3" and n_h[i] > 0:
            amide = any(
                el[j] == "C"
                and any(
                    el[k] == "O" and mol.graph.get_edge_data(j, k)["order"] == 2
                    for k in neighbors(j)
                )
                for j in neighbors(i)
            )
            if not amide:
                out[i, lc.pharmacophore_to_id["PosIonizable"]] = 1
        if el[i] == "C":
            n_nb = [j for j in neighbors(i) if el[j] == "N"]
            if len(n_nb) == 3:  # guanidinium / amidinium
                for j in n_nb + [i]:
                    out[j, lc.pharmacophore_to_id["PosIonizable"]] = 1
    # LumpedHydrophobe: all-carbon rings
    for ring in mol.rings:
        if all(el[a] == "C" for a in ring):
            for a in ring:
                out[a, lc.pharmacophore_to_id["LumpedHydrophobe"]] = 1
    return out


def _conjugated_bonds(mol: Molecule) -> np.ndarray:
    """[B] bool: bond between two multi-bonded/aromatic atoms."""
    multi = np.zeros(mol.num_atoms, dtype=bool)
    for (a, b), o in zip(mol.bonds, mol.bond_orders):
        if o >= 2:
            multi[a] = multi[b] = True
    multi |= mol.aromatic_atoms
    out = np.zeros(len(mol.bonds), dtype=bool)
    for i, (a, b) in enumerate(map(tuple, mol.bonds)):
        out[i] = bool(multi[a] and multi[b]) or mol.aromatic_bonds[i]
    return out


def find_torsions(mol: Molecule) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rotatable-bond detection by edge-removal connectivity.

    Returns (tor_bond_mask [B], rot_frag_for_bond [n_tor, A], direction) over
    the *undirected* bond list: a bond is a torsion if removing it splits the
    graph, the smaller fragment has > 1 atom, and we orient u->v so that v
    lies in the rotating (smaller) fragment. Matches the reference
    find_torsion (druglib/datasets/Docking/utils.py:47-93).
    """
    g = mol.graph
    na = mol.num_atoms
    tor_mask = np.zeros(len(mol.bonds), dtype=bool)
    frags = []
    dirs = []  # (u, v) with v in fragment
    for bi, (a, b) in enumerate(map(tuple, mol.bonds)):
        g.remove_edge(a, b)
        if not nx.has_path(g, a, b):
            comp_b = nx.node_connected_component(g, b)
            comp_a = set(range(na)) - comp_b
            small = comp_b if len(comp_b) <= len(comp_a) else comp_a
            if len(small) > 1:
                tor_mask[bi] = True
                m = np.zeros(na, dtype=bool)
                m[list(small)] = True
                frags.append(m)
                dirs.append((a, b) if b in small else (b, a))
        g.add_edge(a, b)
    frag_arr = (
        np.stack(frags) if frags else np.zeros((0, na), dtype=bool)
    )
    dir_arr = np.array(dirs, dtype=np.int64).reshape(-1, 2)
    return tor_mask, frag_arr, dir_arr


def featurize_ligand(mol: Molecule, name: str = "") -> LigandRecord:
    na = mol.num_atoms
    charges = gasteiger_charges(mol)

    sym = np.array(
        [lc.types_index(e, lc.atom_types_with_h) for e in mol.elements],
        dtype=np.float32,
    )
    weight = np.array(
        [pt.ATOMIC_WEIGHT.get(e, 0.0) for e in mol.elements], dtype=np.float32
    )
    hyb = np.array(
        [lc.types_index(h, lc.hybridization_types) for h in mol.hybridization],
        dtype=np.float32,
    )
    node = np.concatenate(
        [
            sym[:, None],
            weight[:, None],
            hyb[:, None],
            mol.degree[:, None].astype(np.float32),
            mol.implicit_h[:, None].astype(np.float32),
            mol.explicit_valence[:, None].astype(np.float32),
            mol.num_rings_per_atom[:, None].astype(np.float32),
            mol.aromatic_atoms[:, None].astype(np.float32),
            np.zeros((na, 1), dtype=np.float32),  # chirality (unassigned)
            np.zeros((na, 1), dtype=np.float32),  # radical electrons
            np.clip(mol.implicit_h, 0, 9)[:, None].astype(np.float32),
            mol.formal_charges[:, None].astype(np.float32),
            charges[:, None],
            mol.in_ring_of_size,
            _pharmacophores(mol),
        ],
        axis=1,
    )
    assert node.shape[1] == lc.LIG_NODE_FEAT_DIM, node.shape

    # directed edges, both directions, sorted by src * NA + dst like the
    # reference (ligand.py:570-575)
    in_ring = ring_bond_mask(mol)
    conj = _conjugated_bonds(mol)
    tor_mask_b, frag_arr, dir_arr = find_torsions(mol)

    src, dst, order, ring_e, conj_e, tor_e = [], [], [], [], [], []
    for bi, (a, b) in enumerate(map(tuple, mol.bonds)):
        for u, v in ((a, b), (b, a)):
            src.append(u)
            dst.append(v)
            order.append(int(mol.bond_orders[bi]) if mol.bond_orders[bi] in (1, 2, 3) else 4)
            ring_e.append(float(in_ring[bi]))
            conj_e.append(float(conj[bi]))
            # torsion marked only on the directed edge u->v whose v rotates
            is_tor = tor_mask_b[bi] and len(dir_arr) > 0
            if is_tor:
                match = np.any((dir_arr[:, 0] == u) & (dir_arr[:, 1] == v))
                tor_e.append(bool(match))
            else:
                tor_e.append(False)
    src = np.array(src, dtype=np.int64)
    dst = np.array(dst, dtype=np.int64)
    perm = np.argsort(src * na + dst, kind="stable")
    edge_index = np.stack([src[perm], dst[perm]])

    # bond orders 1,2,3 -> connect-type ids 0,1,2; 4 (aromatic) -> 3
    order_id = np.array(
        [o - 1 if o in (1, 2, 3) else lc.connect_to_id["AROMATIC"] for o in order],
        dtype=np.int64,
    )
    onehot = np.zeros((len(order), lc.num_connect_types), dtype=np.float32)
    onehot[np.arange(len(order)), order_id] = 1.0
    edge_feat = np.concatenate(
        [
            onehot,
            np.zeros((len(order), 1), dtype=np.float32),  # stereo (none)
            np.array(ring_e, dtype=np.float32)[:, None],
            np.array(conj_e, dtype=np.float32)[:, None],
            np.zeros((len(order), 1), dtype=np.float32),  # bond label: covalent
        ],
        axis=1,
    )[perm]
    assert edge_feat.shape[1] == lc.LIG_EDGE_FEAT_DIM

    tor_edge_mask = np.array(tor_e, dtype=bool)[perm]

    # reorder fragment masks to the directed-edge order of tor_edge_mask
    rot_masks = []
    e_src, e_dst = edge_index
    for k in np.where(tor_edge_mask)[0]:
        u, v = e_src[k], e_dst[k]
        hit = np.where((dir_arr[:, 0] == u) & (dir_arr[:, 1] == v))[0]
        rot_masks.append(frag_arr[hit[0]])
    rot_node_mask = (
        np.stack(rot_masks) if rot_masks else np.zeros((0, na), dtype=bool)
    )

    return LigandRecord(
        name=name or mol.raw.name,
        pos=mol.coords.astype(np.float32),
        node_feat=node.astype(np.float32),
        edge_index=edge_index,
        edge_feat=edge_feat.astype(np.float32),
        tor_edge_mask=tor_edge_mask,
        rot_node_mask=rot_node_mask,
        elements=mol.elements,
        bonds=mol.bonds,
        bond_orders=mol.bond_orders,
        formal_charges=mol.formal_charges,
    )
