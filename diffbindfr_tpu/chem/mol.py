"""Ligand perception: rings, aromaticity, hybridization, valence, H counts.

A dependency-free replacement for the RDKit-derived properties the reference
featurizer consumes (druglib/utils/obj/ligand.py:418-600). Where RDKit runs
full sanitization, we use well-defined structural heuristics: ring perception
via SSSR-style cycle basis, aromaticity from explicit aromatic bond orders or
Hueckel-like planar-ring detection, hybridization from bond orders, implicit
hydrogens from default valences. Feature *semantics* therefore differ
slightly from RDKit, but the model is trained from scratch on the same
featurizer, so consistency is what matters.
"""
from __future__ import annotations

import dataclasses

import networkx as nx
import numpy as np

from ..constants import ligands as lc
from ..constants import periodic as pt
from ..io.sdf import RawMol


@dataclasses.dataclass
class Molecule:
    raw: RawMol
    graph: nx.Graph
    elements: list[str]
    coords: np.ndarray  # [A, 3]
    bonds: np.ndarray  # [B, 2]
    bond_orders: np.ndarray  # [B]
    formal_charges: np.ndarray  # [A]
    rings: list[list[int]]
    aromatic_atoms: np.ndarray  # [A] bool
    aromatic_bonds: np.ndarray  # [B] bool
    degree: np.ndarray  # [A]
    explicit_valence: np.ndarray  # [A] sum of bond orders (aromatic=1.5)
    implicit_h: np.ndarray  # [A]
    hybridization: list[str]
    in_ring_of_size: np.ndarray  # [A, 6] sizes 3..8
    num_rings_per_atom: np.ndarray  # [A]

    @property
    def num_atoms(self) -> int:
        return len(self.elements)


def perceive(raw: RawMol, remove_hs: bool = True) -> Molecule:
    """Build a Molecule with perceived chemistry from a parsed RawMol."""
    elements = list(raw.elements)
    coords = raw.coords.copy()
    bonds = raw.bonds.copy()
    orders = raw.bond_orders.copy()
    charges = raw.formal_charges.copy()

    explicit_h_count = np.zeros(len(elements), dtype=np.int64)
    if remove_hs and "H" in elements:
        heavy = np.array([e != "H" for e in elements])
        remap = -np.ones(len(elements), dtype=np.int64)
        remap[heavy] = np.arange(heavy.sum())
        keep_bonds = []
        for (a, b), o in zip(bonds, orders):
            if elements[a] == "H" and elements[b] != "H":
                explicit_h_count[b] += 1
            elif elements[b] == "H" and elements[a] != "H":
                explicit_h_count[a] += 1
            elif elements[a] != "H" and elements[b] != "H":
                keep_bonds.append((remap[a], remap[b], o))
        elements = [e for e, h in zip(elements, heavy) if h]
        coords = coords[heavy]
        charges = charges[heavy]
        explicit_h_count = explicit_h_count[heavy]
        if keep_bonds:
            arr = np.array(keep_bonds, dtype=np.int64)
            bonds, orders = arr[:, :2], arr[:, 2]
        else:
            bonds = np.zeros((0, 2), dtype=np.int64)
            orders = np.zeros(0, dtype=np.int64)

    na = len(elements)
    g = nx.Graph()
    g.add_nodes_from(range(na))
    for (a, b), o in zip(bonds, orders):
        g.add_edge(int(a), int(b), order=int(o))

    rings = [list(c) for c in nx.cycle_basis(g)]
    ring_sets = [set(r) for r in rings]

    aromatic_atoms = np.zeros(na, dtype=bool)
    aromatic_bonds = np.zeros(len(bonds), dtype=bool)
    # 1) explicit aromatic orders
    for i, ((a, b), o) in enumerate(zip(bonds, orders)):
        if o == 4:
            aromatic_bonds[i] = True
            aromatic_atoms[a] = aromatic_atoms[b] = True
    # 2) kekulized aromatic rings: 5/6-rings of sp2-capable atoms with
    #    alternating single/double pattern
    bond_index = {(min(a, b), max(a, b)): i for i, (a, b) in enumerate(map(tuple, bonds))}
    for ring in rings:
        if len(ring) not in (5, 6):
            continue
        ring_bonds = []
        ok = True
        for k in range(len(ring)):
            a, b = ring[k], ring[(k + 1) % len(ring)]
            bi = bond_index.get((min(a, b), max(a, b)))
            if bi is None:
                ok = False
                break
            ring_bonds.append(bi)
        if not ok:
            continue
        if not all(elements[a] in ("C", "N", "O", "S") for a in ring):
            continue
        ring_orders = orders[ring_bonds]
        n_double = int(np.sum(ring_orders == 2) + np.sum(ring_orders == 4))
        # benzene-like: 3 doubles in 6-ring; heteroaromatics: 2 doubles in
        # 5-ring with one lone-pair donor
        if (len(ring) == 6 and n_double >= 3) or (len(ring) == 5 and n_double >= 2):
            for a in ring:
                aromatic_atoms[a] = True
            for bi in ring_bonds:
                aromatic_bonds[bi] = True

    degree = np.array([g.degree(i) for i in range(na)], dtype=np.int64)

    # explicit valence: sum of bond orders; aromatic counts 1.5 then rounded
    ev = np.zeros(na, dtype=np.float64)
    for i, ((a, b), o) in enumerate(zip(bonds, orders)):
        v = 1.5 if (o == 4 or aromatic_bonds[i]) else float(o)
        ev[a] += v
        ev[b] += v
    explicit_valence = np.ceil(ev - 1e-6).astype(np.int64) + explicit_h_count

    implicit_h = np.zeros(na, dtype=np.int64)
    for i, el in enumerate(elements):
        dv = pt.DEFAULT_VALENCE.get(el)
        if dv is None:
            continue
        target = dv + int(charges[i]) if el in ("N", "O", "S", "P", "C") else dv
        implicit_h[i] = max(0, target - explicit_valence[i])

    hybridization = []
    for i, el in enumerate(elements):
        if el in ("F", "Cl", "Br", "I", "H"):
            hybridization.append("other")
            continue
        max_order = 0
        nbo = []
        for j in g.neighbors(i):
            bi = bond_index[(min(i, j), max(i, j))]
            o = orders[bi]
            nbo.append(o)
            max_order = max(max_order, o if o != 4 else 2)
        if aromatic_atoms[i]:
            hybridization.append("SP2")
        elif 3 in nbo or (nbo.count(2) >= 2 and el == "C"):
            hybridization.append("SP")
        elif 2 in nbo:
            hybridization.append("SP2")
        else:
            heavy_nb = degree[i] + implicit_h[i] + explicit_h_count[i]
            if heavy_nb > 4 and el in ("P", "S"):
                hybridization.append("SP3D" if heavy_nb == 5 else "SP3D2")
            else:
                hybridization.append("SP3")

    in_ring_of_size = np.zeros((na, lc.num_ring_sizes), dtype=np.float32)
    num_rings_per_atom = np.zeros(na, dtype=np.int64)
    for rs in ring_sets:
        size = len(rs)
        for a in rs:
            num_rings_per_atom[a] += 1
            if 3 <= size <= 8:
                in_ring_of_size[a, size - 3] = 1.0

    return Molecule(
        raw=raw,
        graph=g,
        elements=elements,
        coords=coords,
        bonds=bonds,
        bond_orders=orders,
        formal_charges=charges,
        rings=rings,
        aromatic_atoms=aromatic_atoms,
        aromatic_bonds=aromatic_bonds,
        degree=degree + explicit_h_count,
        explicit_valence=explicit_valence,
        implicit_h=implicit_h,
        hybridization=hybridization,
        in_ring_of_size=in_ring_of_size,
        num_rings_per_atom=num_rings_per_atom,
    )


def ring_bond_mask(mol: Molecule) -> np.ndarray:
    """[B] bool: bond participates in any ring."""
    out = np.zeros(len(mol.bonds), dtype=bool)
    ring_sets = [set(r) for r in mol.rings]
    g2 = mol.graph.copy()
    for i, (a, b) in enumerate(map(tuple, mol.bonds)):
        g2.remove_edge(a, b)
        # a bond is in a ring iff removing it keeps endpoints connected
        out[i] = nx.has_path(g2, a, b)
        g2.add_edge(a, b)
    return out
