"""VinaFR flex-PDBQT remodelling round trip on the 3dbs receptor."""
import numpy as np

from diffbindfr_tpu.app.vinafr import (build_vinafr_protein,
                                       parse_flex_pdbqt,
                                       split_top1_flex_pdbqt)
from diffbindfr_tpu.constants import residues as rc
from diffbindfr_tpu.io.pdb import parse_pdb

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"


def _fake_pdbqt(path, prot, res_ids, shift):
    """Synthesize a VinaFR docked PDBQT: 2 MODELs, flexible side chains
    of `res_ids` with coordinates shifted by `shift` in model 1."""
    lines = []
    for model in (1, 2):
        lines.append(f"MODEL {model}")
        lines.append("REMARK VINA RESULT:   -7.0  0.000  0.000")
        for i in res_ids:
            resname = rc.restype_1to3[rc.restypes[prot.aatype[i]]]
            cid = prot.chain_ids[prot.chain_index[i]]
            resnum = int(prot.residue_index[i])
            lines.append(f"BEGIN_RES {resname} {cid} {resnum}")
            for name, j in rc.atom37_order.items():
                if prot.atom_mask[i, j] and name not in ("N", "CA", "C", "O"):
                    x, y, z = prot.atom_positions[i, j] + (
                        shift if model == 1 else 0.0
                    )
                    lines.append(
                        f"ATOM      1 {name:<4}{resname} {cid}{resnum:>4}    "
                        f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00    "
                        f"+0.000 C"
                    )
            lines.append(f"END_RES {resname} {cid} {resnum}")
        lines.append("ENDMDL")
    open(path, "w").write("\n".join(lines) + "\n")


def test_remodel_swaps_top1_sidechains(tmp_path):
    prot = parse_pdb(PDB)
    # pick 3 residues with side chains
    res_ids = [i for i in range(prot.num_res)
               if prot.atom_mask[i].sum() > 5][:3]
    pdbqt = str(tmp_path / "docked.pdbqt")
    _fake_pdbqt(pdbqt, prot, res_ids, shift=np.array([1.5, 0.0, 0.0]))
    out_pdb = str(tmp_path / "remodelled.pdb")
    n = build_vinafr_protein(PDB, pdbqt, out_pdb)
    assert n == 3
    out = parse_pdb(out_pdb)
    cb = rc.atom37_order["CB"]
    i = res_ids[0]
    # model-1 (shifted) side chain adopted; backbone untouched
    np.testing.assert_allclose(
        out.atom_positions[i, cb],
        prot.atom_positions[i, cb] + np.array([1.5, 0, 0]), atol=1e-2)
    ca = rc.atom37_order["CA"]
    np.testing.assert_allclose(
        out.atom_positions[i, ca], prot.atom_positions[i, ca], atol=1e-2)


def test_split_picks_model_1_only(tmp_path):
    prot = parse_pdb(PDB)
    res_ids = [i for i in range(prot.num_res)
               if prot.atom_mask[i].sum() > 5][:1]
    pdbqt = str(tmp_path / "docked.pdbqt")
    _fake_pdbqt(pdbqt, prot, res_ids, shift=np.array([2.0, 0, 0]))
    lines = split_top1_flex_pdbqt(pdbqt)
    m = parse_flex_pdbqt(lines)
    assert len(m) == 1
    (key, atoms), = m.items()
    # shifted coords = model 1
    cbx = prot.atom_positions[res_ids[0], rc.atom37_order["CB"]][0] + 2.0
    assert abs(atoms["CB"][0] - cbx) < 1e-2
