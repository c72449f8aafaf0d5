"""Pocket residue selection + viewer-string formatting on the 3dbs example."""
import os

import numpy as np

from diffbindfr_tpu.app import pocket_viz as PV

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"
SDF = "/root/reference/examples/forward/3dbs_protein_crystal.sdf"


def test_pocket_resnums_and_strings(tmp_path):
    res = PV.pocket_resnums(PDB, ligand_file=SDF, cutoff=7.0)
    assert res, "pocket must be non-empty"
    n = sum(len(v) for v in res.values())
    assert 10 <= n <= 80, n
    nv = PV.to_nglview_selection(res)
    pd = PV.to_prody_selection(res)
    pm = PV.to_pymol_selection(res)
    assert " and :" in nv and "resnum" in pd and "resi" in pm
    # center-based variant agrees closely with the ligand-based one
    from diffbindfr_tpu.io.sdf import parse_ligand_file

    c = parse_ligand_file(SDF)[0].coords.mean(0)
    res_c = PV.pocket_resnums(PDB, center=c, cutoff=14.0)
    all_l = {(k, r) for k, v in res.items() for r in v}
    all_c = {(k, r) for k, v in res_c.items() for r in v}
    assert len(all_l & all_c) / len(all_l) > 0.9

    pml = str(tmp_path / "view.pml")
    PV.write_pymol_script(pml, PDB, ["pose0.sdf"], res, crystal_lig=SDF)
    txt = open(pml).read()
    assert "load" in txt and "pocket" in txt and "pose_0" in txt
