from . import gasteiger, ligand_feats, mol, protein_feats  # noqa: F401
