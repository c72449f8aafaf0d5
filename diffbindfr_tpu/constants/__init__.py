from . import ligands, periodic, residues  # noqa: F401
