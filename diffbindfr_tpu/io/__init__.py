from . import pdb, sdf  # noqa: F401
