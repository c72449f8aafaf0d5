from . import chi, frames, kabsch, rotations, so3, torsion, torus  # noqa: F401
