"""diffbindfr_tpu: TPU-native flexible protein-ligand docking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HBioquant/DiffBindFR (Chem. Sci. 2024): SE(3)-equivariant diffusion docking
over ligand translation/rotation/torsions and pocket side-chain chi angles,
with on-device pose scoring and ranking, designed for TPU meshes.
"""

__version__ = "0.1.0"
