"""One-time extractor: pull amino-acid data tables (AF2/CCD literature values)
out of the reference's constants module via AST literal parsing, and emit a
compact whitespace text resource for diffbindfr_tpu.

Data provenance: AlphaFold2 residue_constants (Apache-2.0, DeepMind), which in
turn encodes CCD ideal geometry. These are physical constants, not code.
"""
import ast, sys, json

SRC = "/root/reference/druglib/utils/obj/protein_constants.py"
OUT = "/root/repo/diffbindfr_tpu/constants/residue_data.txt"

WANT = {
    "chi_angles_atoms", "chi_angles_mask", "chi_pi_periodic",
    "rigid_group_atom_positions", "residue_atoms",
    "restype_name_to_atom14_names", "restype_1to3",
    "van_der_waals_radius", "restypes", "atom_types",
}

tree = ast.parse(open(SRC).read())
found = {}
for node in ast.walk(tree):
    if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
        name = node.targets[0].id
        if name in WANT and name not in found:
            try:
                found[name] = ast.literal_eval(node.value)
            except Exception as e:
                print("skip", name, e)

missing = WANT - set(found)
assert not missing, missing

lines = []
# section: restypes (1-letter order) and 3-letter names
lines.append("[restypes]")
lines.append(" ".join(found["restypes"]))
lines.append("[restype_1to3]")
for k in found["restypes"]:
    lines.append(f"{k} {found['restype_1to3'][k]}")
lines.append("[atom37]")
lines.append(" ".join(found["atom_types"]))
lines.append("[atom14]")
for res3 in [found['restype_1to3'][r] for r in found["restypes"]]:
    names = found["restype_name_to_atom14_names"][res3]
    lines.append(res3 + " " + " ".join(n if n else "-" for n in names))
lines.append("[chi_atoms]")
for res3, chis in found["chi_angles_atoms"].items():
    for i, quad in enumerate(chis):
        lines.append(f"{res3} {i+1} " + " ".join(quad))
lines.append("[chi_pi_periodic]")
for r, mask in zip(found["restypes"], found["chi_pi_periodic"]):
    lines.append(f"{found['restype_1to3'][r]} " + " ".join(str(int(m)) for m in mask))
lines.append("[rigid_group_positions]")
# rows: res3 atom group x y z
for res3, rows in found["rigid_group_atom_positions"].items():
    for atom, group, xyz in rows:
        x, y, z = xyz
        lines.append(f"{res3} {atom} {group} {x:.4f} {y:.4f} {z:.4f}")
lines.append("[vdw_radius]")
for el, r in found["van_der_waals_radius"].items():
    lines.append(f"{el} {r}")
open(OUT, "w").write("\n".join(lines) + "\n")
print("wrote", OUT, len(lines), "lines")
