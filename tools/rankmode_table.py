"""Per-complex top-1 L-RMSD under each ranking mode, from a results.csv.

The VERDICT round-3 task-4 comparison: for every complex, the L-RMSD of
the pose each ranking mode (mdn, mdn_nll, vina) would pick, next to the
oracle best-of-N — finer-grained than the reporter's gold-cutoff rates.

Usage: python tools/rankmode_table.py results.csv [results2.csv ...]
"""
import csv
import sys


def fnum(r, k):
    try:
        return float(r[k])
    except (KeyError, TypeError, ValueError):
        return None


def table(path):
    rows = list(csv.DictReader(open(path)))
    by = {}
    for r in rows:
        by.setdefault(r["complex_name"], []).append(r)
    modes = [("mdn", "mdn_score", -1), ("mdn_nll", "mdn_nll", 1),
             ("vina", "vina_score", 1)]
    out = [f"== {path} ({len(rows)} poses)"]
    hdr = f"{'complex':>8} " + "".join(
        f"{m:>9}" for m, _, _ in modes) + f"{'oracle':>9}"
    out.append(hdr + "   (top-1 L-RMSD, A)")
    wins = {m: 0 for m, _, _ in modes}
    for name in sorted(by):
        ps = by[name]
        cells = []
        picks = {}
        for mode, key, sign in modes:
            scored = [r for r in ps if fnum(r, key) is not None
                      and fnum(r, "l_rmsd") is not None]
            if not scored:
                cells.append(f"{'—':>9}")
                continue
            pick = min(scored, key=lambda r: sign * fnum(r, key))
            picks[mode] = fnum(pick, "l_rmsd")
            cells.append(f"{picks[mode]:9.2f}")
        best = min(fnum(r, "l_rmsd") for r in ps
                   if fnum(r, "l_rmsd") is not None)
        cells.append(f"{best:9.2f}")
        out.append(f"{name:>8} " + "".join(cells))
        if "mdn" in picks and "vina" in picks and picks["mdn"] <= picks["vina"]:
            wins["mdn"] += 1
        if ("mdn_nll" in picks and "vina" in picks
                and picks["mdn_nll"] <= picks["vina"]):
            wins["mdn_nll"] += 1
    n = len(by)
    out.append(f"[mdn <= vina: {wins['mdn']}/{n}]  "
               f"[mdn_nll <= vina: {wins['mdn_nll']}/{n}]")
    return "\n".join(out)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(table(p))
        print()
