"""Package the kg module for spark-submit --py-files (BASELINE.json:14).

    python tools/make_pyfiles.py           # writes dist/kg.zip
    python tools/make_pyfiles.py --verify  # exit 1 unless every file in
                                           # the zip is byte-identical to
                                           # the working tree
    spark-submit --py-files dist/kg.zip kg/main.py --input ... --output ...

The zip carries the package INCLUDING the frozen weights.npz so
executors can load the model without shared storage (the broadcast
still ships the weights at runtime; the file is needed only on the
driver, but bundling it makes the artifact self-contained).

``--verify`` exists because of round 2's wrap bug: the committed
dist/kg.zip was one commit behind the tree and a driver honoring
--py-files would have run stale code. Wrap steps must run build THEN
verify and commit both together.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_files() -> list[str]:
    out = []
    for dirpath, _, files in os.walk(os.path.join(ROOT, "kg")):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith((".py", ".npz", ".tsv")):
                full = os.path.join(dirpath, f)
                out.append(os.path.relpath(full, ROOT))
    return sorted(out)


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "kg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in _tree_files():
            z.write(os.path.join(ROOT, rel), rel)
    print(out)
    return out


def verify() -> bool:
    """True iff dist/kg.zip exists and matches the working tree file
    for file, byte for byte (extra/missing members count as stale)."""
    out = os.path.join(ROOT, "dist", "kg.zip")
    if not os.path.exists(out):
        print("STALE: dist/kg.zip missing")
        return False
    ok = True
    with zipfile.ZipFile(out) as z:
        members = sorted(n for n in z.namelist() if not n.endswith("/"))
        tree = _tree_files()
        for extra in set(members) - set(tree):
            print(f"STALE: {extra} in zip but not in tree")
            ok = False
        for missing in set(tree) - set(members):
            print(f"STALE: {missing} in tree but not in zip")
            ok = False
        for rel in set(members) & set(tree):
            with open(os.path.join(ROOT, rel), "rb") as f:
                if z.read(rel) != f.read():
                    print(f"STALE: {rel} differs from tree")
                    ok = False
    print("dist/kg.zip matches the working tree" if ok
          else "dist/kg.zip is STALE — rerun tools/make_pyfiles.py")
    return ok


if __name__ == "__main__":
    if "--verify" in sys.argv:
        sys.exit(0 if verify() else 1)
    main()
