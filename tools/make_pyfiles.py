"""Package the kg module for spark-submit --py-files (BASELINE.json:14).

    python tools/make_pyfiles.py          # writes dist/kg.zip
    spark-submit --py-files dist/kg.zip kg/main.py --input ... --output ...

The zip carries the package INCLUDING the frozen weights.npz so
executors can load the model without shared storage (the broadcast
still ships the weights at runtime; the file is needed only on the
driver, but bundling it makes the artifact self-contained).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "kg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(ROOT, "kg")):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith((".py", ".npz")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
