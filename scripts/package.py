"""Build dist/cc_extract.zip for ``spark-submit --py-files``
[D: BASELINE.json north_star "spark-submit --py-files bundling the
pure-Python extractor package"].

    python -m scripts.package [--out dist/cc_extract.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg_root = os.path.join(REPO, "cc_extract")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "cc_extract.zip"))
    args = ap.parse_args()
    path = build(args.out)
    size = os.path.getsize(path)
    print(f"wrote {path} ({size} bytes)")


if __name__ == "__main__":
    main()
