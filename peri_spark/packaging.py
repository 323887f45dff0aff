"""Build the --py-files artifact for spark-submit (north rule: "the whole
pipeline ships via spark-submit --py-files for multi-executor execution").

Usage: ``python -m peri_spark.packaging [outdir]`` → dist/peri_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

__all__ = ["build_zip"]


def build_zip(outdir: str = "dist") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_root)
    os.makedirs(os.path.join(repo, outdir), exist_ok=True)
    out = os.path.join(repo, outdir, "peri_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.join("peri_spark",
                                   os.path.relpath(full, pkg_root))
                z.write(full, rel)
    return out


if __name__ == "__main__":
    dest = build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(dest)
