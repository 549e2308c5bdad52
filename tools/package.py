"""Build the --py-files artifact: dist/voluptuous_spark.zip.

Usage:
    python tools/package.py
    spark-submit --py-files dist/voluptuous_spark.zip \
        tools/submit_validate.py --clips <path> [--transcripts <path>] ...

The zip contains only the package sources (no tests, no caches) so every
executor's Python worker can import ``voluptuous_spark`` — the cluster
deployment path the sandbox's local[] mode stands in for.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "voluptuous_spark")
DIST = os.path.join(ROOT, "dist")


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(DIST, "voluptuous_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(PKG):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    p = build()
    print(p)
