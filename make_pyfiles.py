"""Package crawler_spark for spark-submit --py-files (north-rule launch).

Usage: python make_pyfiles.py  →  dist/crawler_spark.zip
"""

from __future__ import annotations

import os
import zipfile


def main() -> None:
    root = os.path.dirname(os.path.abspath(__file__))
    dist = os.path.join(root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "crawler_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "crawler_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
