"""Build dist/ssse_pyfiles.zip for `spark-submit --py-files` (the
north_star deployment path on a real multi-executor cluster):

  spark-submit --py-files dist/ssse_pyfiles.zip your_job.py

Usage: python scripts/make_pyfiles.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "semantic_search_engine_spark"


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "ssse_pyfiles.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in sorted(files):
                if f.endswith((".py", ".md")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    print(out)
    return out


if __name__ == "__main__":
    main()
