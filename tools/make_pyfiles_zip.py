"""Package pubscience_spark for ``spark-submit --py-files`` deployment.

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files out.zip tools/run_pipeline.py <pages> <out_dir>

The zip contains only the package sources (no tests, no caches) so every
executor can import the kernels inside pandas UDFs.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "pubscience_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "pubscience_spark.zip")
    print(build(dest))
