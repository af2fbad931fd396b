"""Build the --py-files artifact for cluster submission.

The north rule runs the pipeline "via spark-submit --py-files on a
multi-executor cluster"; this packages the pure-Python engine into a
single zip that executors unpack onto their PYTHONPATH:

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/json_ld_spark.zip scripts/submit_smoke.py

Only source files ship (no tests, no caches) — the zip is a few
hundred KB and is what a real deploy attaches to every job.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: "str | None" = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "json_ld_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "json_ld_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
