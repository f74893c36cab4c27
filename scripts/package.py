#!/usr/bin/env python
"""Package audioflux_spark for spark-submit --py-files (BASELINE.json M5).

Produces dist/afspark.zip containing the package; usage:

    spark-submit --py-files dist/afspark.zip scripts/build_index_cli.py \
        --input <transcripts dir|parquet|iceberg table> --index-dir <out>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "afspark.zip")
    pkg = os.path.join(REPO, "audioflux_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
