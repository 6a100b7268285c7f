"""Build the --py-files artifact: build/fin_ocr_sdk_spark.zip.

The zip contains the package only (no tests/fixtures) and is what every
executor's python workers import on a real cluster."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "fin_ocr_sdk_spark")
OUT = os.path.join(REPO, "build", "fin_ocr_sdk_spark.zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return OUT


if __name__ == "__main__":
    print(build())
