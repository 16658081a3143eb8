"""Package ocr_service_spark as a --py-files zip (the north rule's
deployment unit: `spark-submit --py-files` on a multi-executor
cluster). Usage: python tools/make_pyfiles.py [out.zip]"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "ocr_service_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench", "ocr_service_spark.zip")
    print(build(out))
