"""Package search_engine_spark/ into the --py-files zip.

    python tools/package_pyfiles.py [out.zip]

Produces a deterministic (fixed timestamps, sorted entries) zip of the
library package, the artifact the north rule ships to executors:

    spark-submit --py-files search_engine_spark.zip jobs/build_index.py ...

Only ``.py`` sources are included; the zip is importable from any
working directory (the package dir sits at the zip root).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip(out: str | Path) -> Path:
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "search_engine_spark"
    files = sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(
                str(p.relative_to(REPO)), date_time=(2020, 1, 1, 0, 0, 0)
            )
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / "dist" / "search_engine_spark.zip"
    )
    print(build_zip(dest))
