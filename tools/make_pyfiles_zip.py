"""Build the spark-submit --py-files archive.

The north-rule deployment shape is ``spark-submit --py-files
datacheck_spark.zip datacheck_spark/cli.py <cmd> ...`` on a
multi-executor cluster: the zip ships the package to every executor's
PYTHONPATH. Usage::

    python tools/make_pyfiles_zip.py [out.zip]

The archive contains only the package sources (no tests, caches, or
bytecode) with deterministic entry ordering and timestamps, so the same
tree always produces byte-identical artifacts (reproducible deploys).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "datacheck_spark"

#: fixed timestamp for reproducible archives (zip epoch floor is 1980)
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)


def build(out_path: str) -> list[str]:
    names = sorted(
        p
        for p in PKG.rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in names:
            arcname = str(p.relative_to(ROOT))
            info = zipfile.ZipInfo(arcname, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return [str(p.relative_to(ROOT)) for p in names]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else str(ROOT / "datacheck_spark.zip")
    names = build(out)
    print(f"{out}: {len(names)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
