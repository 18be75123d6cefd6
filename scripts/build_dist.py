"""Build ``dist/engine.zip`` — the ``--py-files`` archive the north-rule
deployment shape ships to the cluster:

    python scripts/build_dist.py [--out dist/engine.zip]
    spark-submit --py-files dist/engine.zip jobs/validate.py ...

The archive is DETERMINISTIC: entries are walked in sorted order, bytecode
caches are excluded, entries are STORED (uncompressed — immune to
zlib-version DEFLATE drift), and every ZipInfo carries a zeroed timestamp
and fixed permissions — the same source tree always produces the same
sha256 on any Python/zlib build. That makes the artifact itself pinnable in
checkpoint lineage across heterogeneous machines: a resume can assert it is
running the same code that wrote the verdicts it is skipping (the spec-hash
already pins the CONFIG; this pins the CODE).

The package is zipimport-safe: no module reads data files via ``__file__``
(``session.ship_package`` is the one ``__file__`` consumer and it no-ops
when imported from a zip). ``tests/test_pyfiles_packaging.py`` proves the
full shape end-to-end — spark-submit from a directory where the package is
importable ONLY from this archive.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "audit_anomaly_detection_etl_spark"


def build(out_path: str, repo: str = REPO) -> dict:
    """Write the archive; return {path, n_files, sha256}."""
    pkg_root = os.path.join(repo, PKG)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, os.path.dirname(pkg_root))
            entries.append((full, arc.replace(os.sep, "/")))
    out_path = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_STORED
            # S_IFREG | 0644 — some extractors infer entry type from the
            # high (file-type) bits, not just the permission bits.
            info.external_attr = 0o100644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    h = hashlib.sha256()
    with open(out_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return {"path": out_path, "n_files": len(entries), "sha256": h.hexdigest()}


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(
        description=(__doc__ or "Build the --py-files dist archive").splitlines()[0]
    )
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "engine.zip"))
    args = ap.parse_args(argv)
    meta = build(args.out)
    print(json.dumps(meta))
    return meta


if __name__ == "__main__":
    main()
