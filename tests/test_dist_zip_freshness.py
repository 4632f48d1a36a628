"""The committed spark-submit artifact (dist/trajlib_spark.zip) must stay
byte-in-sync with the trajlib_spark/ source tree: nothing else enforces
freshness, so a source change would otherwise silently ship a stale zip
(ADVICE r5). Rebuild with ``python tools/make_pyfiles.py`` when this
fails."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_matches_source_tree():
    zpath = os.path.join(ROOT, "dist", "trajlib_spark.zip")
    assert os.path.exists(zpath), "dist/trajlib_spark.zip missing — run tools/make_pyfiles.py"
    with zipfile.ZipFile(zpath) as z:
        zipped = {n: z.read(n) for n in z.namelist()}
    src = {}
    pkg = os.path.join(ROOT, "trajlib_spark")
    for dirpath, _dn, filenames in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                src[rel] = open(full, "rb").read()
    assert set(zipped) == set(src), (
        f"zip/source file sets differ: only-zip={set(zipped) - set(src)}, "
        f"only-src={set(src) - set(zipped)} — rerun tools/make_pyfiles.py"
    )
    stale = [n for n in src if zipped[n] != src[n]]
    assert not stale, f"stale files in dist zip: {stale} — rerun tools/make_pyfiles.py"
