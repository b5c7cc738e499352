#!/usr/bin/env python
"""Fetch the reference's SuiteSparse test matrices (cache-aware).

The analog of /root/reference/test/download_mtx.sh: the reference's
CTest fixture downloads 11 SuiteSparse matrices and registers a 192-test
option sweep over them (test/CMakeLists.txt:15-318).  This script pulls
the same set into tests/data/suitesparse/ as .mtx files; already-present
matrices are skipped, and network failures are reported but non-fatal so
an offline machine (this build environment has zero egress) simply runs
the sweep over whatever is cached — tests/test_suitesparse.py skips
missing matrices.

Usage: python tests/download_mtx.py [name ...]   (default: all 11)
"""
from __future__ import annotations

import io
import os
import sys
import tarfile
import urllib.request

# (group, name) — same list as test/download_mtx.sh
MATRICES = [
    ("TOKAMAK", "utm300"),
    ("Pothen", "mesh3e1"),
    ("Oberwolfach", "t2dal"),
    ("HB", "bcsstk28"),
    ("DRIVCAV", "cavity16"),
    ("HB", "bcsstm08"),
    ("HB", "sherman4"),
    ("Bai", "rdb968"),
    ("CPM", "cz10228"),
    ("TKK", "cbuckle"),
    ("HB", "gemat11"),
]

BASE = "https://suitesparse-collection-website.herokuapp.com/MM"
DEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "suitesparse")


def fetch(group: str, name: str) -> bool:
    out = os.path.join(DEST, f"{name}.mtx")
    if os.path.exists(out):
        print(f"{name}: cached")
        return True
    url = f"{BASE}/{group}/{name}.tar.gz"
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            data = r.read()
    except Exception as e:
        print(f"{name}: download failed ({type(e).__name__}: {e})")
        return False
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        for m in tf.getmembers():
            if m.name.endswith(f"{name}.mtx"):
                os.makedirs(DEST, exist_ok=True)
                with tf.extractfile(m) as f, open(out, "wb") as o:
                    o.write(f.read())
                print(f"{name}: fetched ({os.path.getsize(out)} bytes)")
                return True
    print(f"{name}: .mtx not found in archive")
    return False


def main() -> int:
    want = set(sys.argv[1:])
    ok = 0
    for group, name in MATRICES:
        if want and name not in want:
            continue
        ok += bool(fetch(group, name))
    print(f"{ok} matrices available in {DEST}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
