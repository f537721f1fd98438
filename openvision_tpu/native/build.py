"""Builds the native extensions: `python -m openvision_tpu.native.build`.

Regenerates the Unicode tables from this interpreter's unicodedata and
compiles libwordpiece.so with g++. Safe to re-run; the Python fallback is
used automatically when the library is absent.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=HERE, check=True,
            capture_output=not verbose,
        )
        return all(
            os.path.exists(os.path.join(HERE, lib))
            for lib in ("libwordpiece.so", "libindexer.so")
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return False


if __name__ == "__main__":
    ok = build()
    print("native build:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)
