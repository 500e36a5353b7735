"""Build the native extensions: `python -m brush_tpu.native.build`.

Compiles colmapio.cpp into _colmapio.<abi>.so next to this file with g++
(no pybind11/pip needed — plain CPython C API). Importers fall back to
pure Python when the extension is absent."""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).parent


def build(verbose: bool = True) -> Path:
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = HERE / f"_colmapio{ext}"
    src = HERE / "colmapio.cpp"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(src), "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, str(HERE))
    import _colmapio  # noqa: F401
    print("import OK:", _colmapio.__doc__)
