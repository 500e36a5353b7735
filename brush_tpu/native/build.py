"""Build the native components: `python -m brush_tpu.native.build`.

- colmapio.cpp  -> _colmapio.<abi>.so (CPython extension, COLMAP parser)
- ffi.cpp       -> libbrush_tpu_ffi.so (C ABI: embed-Python train_and_save,
                   header at include/brush_tpu_ffi.h)

Plain g++ + the CPython C API — no pybind11/pip needed. Importers fall
back to pure Python when an artifact is absent."""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).parent


def _compile(src: Path, out: Path, extra: list[str], verbose: bool) -> Path:
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", str(src), "-o", str(out), *extra]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build(verbose: bool = True) -> Path:
    """Build the COLMAP parser extension; returns its path."""
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _compile(HERE / "colmapio.cpp", HERE / f"_colmapio{ext}",
                    [], verbose)


def build_ffi(verbose: bool = True) -> Path:
    """Build the C-ABI library; returns its path.

    Linked against libpython so a plain C host can embed the interpreter;
    when loaded into an existing Python process (ctypes) the symbols are
    already present and only the GIL is taken."""
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    version = sysconfig.get_config_var("LDVERSION") or ""
    extra = [f"-L{libdir}", f"-lpython{version}", f"-Wl,-rpath,{libdir}"]
    return _compile(HERE / "ffi.cpp", HERE / "libbrush_tpu_ffi.so",
                    extra, verbose)


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    ffi_path = build_ffi()
    print(f"built {ffi_path}")
    sys.path.insert(0, str(HERE))
    import _colmapio  # noqa: F401
    print("import OK:", _colmapio.__doc__)
