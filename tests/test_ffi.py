"""C ABI round-trip: build libbrush_tpu_ffi.so, load it with ctypes, and
drive a tiny training run through `brush_train_and_save` — progress
callback, JSON options routing, error codes, and cancellation
(counterpart of the reference's C FFI, apps/brush-c/src/lib.rs)."""

import ctypes
import json

import pytest

from tests.test_dataset_formats import write_colmap_bin

CB_TYPE = ctypes.CFUNCTYPE(ctypes.c_int32, ctypes.c_char_p, ctypes.c_void_p)


@pytest.fixture(scope="module")
def lib():
    from brush_tpu.native.build import build_ffi
    path = build_ffi(verbose=False)
    lib = ctypes.CDLL(str(path))
    lib.brush_train_and_save.restype = ctypes.c_int32
    lib.brush_train_and_save.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, CB_TYPE, ctypes.c_void_p]
    lib.brush_last_error.restype = ctypes.c_char_p
    lib.brush_abi_version.restype = ctypes.c_int32
    return lib


def test_abi_version(lib):
    assert lib.brush_abi_version() == 1


def test_train_and_save_roundtrip(lib, tmp_path):
    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    out = tmp_path / "ffi_{iter}.ply"
    options = json.dumps({
        "total_train_iters": 4, "log_every": 2, "eval_every": 0,
        "export_every": 0, "export_path": str(out), "init_count": 0,
        "sh_degree": 1, "use_pallas": False, "max_resolution": 32,
    })

    messages = []

    @CB_TYPE
    def cb(payload, user_data):
        messages.append(json.loads(payload.decode()))
        return 0

    rc = lib.brush_train_and_save(
        str(tmp_path / "scene").encode(), options.encode(), cb, None)
    assert rc == 0, lib.brush_last_error().decode()

    kinds = {m["kind"] for m in messages}
    assert "step" in kinds and "export" in kinds
    assert (tmp_path / "ffi_4.ply").exists()


def test_cancellation(lib, tmp_path):
    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    options = json.dumps({
        "total_train_iters": 50, "log_every": 1, "eval_every": 0,
        "export_every": 0,
        "export_path": str(tmp_path / "c_{iter}.ply"), "init_count": 0,
        "sh_degree": 1, "use_pallas": False, "max_resolution": 32,
    })
    seen = []

    @CB_TYPE
    def cb(payload, user_data):
        seen.append(json.loads(payload.decode()))
        return 1  # cancel immediately

    rc = lib.brush_train_and_save(
        str(tmp_path / "scene").encode(), options.encode(), cb, None)
    assert rc == 0
    # Only messages up to the first callback were delivered.
    assert len(seen) == 1


def test_error_paths(lib, tmp_path):
    # NULL dataset path.
    fn = lib.brush_train_and_save
    fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
                   ctypes.c_void_p]
    assert fn(None, None, None, None) == 4  # BRUSH_ERR_BAD_ARG

    # Unknown option key -> training error with a message.
    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    rc = fn(str(tmp_path / "scene").encode(),
            json.dumps({"not_a_real_option": 1}).encode(), None, None)
    assert rc == 3  # BRUSH_ERR_TRAIN
    assert b"not_a_real_option" in lib.brush_last_error()


def test_header_compiles_as_c(tmp_path):
    """The public header must be valid C99."""
    import subprocess
    from brush_tpu.native.build import HERE
    src = tmp_path / "smoke.c"
    src.write_text(
        '#include "brush_tpu_ffi.h"\n'
        "int main(void) { return BRUSH_OK; }\n")
    subprocess.run(
        ["gcc", "-std=c99", "-Wall", "-Werror",
         f"-I{HERE / 'include'}", str(src), "-o", str(tmp_path / "smoke")],
        check=True)
    subprocess.run([str(tmp_path / "smoke")], check=True)
