"""Native layer: builds libmoonshine_tpu.so, runs the C++ host test, and
cross-validates the C++ EXR codec against the Python one."""

import ctypes
import os
import pathlib
import subprocess

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
NATIVE = ROOT / "native"


@pytest.fixture(scope="module")
def native_lib():
    r = subprocess.run(["make", "-C", str(NATIVE)], capture_output=True,
                       text=True)
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr[-400:]}")
    return NATIVE / "libmoonshine_tpu.so"


@pytest.fixture(scope="module")
def exr_lib(native_lib):
    lib = ctypes.CDLL(str(native_lib))
    lib.MsnExrWrite.restype = ctypes.c_int
    lib.MsnExrWrite.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
    ]
    lib.MsnExrRead.restype = ctypes.c_int
    lib.MsnExrRead.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib


def cpp_write(lib, path, img):
    img = np.ascontiguousarray(img, np.float32)
    rc = lib.MsnExrWrite(
        str(path).encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[1], img.shape[0], img.shape[2],
    )
    assert rc == 0, f"MsnExrWrite rc={rc}"


def cpp_read(lib, path):
    out = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.MsnExrRead(str(path).encode(), ctypes.byref(out),
                        ctypes.byref(w), ctypes.byref(h))
    assert rc == 0, f"MsnExrRead rc={rc}"
    arr = np.ctypeslib.as_array(out, shape=(h.value, w.value, 4)).copy()
    lib.MsnExrFree(out)
    return arr


class TestNativeExr:
    def test_cpp_writes_python_reads(self, exr_lib, tmp_path):
        from moonshine_tpu.io import exr

        img = np.random.RandomState(0).rand(21, 33, 3).astype(np.float32) * 8
        p = tmp_path / "cpp.exr"
        cpp_write(exr_lib, p, img)
        back = exr.read_exr(p)
        np.testing.assert_array_equal(back[..., :3], img)

    def test_python_writes_cpp_reads(self, exr_lib, tmp_path):
        from moonshine_tpu.io import exr

        img = np.random.RandomState(1).rand(40, 17, 3).astype(np.float32)
        p = tmp_path / "py.exr"
        exr.write_exr(p, img, compression=exr.ZIP)
        back = cpp_read(exr_lib, p)
        np.testing.assert_array_equal(back[..., :3], img)

    def test_cpp_reads_half(self, exr_lib, tmp_path):
        from moonshine_tpu.io import exr

        img = np.random.RandomState(2).rand(9, 13, 3).astype(np.float32)
        p = tmp_path / "half.exr"
        exr.write_exr(p, img, pixel_type=exr.PT_HALF)
        back = cpp_read(exr_lib, p)
        np.testing.assert_array_equal(
            back[..., :3], img.astype(np.float16).astype(np.float32)
        )


@pytest.mark.slow
class TestShimHost:
    def test_cpp_host_end_to_end(self, native_lib, tmp_path):
        """Compile and run the standalone C++ host (embedded interpreter)."""
        exe = tmp_path / "test_shim"
        r = subprocess.run(
            ["g++", "-O2", "-std=c++17", str(NATIVE / "test_shim.cpp"),
             "-o", str(exe), f"-L{NATIVE}", "-lmoonshine_tpu",
             f"-Wl,-rpath,{NATIVE}"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr[-500:]
        # MSN_PLATFORM beats the axon sitecustomize (capi.py forces the
        # jax config pre-backend-init); JAX_PLATFORMS alone does not
        env = dict(os.environ, PYTHONPATH=str(ROOT), MSN_PLATFORM="cpu")
        r = subprocess.run([str(exe)], capture_output=True, text=True,
                           env=env, timeout=280)
        assert r.returncode == 0, (r.stdout[-300:], r.stderr[-500:])
        assert "shim ok" in r.stdout


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
