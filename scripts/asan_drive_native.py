"""Sanitizer drive for the C++ NIfTI codec: build with
  g++ -O1 -g -shared -fPIC -std=c++17 -fsanitize=address,undefined \
      native/nifti_native.cpp -o /tmp/libnifti_asan.so -lz -lpthread
then run
  LD_PRELOAD=$(g++ -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 \
      python scripts/asan_drive_native.py
Covers roundtrips (.nii/.nii.gz), two-file hdr/img pairs, and every
error path (garbage, truncation, missing companion, short buffer).
r3 run: clean (no ASan/UBSan reports)."""
import ctypes, os, gzip, struct
import numpy as np
lib = ctypes.CDLL(os.environ.get("NIFTI_ASAN_SO", "/tmp/libnifti_asan.so"))
lib.nifti_probe.restype = ctypes.c_int
lib.nifti_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
lib.nifti_read_f32.restype = ctypes.c_int
lib.nifti_read_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                               ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
lib.nifti_write_f32.restype = ctypes.c_int
lib.nifti_write_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
                                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
print("abi:", lib.nifti_abi_version())

tmp = "/tmp/asan_nifti"
os.makedirs(tmp, exist_ok=True)
rng = np.random.default_rng(0)

def roundtrip(name, shape, compress):
    data = rng.normal(size=shape).astype(np.float32)
    path = os.path.join(tmp, name).encode()
    cshape = (ctypes.c_int64 * len(shape))(*shape)
    aff = (ctypes.c_float * 16)(*np.eye(4, dtype=np.float32).ravel())
    rc = lib.nifti_write_f32(path, np.asfortranarray(data).ravel(order="F").ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(shape), cshape, aff, compress)
    assert rc == 1, rc
    shp = (ctypes.c_int64 * 8)(); a2 = (ctypes.c_float * 16)(); sp = (ctypes.c_float * 3)()
    n = int(np.prod(shape))
    out = np.empty(n, np.float32)
    rc = lib.nifti_read_f32(path, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, shp, a2, sp)
    assert rc == len(shape), rc
    back = np.ascontiguousarray(out.reshape(shape, order="F"))
    assert np.array_equal(back, data)

roundtrip("a.nii", (9, 7, 5), 0)
roundtrip("b.nii.gz", (6, 8, 4), 1)

# two-file pair via splitting
data = rng.normal(size=(5, 6, 7)).astype(np.float32)
path = os.path.join(tmp, "c.nii").encode()
cshape = (ctypes.c_int64 * 3)(5, 6, 7)
aff = (ctypes.c_float * 16)(*np.eye(4, dtype=np.float32).ravel())
lib.nifti_write_f32(path, np.asfortranarray(data).ravel(order="F").ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3, cshape, aff, 0)
payload = open(os.path.join(tmp, "c.nii"), "rb").read()
hdr = bytearray(payload[:348]); hdr[344:348] = b"ni1\x00"
struct.pack_into("<f", hdr, 108, 0.0)
open(os.path.join(tmp, "pair.hdr"), "wb").write(bytes(hdr))
with gzip.open(os.path.join(tmp, "pair.img.gz"), "wb") as fh:
    fh.write(payload[352:])
shp = (ctypes.c_int64 * 8)(); a2 = (ctypes.c_float * 16)(); sp = (ctypes.c_float * 3)()
out = np.empty(5 * 6 * 7, np.float32)
rc = lib.nifti_read_f32(os.path.join(tmp, "pair.hdr").encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        out.size, shp, a2, sp)
assert rc == 3, rc
assert np.array_equal(out.reshape((5, 6, 7), order="F"), data)

# error paths: garbage, truncated, missing img, short buffer
open(os.path.join(tmp, "bad.nii"), "wb").write(b"\x01" * 400)
assert lib.nifti_probe(os.path.join(tmp, "bad.nii").encode(), shp, a2, sp) == -2
open(os.path.join(tmp, "trunc.nii"), "wb").write(payload[:360])
assert lib.nifti_read_f32(os.path.join(tmp, "trunc.nii").encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          out.size, shp, a2, sp) == -5
os.remove(os.path.join(tmp, "pair.img.gz"))
assert lib.nifti_read_f32(os.path.join(tmp, "pair.hdr").encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          out.size, shp, a2, sp) == -8
small = np.empty(3, np.float32)
assert lib.nifti_read_f32(path, small.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          3, shp, a2, sp) == -3
print("ASAN DRIVE OK")
