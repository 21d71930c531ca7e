"""Native C++ NIfTI decoder vs the pure-Python reader."""

import os

import numpy as np
import pytest

from diffus_tpu.io.nifti import load_nifti, save_nifti
from diffus_tpu.io.native import (
    native_available,
    load_nifti_native,
    load_nifti_fast,
    load_nifti_batch,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / native lib"
)


def test_native_matches_python(tmp_path, rng):
    data = rng.normal(size=(9, 7, 5)).astype(np.float32)
    affine = np.array(
        [[0.5, 0, 0, -3], [0, 0.7, 0, 2], [0, 0, 0.9, 1], [0, 0, 0, 1]], np.float32
    )
    for name in ("v.nii", "v.nii.gz"):
        path = os.path.join(str(tmp_path), name)
        save_nifti(path, data, affine)
        d_py, a_py, s_py = load_nifti(path)
        d_nat, a_nat, s_nat = load_nifti_native(path)
        np.testing.assert_array_equal(d_nat, d_py)
        np.testing.assert_allclose(a_nat, a_py, rtol=1e-6)
        np.testing.assert_allclose(s_nat, s_py, rtol=1e-6)


def test_native_int16_dtype(tmp_path, rng):
    data = rng.integers(-500, 3000, size=(6, 8, 4)).astype(np.int16)
    path = os.path.join(str(tmp_path), "i16.nii.gz")
    save_nifti(path, data)
    d_nat, _, _ = load_nifti_native(path)
    np.testing.assert_array_equal(d_nat, data.astype(np.float32))


def test_native_two_file_pair_matches_python(tmp_path, rng):
    """C++ decoder reads 'ni1' .hdr/.img pairs (plain and gzipped .img)
    identically to the Python reader."""
    from tests.test_io import make_hdr_img_pair

    data = rng.normal(size=(5, 7, 6)).astype(np.float32)
    for gz in (False, True):
        hdr_path = make_hdr_img_pair(tmp_path, data, gzip_img=gz, name=f"p{gz}")
        d_nat, a_nat, s_nat = load_nifti_native(hdr_path)
        d_py, a_py, s_py = load_nifti(hdr_path)
        np.testing.assert_array_equal(d_nat, d_py)
        np.testing.assert_array_equal(d_nat, data)
        np.testing.assert_allclose(a_nat, a_py, rtol=1e-6)
        np.testing.assert_allclose(s_nat, s_py, rtol=1e-6)


def test_native_two_file_missing_img(tmp_path, rng):
    from tests.test_io import make_hdr_img_pair

    data = rng.normal(size=(3, 4, 3)).astype(np.float32)
    hdr_path = make_hdr_img_pair(tmp_path, data, name="lone")
    os.remove(os.path.join(str(tmp_path), "lone.img"))
    with pytest.raises(ValueError, match="code -8"):
        load_nifti_native(hdr_path)


def test_native_abi_version_guard(tmp_path):
    """The loaded .so must report the expected ABI version; the Python
    check exists so a stale library silently falls back instead of being
    called through a mismatched signature."""
    from diffus_tpu.io import native as native_mod

    lib = native_mod._load()
    assert lib is not None
    assert lib.nifti_abi_version() == native_mod._ABI_VERSION


def test_native_error_on_garbage(tmp_path):
    path = os.path.join(str(tmp_path), "bad.nii")
    with open(path, "wb") as fh:
        fh.write(b"\x01" * 500)
    with pytest.raises(ValueError, match="probe failed"):
        load_nifti_native(path)


def test_batch_decode(tmp_path, rng):
    paths = []
    vols = []
    for i in range(5):
        v = rng.normal(size=(6, 5, 4)).astype(np.float32)
        p = os.path.join(str(tmp_path), f"b{i}.nii.gz")
        save_nifti(p, v)
        paths.append(p)
        vols.append(v)
    stack, affine, spacing = load_nifti_batch(paths, threads=3)
    assert stack.shape == (5, 6, 5, 4)
    for i in range(5):
        np.testing.assert_array_equal(stack[i], vols[i])


def test_batch_rejects_shape_mismatch(tmp_path, rng):
    """A batch with one differently-shaped file must raise, not silently
    corrupt the stack (smaller file -> uninitialized tail; same-count
    different-dims -> wrong reshape)."""
    shapes = [(6, 5, 4), (6, 5, 4), (5, 4, 3), (6, 5, 4), (4, 5, 6)]
    paths = []
    for i, shp in enumerate(shapes):
        p = os.path.join(str(tmp_path), f"m{i}.nii.gz")
        save_nifti(p, rng.normal(size=shp).astype(np.float32))
        paths.append(p)
    with pytest.raises(ValueError, match="shape"):
        load_nifti_batch(paths, threads=2)


def test_load_fast_fallback(tmp_path, rng):
    data = rng.normal(size=(4, 4, 4)).astype(np.float32)
    path = os.path.join(str(tmp_path), "f.nii")
    save_nifti(path, data)
    d, _, _ = load_nifti_fast(path)
    np.testing.assert_array_equal(d, data)


def test_native_writer_roundtrips(tmp_path, rng):
    """Native write -> python read AND python write -> native read agree
    byte-for-byte on voxels and affine (.nii and .nii.gz)."""
    from diffus_tpu.io.native import save_nifti_native

    data = rng.normal(size=(7, 6, 5)).astype(np.float32)
    affine = np.array(
        [[0.5, 0, 0, -3], [0, 0.7, 0, 2], [0, 0, 0.9, 1], [0, 0, 0, 1]], np.float32
    )
    for name in ("w.nii", "w.nii.gz"):
        path = os.path.join(str(tmp_path), name)
        save_nifti_native(path, data, affine)
        d_py, a_py, s_py = load_nifti(path)
        np.testing.assert_array_equal(d_py, data)
        np.testing.assert_allclose(a_py, affine, rtol=1e-6)
        d_nat, a_nat, _ = load_nifti_native(path)
        np.testing.assert_array_equal(d_nat, data)
        np.testing.assert_allclose(a_nat, affine, rtol=1e-6)

    # native-written bytes must equal the python writer's exactly
    p_nat = os.path.join(str(tmp_path), "eq_nat.nii")
    p_py = os.path.join(str(tmp_path), "eq_py.nii")
    save_nifti_native(p_nat, data, affine)
    save_nifti(p_py, data, affine)
    with open(p_nat, "rb") as f1, open(p_py, "rb") as f2:
        assert f1.read() == f2.read()
