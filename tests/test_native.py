"""Native slicecache tests: build, decode parity vs the numpy NIfTI
reader, slice extraction on all axes, mask bbox, LRU reuse."""

import numpy as np
import pytest

from ddgan_tpu import native
from ddgan_tpu.data import read_nifti, write_nifti


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native slicecache failed to build"
)


@pytest.fixture(scope="module")
def volume(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vols")
    rng = np.random.RandomState(0)
    vol = rng.randint(0, 255, (24, 16, 12)).astype(np.float32)
    path = tmp / "v.nii.gz"
    write_nifti(path, vol)
    return str(path), vol


def test_dims(volume):
    path, vol = volume
    assert native.volume_dims(path) == vol.shape


@pytest.mark.parametrize("axis,index", [("x", 3), ("y", 7), ("z", 11), ("z", 0)])
def test_slice_parity(volume, axis, index):
    path, vol = volume
    got = native.read_slice_u8(path, axis, index)
    ref = read_nifti(path)
    sl = {"x": ref[index], "y": ref[:, index], "z": ref[:, :, index]}[axis]
    np.testing.assert_array_equal(got, sl.astype(np.uint8))


def test_slice_out_of_bounds(volume):
    path, _ = volume
    with pytest.raises(IOError):
        native.read_slice_u8(path, "z", 999)


def test_mask_bbox(tmp_path):
    mask = np.zeros((32, 32, 32), np.uint8)
    mask[4:9, 10:12, 20:25] = 1
    p = tmp_path / "m.nii.gz"
    write_nifti(p, mask)
    lo, hi = native.mask_bbox(str(p))
    assert lo == (4, 10, 20)
    assert hi == (8, 11, 24)

    empty = tmp_path / "e.nii.gz"
    write_nifti(empty, np.zeros((8, 8, 8), np.uint8))
    assert native.mask_bbox(str(empty)) is None


def test_uncompressed_nii(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "u.nii"
    write_nifti(p, vol)
    assert native.volume_dims(str(p)) == (2, 3, 4)
    np.testing.assert_array_equal(
        native.read_slice_u8(str(p), "z", 1), vol[:, :, 1].astype(np.uint8)
    )
