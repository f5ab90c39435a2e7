import os

import numpy as np
import pytest

from straps_tpu.data.native_io import (
    get_library, load_npy_batch, shuffled_indices, mmap_npy,
)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    ref = []
    for i in range(8):
        a = rng.randn(32, 16).astype(np.float32)
        np.save(d / f"{i}.npy", a)
        ref.append(a)
    return d, np.stack(ref)


class TestNativeIO:
    def test_library_builds(self):
        assert get_library() is not None, "native lib failed to build"

    def test_batch_load_matches_numpy(self, npy_dir):
        d, ref = npy_dir
        paths = [str(d / f"{i}.npy") for i in range(8)]
        batch = load_npy_batch(paths, (32, 16))
        np.testing.assert_array_equal(batch, ref)

    def test_shuffle_valid_deterministic(self):
        a = shuffled_indices(513, 7)
        b = shuffled_indices(513, 7)
        c = shuffled_indices(513, 8)
        assert sorted(a.tolist()) == list(range(513))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        assert not np.array_equal(a, np.arange(513))

    def test_mmap_float_and_int(self, npy_dir, tmp_path):
        d, ref = npy_dir
        m = mmap_npy(str(d / "0.npy"))
        np.testing.assert_array_equal(np.asarray(m), ref[0])
        assert not m.flags.writeable
        p = tmp_path / "i64.npy"
        np.save(p, np.arange(100, dtype=np.int64).reshape(10, 10))
        mi = mmap_npy(str(p))
        assert mi.dtype == np.int64
        np.testing.assert_array_equal(np.asarray(mi),
                                      np.arange(100).reshape(10, 10))

    def test_bad_batch_shape_falls_back_or_errors(self, npy_dir, tmp_path):
        # mismatched element count triggers the numpy fallback path, which
        # raises on reshape — either way no silent corruption.
        p = tmp_path / "bad.npy"
        np.save(p, np.zeros((3, 3), np.float32))
        with pytest.raises(Exception):
            load_npy_batch([str(p)], (32, 16))
