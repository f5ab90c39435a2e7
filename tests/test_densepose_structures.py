"""DensePose annotation container + flip symmetries + first-party RLE
(straps_tpu/perception/densepose_structures.py vs
`DensePose/densepose/structures.py:10-183` semantics)."""

import numpy as np
import pytest

from straps_tpu.perception import (
    DensePoseDataRelative, DensePoseTransformData, load_transform_data,
    rle_decode, rle_encode,
)
from straps_tpu.perception.densepose_structures import (
    MASK_LABEL_SYMMETRIES, POINT_LABEL_SYMMETRIES, MASK_SIZE,
)


class TestRLE:
    def test_uncompressed_roundtrip(self):
        rng = np.random.RandomState(0)
        mask = (rng.rand(17, 23) > 0.6).astype(np.uint8)
        rle = rle_encode(mask)
        np.testing.assert_array_equal(rle_decode(rle), mask)

    def test_compressed_known_vectors(self):
        # pycocotools LEB128-style string counts: delta-coded from the 4th
        # element on, 5-bit groups, bit 0x20 = continuation, 0x10 = sign.
        # counts [1, 2, 1] on a 2x2 mask, column-major [0, 1, 1, 0]:
        m = rle_decode({"size": [2, 2], "counts": b"121"})
        np.testing.assert_array_equal(m, [[0, 1], [1, 0]])
        # counts [2, 3, 4, 5]: 4th element stored as 5 - counts[1] = 2.
        m2 = rle_decode({"size": [2, 7], "counts": b"2342"})
        flat = m2.T.reshape(-1)
        runs = [2, 3, 4, 5]
        expect = np.concatenate([
            np.full(r, i % 2, np.uint8) for i, r in enumerate(runs)])
        np.testing.assert_array_equal(flat, expect)

    def test_compressed_multibyte_and_negative_delta(self):
        # Encode counts [40, 1, 2, 0] by hand: 40 needs two 5-bit groups
        # (40 = 0b101000 -> groups 01000 (cont -> 8|0x20=40), 00001): chars
        # 48+40='X', 48+1='1'. Elements 1,2: '1','2'; element 3 (i>2) is
        # stored as 0 - counts[1] = -1 -> 0x1f with sign bit: char 48+31='O'.
        m = rle_decode({"size": [43, 1], "counts": b"X112O"})
        flat = m.T.reshape(-1)
        assert flat.sum() == 1 + 0
        assert flat[40] == 1 and flat[41] == 0


class TestTransformData:
    def test_static_label_tables_match_reference(self):
        # structures.py:13-15 verbatim.
        assert list(MASK_LABEL_SYMMETRIES) == [0, 1, 3, 2, 5, 4, 7, 6, 9, 8,
                                               11, 10, 13, 12, 14]
        assert list(POINT_LABEL_SYMMETRIES) == [0, 1, 2, 4, 3, 6, 5, 8, 7,
                                                10, 9, 12, 11, 14, 13, 16,
                                                15, 18, 17, 20, 19, 22, 21,
                                                24, 23]
        # both are involutions
        for tbl in (MASK_LABEL_SYMMETRIES, POINT_LABEL_SYMMETRIES):
            t = np.asarray(tbl)
            np.testing.assert_array_equal(t[t], np.arange(len(t)))

    def test_synthetic_tables_shape_and_involution(self):
        td = DensePoseTransformData.synthetic()
        assert len(td.uv_symmetries["U_transforms"]) == 24
        U = td.uv_symmetries["U_transforms"][0]
        assert U.shape == (256, 256)
        # U(v, U(v,u)*255) == u
        u = np.linspace(0, 1, 256, dtype=np.float32)
        once = U[0, (u * 255).astype(int)]
        twice = U[0, (once * 255).astype(int)]
        np.testing.assert_allclose(twice, u, atol=1e-2)

    def test_load_transform_data_fallback(self):
        td = load_transform_data("/nonexistent/UV_symmetry_transforms.mat")
        assert isinstance(td, DensePoseTransformData)


def _annotation(rng, use_rle=False):
    n = 20
    masks = []
    for i in range(14):
        m = np.zeros((MASK_SIZE, MASK_SIZE), np.uint8)
        if i < 3:
            m[i * 10:i * 10 + 30, 40:90] = 1
        masks.append(rle_encode(m) if use_rle else m)
    return {
        "dp_x": rng.uniform(0, 256, n).astype(np.float32),
        "dp_y": rng.uniform(0, 256, n).astype(np.float32),
        "dp_I": rng.randint(1, 25, n).astype(np.int32),
        "dp_U": rng.uniform(0, 1, n).astype(np.float32),
        "dp_V": rng.uniform(0, 1, n).astype(np.float32),
        "dp_masks": masks,
    }


class TestDataRelative:
    def test_container_and_segm_extraction(self):
        rng = np.random.RandomState(1)
        data = DensePoseDataRelative(_annotation(rng))
        assert data.segm.shape == (256, 256)
        assert set(np.unique(data.segm)).issubset(set(range(15)))
        assert data.x.shape == (20,)
        # RLE-encoded masks give the identical segmentation
        rng = np.random.RandomState(1)
        data_rle = DensePoseDataRelative(_annotation(rng, use_rle=True))
        np.testing.assert_array_equal(data.segm, data_rle.segm)

    def test_validation(self):
        ok, why = DensePoseDataRelative.validate_annotation({"dp_x": []})
        assert not ok and "dp_y" in why

    def test_hflip_involution(self):
        rng = np.random.RandomState(2)
        data = DensePoseDataRelative(_annotation(rng))
        td = DensePoseTransformData.synthetic()
        x0, i0 = data.x.copy(), data.i.copy()
        u0, v0, s0 = data.u.copy(), data.v.copy(), data.segm.copy()
        data.apply_hflip(td)
        assert not np.allclose(data.x, x0)          # actually flipped
        assert (data.segm != s0).any()
        data.apply_hflip(td)
        np.testing.assert_allclose(data.x, x0, atol=1e-5)
        np.testing.assert_array_equal(data.i, i0)
        np.testing.assert_allclose(data.u, u0, atol=1e-2)  # 256-bin LUT
        np.testing.assert_allclose(data.v, v0, atol=1e-2)
        np.testing.assert_array_equal(data.segm, s0)

    def test_hflip_label_semantics(self):
        # a point on part 3 must land on part 4 after a flip (and back).
        ann = _annotation(np.random.RandomState(3))
        ann["dp_I"] = np.full(20, 3, np.int32)
        data = DensePoseDataRelative(ann)
        data.apply_hflip(DensePoseTransformData.synthetic())
        assert (data.i == 4).all()
