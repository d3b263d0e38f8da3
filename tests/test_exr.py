"""EXR codec round-trips + cross-validation against OpenCV's OpenEXR."""

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import numpy as np
import pytest

from moonshine_tpu.io import exr


def hdr_image(h=33, w=47, c=3, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.rand(h, w, c).astype(np.float32) * 10.0
    img[0, 0, 0] = 0.0
    img[1, 1, 1] = 1e4  # HDR value
    return img


try:
    import cv2

    _probe = "/tmp/_exr_probe.exr"
    cv2.imwrite(_probe, np.zeros((2, 2, 3), np.float32))
    HAVE_CV2_EXR = os.path.exists(_probe)
except Exception:
    HAVE_CV2_EXR = False


class TestPizRle:
    """PIZ (wavelet + Huffman) and RLE, implemented from the OpenEXR spec
    (ImfPizCompressor / ImfHuf / ImfWav / ImfRle). Beyond the bit-exact
    self round-trips here, PIZ and RLE are cross-validated against the
    independent C++ implementation in native/exr_codec.cpp — both
    directions, bit-exact (tests/test_native.py TestPizCrossValidation);
    TestCrossValidation additionally covers external readers when
    available."""

    @pytest.mark.parametrize("compression", [exr.RLE, exr.PIZ])
    @pytest.mark.parametrize("pixel_type", [exr.PT_FLOAT, exr.PT_HALF])
    @pytest.mark.parametrize("shape", [(16, 16, 3), (33, 47, 4),
                                       (1, 7, 3), (5, 1, 3), (70, 3, 3)])
    def test_roundtrip(self, tmp_path, compression, pixel_type, shape):
        rs = np.random.RandomState(sum(shape))
        img = (rs.rand(*shape) * 10 - 2).astype(np.float32)
        if pixel_type == exr.PT_HALF:
            img = img.astype(np.float16).astype(np.float32)
        p = tmp_path / "t.exr"
        exr.write_exr(p, img, compression=compression,
                      pixel_type=pixel_type)
        back = exr.read_exr(p)
        np.testing.assert_array_equal(back[..., :shape[2]], img)

    @pytest.mark.parametrize("compression", [exr.RLE, exr.PIZ])
    def test_constant_image(self, tmp_path, compression):
        """Degenerate case: single-symbol Huffman table / pure runs."""
        img = np.full((40, 40, 3), 0.25, np.float32)
        p = tmp_path / "t.exr"
        exr.write_exr(p, img, compression=compression)
        np.testing.assert_array_equal(exr.read_exr(p)[..., :3], img)

    def test_piz_compresses_smooth_gradients(self, tmp_path):
        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        img = np.stack([np.sin(x / 9), np.cos(y / 13), (x + y) / 192], -1)
        img = img.astype(np.float16).astype(np.float32)
        p1, p2 = tmp_path / "n.exr", tmp_path / "p.exr"
        exr.write_exr(p1, img, compression=exr.NO_COMPRESSION,
                      pixel_type=exr.PT_HALF)
        exr.write_exr(p2, img, compression=exr.PIZ,
                      pixel_type=exr.PT_HALF)
        np.testing.assert_array_equal(exr.read_exr(p2)[..., :3], img)
        assert os.path.getsize(p2) < 0.5 * os.path.getsize(p1)

    def test_wavelet_inverts(self):
        rs = np.random.RandomState(3)
        for shape in ((32, 32), (17, 23), (1, 9), (9, 1), (2, 2)):
            for mx in (1 << 13, 1 << 15):  # w14 and w16 paths
                a = (rs.randint(0, mx + 1, shape)).astype(np.uint16)
                b = a.copy()
                exr._wav2_encode(b, mx)
                exr._wav2_decode(b, mx)
                np.testing.assert_array_equal(a, b)

    def test_huffman_inverts(self):
        rs = np.random.RandomState(4)
        for data in (
            rs.randint(0, 9, 5000).astype(np.uint16),  # runs + skew
            np.repeat(np.uint16(7), 1000),             # one symbol
            rs.randint(0, 60000, 300).astype(np.uint16),  # wide alphabet
            np.zeros(1, np.uint16),
        ):
            packed = exr._huf_compress(data)
            out = exr._huf_uncompress(packed, len(data))
            np.testing.assert_array_equal(out, data)

    def test_rle_bytes_invert(self):
        rs = np.random.RandomState(5)
        for raw in (
            b"\x00" * 400,
            bytes(rs.randint(0, 256, 999, dtype=np.uint8)),
            b"abc" + b"z" * 200 + b"qrst" * 3,
        ):
            assert exr._rle_decode(exr._rle_encode(raw), len(raw)) == raw


class TestRoundTrip:
    @pytest.mark.parametrize("compression", [exr.NO_COMPRESSION, exr.ZIP, exr.ZIPS])
    def test_float_roundtrip(self, tmp_path, compression):
        img = hdr_image()
        p = tmp_path / "t.exr"
        exr.write_exr(p, img, compression=compression)
        back = exr.read_exr(p)
        assert back.shape == (33, 47, 4)
        np.testing.assert_array_equal(back[..., :3], img)
        assert (back[..., 3] == 1.0).all()

    def test_half_roundtrip(self, tmp_path):
        img = hdr_image()
        p = tmp_path / "t.exr"
        exr.write_exr(p, img, pixel_type=exr.PT_HALF)
        back = exr.read_exr(p)
        np.testing.assert_array_equal(
            back[..., :3], img.astype(np.float16).astype(np.float32)
        )

    def test_rgba_roundtrip(self, tmp_path):
        img = hdr_image(c=4)
        p = tmp_path / "t.exr"
        exr.write_exr(p, img)
        back = exr.read_exr(p)
        np.testing.assert_array_equal(back, img)

    def test_tall_image_multiple_chunks(self, tmp_path):
        img = hdr_image(h=70, w=9)  # 5 ZIP chunks, last partial
        p = tmp_path / "t.exr"
        exr.write_exr(p, img, compression=exr.ZIP)
        np.testing.assert_array_equal(exr.read_exr(p)[..., :3], img)

    def test_bytes_input(self, tmp_path):
        img = hdr_image()
        p = tmp_path / "t.exr"
        exr.write_exr(p, img)
        np.testing.assert_array_equal(
            exr.read_exr(p.read_bytes())[..., :3], img
        )

    def test_reject_garbage(self):
        with pytest.raises(ValueError):
            exr.read_exr(b"not an exr at all...")


@pytest.mark.skipif(not HAVE_CV2_EXR, reason="cv2 lacks OpenEXR support")
class TestCrossValidation:
    def test_opencv_reads_ours(self, tmp_path):
        import cv2

        img = hdr_image()
        p = str(tmp_path / "ours.exr")
        exr.write_exr(p, img, compression=exr.ZIP)
        got = cv2.imread(p, cv2.IMREAD_UNCHANGED)  # BGR order
        assert got is not None, "OpenCV could not parse our EXR"
        np.testing.assert_array_equal(got[..., ::-1], img)

    def test_we_read_opencvs(self, tmp_path):
        import cv2

        img = hdr_image()
        p = str(tmp_path / "cv.exr")
        cv2.imwrite(p, img[..., ::-1])  # expects BGR
        back = exr.read_exr(p)
        np.testing.assert_allclose(back[..., :3], img, rtol=1e-3)

    def test_we_read_opencv_half(self, tmp_path):
        import cv2

        img = hdr_image()
        p = str(tmp_path / "cv16.exr")
        cv2.imwrite(
            p, img[..., ::-1],
            [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_HALF],
        )
        back = exr.read_exr(p)
        np.testing.assert_array_equal(
            back[..., :3], img.astype(np.float16).astype(np.float32)
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
