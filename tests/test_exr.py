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
