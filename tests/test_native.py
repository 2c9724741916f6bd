"""Native C++ data-plane library: batch .npy load + image normalization."""

import numpy as np
import pytest

from qaig_tpu import native

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native toolchain unavailable")


def test_load_npy_batch(tmp_path, rng):
    shape = (2, 4, 4)
    arrays, paths = [], []
    for i in range(6):
        a = rng.standard_normal(shape).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        with open(p, "wb") as f:
            np.save(f, a, allow_pickle=False)
        arrays.append(a)
        paths.append(p)

    out = native.load_npy_batch(paths, shape, num_threads=3)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_load_npy_batch_bad_shape(tmp_path, rng):
    p = str(tmp_path / "x.npy")
    with open(p, "wb") as f:
        np.save(f, rng.standard_normal((3, 3)).astype(np.float32))
    with pytest.raises(IOError):
        native.load_npy_batch([p], (2, 2))


def test_normalize_images(rng):
    batch = rng.integers(0, 256, (3, 5, 7, 3), dtype=np.uint8)
    got = native.normalize_images(batch)
    want = ((batch.astype(np.float32) - 127.5) / 127.5).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dataset_native_batch_matches_python(tmp_path, rng):
    from qaig_tpu.data.manifest import write_manifest
    from qaig_tpu.data.fmap_dataset import FeatureMapDataset

    rows = []
    for i in range(5):
        a = rng.standard_normal((2, 4, 4)).astype(np.float32)
        p = str(tmp_path / f"f{i}")
        with open(p, "wb") as f:
            np.save(f, a, allow_pickle=False)
        rows.append({"fmap_path": p, "image_path": "n/a"})
    manifest = str(tmp_path / "m.json")
    write_manifest(manifest, rows)

    ds = FeatureMapDataset(manifest)
    batch = ds.load_batch([3, 1, 4])
    assert batch is not None
    want = np.stack([ds[3], ds[1], ds[4]])
    np.testing.assert_array_equal(batch, want)


@pytest.mark.skipif(not native.IMAGE_AVAILABLE,
                    reason="native image library unavailable")
def test_native_image_batch_matches_cv2(tmp_path, rng):
    """The C++ JPEG/PNG decoder must be pixel-identical to the Python cv2
    path (BGR, (x-127.5)/127.5, CHW) on both formats, including a grayscale
    PNG (promoted to 3 channels like cv2's IMREAD_COLOR)."""
    import cv2
    from qaig_tpu.data.manifest import write_manifest
    from qaig_tpu.data.image_dataset import ImageDataset

    h, w = 12, 10
    paths = []
    for i in range(4):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, arr)
        paths.append(p)
    for i in range(4, 7):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, arr)
        paths.append(p)
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    p = str(tmp_path / "gray.png")
    cv2.imwrite(p, gray)
    paths.append(p)

    manifest = str(tmp_path / "dataset.json")
    write_manifest(manifest, [{"image_fpath": p, "labels": []}
                              for p in paths])
    ds = ImageDataset(manifest)

    got = ds.load_batch(list(range(len(paths))))
    assert got is not None, "native batch path did not engage"
    want = np.stack([ds[i] for i in range(len(paths))])
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.IMAGE_AVAILABLE,
                    reason="native image library unavailable")
def test_native_image_batch_dim_mismatch_raises(tmp_path, rng):
    import cv2

    p = str(tmp_path / "small.png")
    cv2.imwrite(p, rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))
    with pytest.raises(IOError):
        native.load_image_batch([p], 8, 8)


@pytest.mark.skipif(not native.IMAGE_AVAILABLE,
                    reason="native image library unavailable")
def test_jpeg_parity_probe_gates_native_path(tmp_path, rng, monkeypatch):
    """JPEG batches go native only when the libjpeg-vs-cv2 probe passes
    bit-exactly; PNG (lossless) is always eligible."""
    import cv2
    from qaig_tpu.data.manifest import write_manifest
    from qaig_tpu.data.image_dataset import ImageDataset

    assert isinstance(native.jpeg_parity_ok(), bool)

    h, w = 8, 8
    paths = []
    for ext in ("jpg", "png"):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"x.{ext}")
        cv2.imwrite(p, arr)
        paths.append(p)
    manifest = str(tmp_path / "dataset.json")
    write_manifest(manifest, [{"image_fpath": p, "labels": []}
                              for p in paths])
    ds = ImageDataset(manifest)

    monkeypatch.setattr(native, "jpeg_parity_ok", lambda: False)
    assert ds.load_batch([0, 1]) is None      # jpeg present -> fall back
    assert ds.load_batch([1]) is not None     # png-only stays native

    monkeypatch.setattr(native, "jpeg_parity_ok", lambda: True)
    got = ds.load_batch([0, 1])
    assert got is not None
    want = np.stack([ds[0], ds[1]])
    np.testing.assert_array_equal(got, want)
