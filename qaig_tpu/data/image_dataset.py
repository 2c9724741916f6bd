"""Image dataset over a TinyDB-format manifest.

Pixel-semantics parity with reference ``dataset_loader/image_dataset.py:
11-49``: images are read with OpenCV (**BGR** channel order), scaled to
[-1, 1] via ``(x - 127.5) / 127.5`` and returned NCHW float32.  Keeping BGR
end-to-end means generated images match the reference's color math; the grid
writer flips to RGB at save time exactly like the reference does.
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None

from qaig_tpu.data.manifest import Manifest


class ImageDataset:
    def __init__(self, dataset_path, return_filepaths=False):
        self.return_filepaths = return_filepaths
        self.manifest = Manifest(dataset_path)
        if len(self.manifest) == 0:
            raise ValueError("No data found.")
        self._item_shape = None

    def load_batch(self, indices):
        """Native threaded batch decode (JPEG/PNG -> BGR CHW [-1, 1] in
        C++, pixel-identical to the cv2 path); returns None to fall back
        to per-item cv2 loading."""
        if self.return_filepaths:
            return None
        from qaig_tpu import native
        if not native.IMAGE_AVAILABLE:
            return None
        if self._item_shape is None:
            self._item_shape = self[indices[0]].shape
        c, h, w = self._item_shape
        if c != 3:
            return None
        paths = [self.manifest[i]["image_fpath"] for i in indices]
        # JPEG goes native only when the one-time decode-parity probe
        # confirms bit-equality with cv2 (libjpeg vs libjpeg-turbo IDCT
        # differences otherwise break the pixel-identical contract);
        # PNG is lossless and always eligible.
        if any(p.lower().endswith((".jpg", ".jpeg")) for p in paths) \
                and not native.jpeg_parity_ok():
            return None
        try:
            return native.load_image_batch(paths, h, w)
        except Exception:
            return None

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, index):
        row = self.manifest[index]
        path = row["image_fpath"]
        image = cv2.imread(path)  # (H, W, C) BGR uint8
        if image is None:
            raise IOError(f"Failed to read image: {path}")
        image = (image.astype(np.float32) - 127.5) / 127.5
        image = np.ascontiguousarray(image.transpose(2, 0, 1))  # CHW
        if self.return_filepaths:
            return image, path
        return image
