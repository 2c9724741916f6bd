"""Feature-map (cached encoder latent) dataset.

Contract parity with reference ``dataset_loader/feature_map_dataset.py:
12-64``: each row of the manifest has ``fmap_path`` (a raw ``.npy`` latent of
shape (C, H, W)) and ``image_path``; the image, when requested, is loaded
BGR/[-1,1] **HWC** (the reference skips the CHW permute on this path —
preserved for byte-compat)."""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from qaig_tpu.data.manifest import Manifest


class FeatureMapDataset:
    def __init__(self, dataset_path, load_image=False, return_filepaths=False):
        self.load_image = load_image
        self.return_filepaths = return_filepaths
        self.manifest = Manifest(dataset_path)
        if len(self.manifest) == 0:
            raise ValueError("No data found.")
        self._item_shape = None

    def load_batch(self, indices):
        """Native threaded batch load (plain-fmap mode only); returns None
        to signal the per-item fallback."""
        if self.load_image or self.return_filepaths:
            return None
        from qaig_tpu import native
        if not native.AVAILABLE:
            return None
        if self._item_shape is None:
            self._item_shape = self[indices[0]].shape
        paths = [self.manifest[i]["fmap_path"] for i in indices]
        try:
            return native.load_npy_batch(paths, self._item_shape)
        except Exception:
            return None

    def __len__(self):
        return len(self.manifest)

    def __getitem__(self, index):
        row = self.manifest[index]
        fmap_path = row["fmap_path"]
        with open(fmap_path, "rb") as f:
            fmap = np.load(f).astype(np.float32)

        if self.load_image:
            image_path = row["image_path"]
            image = cv2.imread(image_path)
            image = (image.astype(np.float32) - 127.5) / 127.5
            if self.return_filepaths:
                return fmap, fmap_path, image, image_path
            return fmap, image

        if self.return_filepaths:
            return fmap, fmap_path
        return fmap
