from qaig_tpu.data.manifest import Manifest
from qaig_tpu.data.image_dataset import ImageDataset
from qaig_tpu.data.fmap_dataset import FeatureMapDataset
from qaig_tpu.data.loader import DataLoader

__all__ = ["Manifest", "ImageDataset", "FeatureMapDataset", "DataLoader"]
