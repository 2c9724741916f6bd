from qaig_tpu.utils.checkpoint import save_model, load_model, tolerant_restore
from qaig_tpu.utils.image_io import save_images

__all__ = ["save_model", "load_model", "tolerant_restore", "save_images"]
