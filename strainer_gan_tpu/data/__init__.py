from .datasets import load_source, ArrayDataset  # noqa: F401
from .mixers import Mixture, build_mixture  # noqa: F401
from .pipeline import DeviceDataset, normalize_u8, epoch_batch_indices  # noqa: F401
