"""strainer_gan_tpu — TPU-native JAX framework with the capabilities of
hizibu7/Strainer-GAN: GAN training on deliberately contaminated datasets with
on-device data strainers.  See SURVEY.md for the reference analysis."""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import ExperimentConfig, PRESETS, get_preset  # noqa: F401
