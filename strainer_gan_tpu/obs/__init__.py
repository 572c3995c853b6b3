from .metrics import MetricsLogger  # noqa: F401
from .images import save_image_grid, make_grid  # noqa: F401
