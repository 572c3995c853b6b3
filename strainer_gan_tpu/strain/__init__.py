from .score import score_d_losses, score_features, score_ae_errors  # noqa: F401
from .thresholds import (  # noqa: F401
    zscore_fixed_mask,
    zscore_elbow_mask,
    zscore_quantile_mask,
    gmm_mask,
    ensemble_mask,
    percentile_refine_mask,
    ae_error_mask,
)
from .engine import StrainerEngine  # noqa: F401
from .pool import build_fake_pool  # noqa: F401
