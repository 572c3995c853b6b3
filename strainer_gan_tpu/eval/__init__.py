from .fid import calculate_fid, fid_from_activations, get_activations  # noqa: F401
from .distances import (  # noqa: F401
    mean_feature_distance,
    pca_wasserstein_distance,
    wasserstein_1d,
)
from .suite import evaluate_run  # noqa: F401
