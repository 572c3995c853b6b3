from . import stats, losses, gmm, dbscan, sqrtm  # noqa: F401
