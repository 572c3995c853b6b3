from .mesh import (  # noqa: F401
    batch_sharded,
    dp_shardings,
    make_mesh,
    put_batch_sharded,
    put_replicated,
    replicated,
)
from .multihost import initialize, is_primary  # noqa: F401
