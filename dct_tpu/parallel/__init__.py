from .mesh import (  # noqa: F401
    choose_parallel_mesh,
    data_parallel_mesh,
    dp_shard_idx,
    make_mesh,
    place_batches,
    place_replicated,
    place_stacked_state,
)
from .spatial import make_spatial_eval  # noqa: F401
