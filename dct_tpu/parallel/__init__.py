from .mesh import (  # noqa: F401
    make_mesh,
    place_batches,
    place_replicated,
    place_stacked_state,
)
