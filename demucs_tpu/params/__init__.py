"""Weight handling: schemas, pytrees, ggml files, torch checkpoints.

The reference's 2166-line name-matching loader (reference
src/model_load.cpp) collapses here to: a flat name->shape schema per
model family, a generic ggml record parser, and a reshape-and-nest
pass. The same schema drives random initialization for tests/benches.
"""

from .schema import htdemucs_schema, hdemucs_v3_schema  # noqa: F401
from .tree import (  # noqa: F401
    flatten_tree,
    from_state_dict,
    init_flat,
    init_params,
    unflatten_tree,
)
from .ggml import (  # noqa: F401
    GGML_MAGICS,
    load_ggml,
    load_model_params,
    write_ggml,
)
