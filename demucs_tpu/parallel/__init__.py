"""Multi-chip scaling: device meshes, partition specs, sharded separation.

The reference's only parallelism beyond BLAS threads is track-splitting
across std::threads (reference cli-apps/threaded_inference.hpp:29-193).
Here the same independence structure (segments given fixed weights) maps
onto a `jax.sharding.Mesh`:

  * ``dp``  — data parallel: the segment batch axis. Direct TPU analog
    of the reference's thread-per-track-chunk.
  * ``tp``  — tensor parallel: transformer projection weights sharded
    over ICI (net-new capability; no reference precedent, SURVEY.md §2.3).
  * ``bag`` — BagOfModels parallel: one fine-tuned model per device
    group (reference cli-apps/demucs_ft.cpp:221-241 runs them
    sequentially on one CPU).

All sharding is expressed as PartitionSpecs consumed by ``jax.jit``;
XLA/GSPMD inserts the collectives (all-reduce over tp, none over dp).
"""

from .mesh import make_mesh, mesh_shape_for  # noqa: F401
from .sharding import (  # noqa: F401
    batch_pspec,
    param_pspecs,
    replicated_pspecs,
)
from .separator import (  # noqa: F401
    ShardedSeparator,
    make_bag_fn,
    make_bag_spmd,
    make_sharded_fn,
)
