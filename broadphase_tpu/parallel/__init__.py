"""Multi-chip scaling: sharded broadphase over a jax.sharding.Mesh.

The reference scales with rayon fork-join on one shared-memory node
(``src/layer.rs:522-548``); the TPU build scales over a device mesh with XLA
collectives riding ICI.  The whole persistent-layer surface is sharded, as
the reference's ``parallel`` feature spans its whole API
(``src/layer.rs:146-165``):

* one-shot fused build+scan — :mod:`broadphase_tpu.parallel.scan`
* persistent :class:`ShardedLayer` with repeated scan / batched queries,
  collective-free same-mesh merge, and the host-side checkpoint bridge
  (:func:`gather_layer` / :func:`shard_layer`) —
  :mod:`broadphase_tpu.parallel.layer`
* temporal-coherence update routed to key owners —
  :mod:`broadphase_tpu.parallel.update`
"""

from .scan import (  # noqa: F401
    ShardedScanResult,
    gather_pairs,
    make_sharded_step,
    min_depth_for_devices,
    sharded_scan_step,
)
from .layer import (  # noqa: F401
    ShardedLayer,
    gather_layer,
    make_build_sharded,
    make_merge_sharded,
    make_queries_sharded,
    make_scan_sharded,
    shard_layer,
)
from .update import (  # noqa: F401
    ShardedTracked,
    make_build_tracked_sharded,
    make_update_sharded,
)
