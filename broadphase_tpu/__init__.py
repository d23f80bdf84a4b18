"""broadphase_tpu — a TPU-native broadphase collision-detection engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
zvxryb/broadphase-rs (see SURVEY.md).  Public surface mirrors the reference
crate root (``src/lib.rs:80-82``): Bounds / SystemBounds geometry helpers,
the SpatialIndex specs (Index32_2D, Index64_2D, Index64_3D), and the
Layer / LayerBuilder engine.
"""

from .index import (  # noqa: F401
    IndexSpec,
    Index32_2D,
    Index64_2D,
    Index64_3D,
)
from . import geom, index, layer, query, singleq, traverse, update  # noqa: F401
from .layer import (  # noqa: F401
    LayerBuilder,
    LayerState,
    ScanResult,
    TestResult,
)

__version__ = "0.1.0"
