"""Model graphs as pure functions (params pytree, waveform) -> sources."""

from .htdemucs import htdemucs_segment  # noqa: F401
from .hdemucs_v3 import hdemucs_v3_segment  # noqa: F401
from .bag import bag_segment  # noqa: F401
