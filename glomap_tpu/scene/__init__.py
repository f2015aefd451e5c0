"""Scene state as flat SoA arrays. Counterpart of reference glomap/scene/."""

from glomap_tpu.scene.arrays import Scene, Tracks  # noqa: F401
from glomap_tpu.scene.view_graph import ViewGraph  # noqa: F401
