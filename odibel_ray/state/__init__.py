from odibel_ray.state.clusters import (
    ClusterManager,
    connected_components,
    connected_components_auto,
    connected_components_distributed,
)

__all__ = [
    "ClusterManager",
    "connected_components",
    "connected_components_auto",
    "connected_components_distributed",
]
