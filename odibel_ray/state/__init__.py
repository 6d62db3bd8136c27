from odibel_ray.state.clusters import ClusterManager, connected_components

__all__ = ["ClusterManager", "connected_components"]
