"""Real-world pedestrian trajectory datasets (ETH/UCY replay)."""

from img_env_tpu.datasets.pedestrians import (
    PedDatasetConfig,
    load_trajectory_csv,
    build_world,
    build_world_arrays,
)

__all__ = [
    "PedDatasetConfig",
    "load_trajectory_csv",
    "build_world",
    "build_world_arrays",
]
