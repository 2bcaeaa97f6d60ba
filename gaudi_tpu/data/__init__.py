"""Host-side data layer: molecules -> ring graphs -> dense padded arrays.

Pipeline (mirrors reference data/aromatic_dataloader.py conceptually, rebuilt
array-first): xyz text -> element/coord arrays -> covalent-radius bond graph ->
minimum cycle basis -> typed ring nodes with orientation -> fixed-shape padded
numpy tensors cached in one .npz per dataset split -> batched feed to device.
"""

from gaudi_tpu.data.dataset import (
    AromaticDataset,
    DatasetConfig,
    StatsOnlyDataset,
    create_datasets,
    resolve_datasets,
)
from gaudi_tpu.data.distributions import NodesDistribution, PropertyDistribution

__all__ = [
    "AromaticDataset",
    "DatasetConfig",
    "StatsOnlyDataset",
    "create_datasets",
    "resolve_datasets",
    "NodesDistribution",
    "PropertyDistribution",
]
