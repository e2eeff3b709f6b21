"""Training data pipeline: datasets, algebra, sampler, loader.

`build_dataset` parses the reference's eval()-style dataset expressions
("1000 @ SceneFlowDatasets(split='train', ROOT=..., resolution=[(512,288)])
 + 1000 @ SintelDatasets(...)", dust3r/training.py:126-133) against a
registry of dataset classes — no arbitrary eval.
"""
from align3r_tpu.training.data.base import BaseStereoViewDataset
from align3r_tpu.training.data.easy_dataset import (
    EasyDataset, CatDataset, MulDataset, ResizedDataset)
from align3r_tpu.training.data.loader import (
    BatchedRandomSampler, DataLoader, get_data_loader, collate_views)
from align3r_tpu.training.data.datasets import (
    SceneFlowDatasets, SintelDatasets, PointodysseyDatasets,
    TartanairDatasets, VkittiDatasets, SpringDatasets, read_pfm)

DATASET_REGISTRY = {
    "SceneFlowDatasets": SceneFlowDatasets,
    "SintelDatasets": SintelDatasets,
    "PointodysseyDatasets": PointodysseyDatasets,
    "TartanairDatasets": TartanairDatasets,
    "VkittiDatasets": VkittiDatasets,
    "SpringDatasets": SpringDatasets,
}


def build_dataset(expr: str):
    """Evaluate a dataset-algebra expression against the registry only."""
    env = dict(DATASET_REGISTRY)
    return eval(expr, {"__builtins__": {}}, env)  # noqa: S307 (registry-scoped)


__all__ = [k for k in dir() if not k.startswith("_")]
