"""Dataset/dataloader registry mirroring the reference's
data/__init__.py:31-121 surface (create_dataset / create_dataloader by YAML
`type`)."""

from __future__ import annotations

from textualdegremoval_tpu.data.datasets import (
    PairedImageDataset,
    PairedImageWithRefDataset,
    GaussianDenoisingWithRefDataset,
    PairedDehazeWithRefDataset,
    PairedUnifiedWithRefDataset,
    PairedImageDPWithRefDataset,
)
from textualdegremoval_tpu.data.sampler import EnlargedSampler
from textualdegremoval_tpu.data.loader import DataLoader, DevicePrefetcher, collate

# reference registry names -> our classes
_DATASETS = {
    "Dataset_PairedImage": PairedImageDataset,
    "Dataset_PairedImageWithRef": PairedImageWithRefDataset,
    "Dataset_GaussianDenoisingWithRef": GaussianDenoisingWithRefDataset,
    "Dataset_PairedDehazeWithRef": PairedDehazeWithRefDataset,
    "Dataset_PairedUnifiedWithRef": PairedUnifiedWithRefDataset,
    "Dataset_PairedImageWithRef_DualPixel_16bit": PairedImageDPWithRefDataset,
}


def create_dataset(opt: dict):
    return _DATASETS[opt["type"]](opt)


def create_dataloader(dataset, opt: dict, num_replicas: int = 1, rank: int = 0,
                      sampler=None, seed=None):
    phase = opt.get("phase", "train")
    if phase == "train":
        batch = opt.get("batch_size_per_gpu", 1)
        workers = opt.get("num_worker_per_gpu", 4)
        if sampler is None:
            # enlarge enough that every rank yields at least one full batch
            # per epoch (iteration-based training, reference EnlargedSampler)
            min_ratio = -(-batch * num_replicas // max(len(dataset), 1))
            ratio = max(opt.get("dataset_enlarge_ratio", 1), min_ratio)
            sampler = EnlargedSampler(len(dataset), num_replicas, rank, ratio)
        return DataLoader(dataset, batch, sampler=sampler,
                          num_workers=workers, drop_last=True)
    return DataLoader(dataset, 1, sampler=None, num_workers=1,
                      drop_last=False)


__all__ = [
    "create_dataset", "create_dataloader", "EnlargedSampler", "DataLoader",
    "DevicePrefetcher", "collate",
]
