from .dataset import LRHRDataset, create_dataset, create_dataloader

__all__ = ["LRHRDataset", "create_dataset", "create_dataloader"]
