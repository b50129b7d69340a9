from .datasets import BatchLoader, LoadImagesAndLabels, create_dataloader
from .datasets_ssod import (
    LoadImagesAndFakeLabels,
    SSODBatchLoader,
    create_target_dataloader,
)

__all__ = [
    "BatchLoader", "LoadImagesAndLabels", "create_dataloader",
    "LoadImagesAndFakeLabels", "SSODBatchLoader", "create_target_dataloader",
]
