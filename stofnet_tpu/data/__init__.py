"""Datasets, transforms, and host->device input pipelines."""

from stofnet_tpu.data.transforms import NormalizeVol, AddNoise, CropChannelData
from stofnet_tpu.data.chirp import ChirpDataset
from stofnet_tpu.data.loader import DataLoader, split_dataset
from stofnet_tpu.data.synthetic import generate_chirp_dataset

__all__ = [
    "NormalizeVol",
    "AddNoise",
    "CropChannelData",
    "ChirpDataset",
    "DataLoader",
    "split_dataset",
    "generate_chirp_dataset",
]
