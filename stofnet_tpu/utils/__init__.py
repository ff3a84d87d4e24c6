"""Shared utilities: config, logging, natural sorting."""

from stofnet_tpu.utils.natsort import natsorted
from stofnet_tpu.utils.config import load_config, merge_cli, Config

__all__ = ["natsorted", "load_config", "merge_cli", "Config"]
