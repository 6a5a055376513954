"""Checkpoint conversion: reference PyTorch .pth state dicts -> flax variables.

The reference releases 10 pretrained checkpoints (tools/download_pretrained.sh)
as standard torch state dicts; these converters map them onto this framework's
parameter trees for accuracy-parity evaluation (SURVEY.md §6, §7 hard part 1).
"""
from .torch_checkpoint import (convert_reidnet_state_dict,
                               load_torch_state_dict)

__all__ = ["convert_reidnet_state_dict", "load_torch_state_dict"]
