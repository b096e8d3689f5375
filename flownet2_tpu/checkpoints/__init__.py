"""Checkpointing: PyTorch-reference importer + native (Orbax) save/resume."""

from .native import restore_checkpoint, save_checkpoint  # noqa: F401
from .torch_import import (  # noqa: F401
    assert_tree_matches,
    load_torch_checkpoint,
    state_dict_to_variables,
)
