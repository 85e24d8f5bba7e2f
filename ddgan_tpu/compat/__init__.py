"""PyTorch-checkpoint interop: import reference .pth checkpoints
(content.pth / netG_{epoch}.pth, ddgan.py:545-569) into flax param trees
for parity testing and checkpoint migration."""

from .torch_import import (  # noqa: F401
    convert_torch_state_dict,
    strip_module_prefix,
    load_torch_netg,
    load_torch_content,
    export_torch_state_dict,
    save_torch_netg,
)
