# -*- coding: utf-8 -*-
"""PyTorch interop: import reference checkpoints into climsr_tpu models."""
from climsr_tpu.interop.torch_import import (  # noqa: F401
    import_discriminator_params,
    import_generator_params,
    load_torch_checkpoint,
    split_pl_state_dict,
)
