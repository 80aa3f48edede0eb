from textualdegremoval_tpu.convert.torch_to_jax import (
    convert_state_dict,
    load_torch_checkpoint,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint"]
