from textualdegremoval_tpu.convert.torch_to_jax import (
    convert_state_dict,
    load_torch_checkpoint,
)
from textualdegremoval_tpu.convert.jax_to_torch import (
    convert_params_to_torch,
    convert_mapper_to_torch,
    save_torch_checkpoint,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "convert_params_to_torch", "convert_mapper_to_torch",
           "save_torch_checkpoint"]
