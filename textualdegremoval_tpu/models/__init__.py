"""Network registry.

`define_network(opt)` mirrors the reference's class-name lookup
(models/archs/__init__.py:43-46): `opt['type']` selects the Flax module and
the remaining keys become constructor kwargs, so reference YAML configs port
1:1 (network_g section).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from textualdegremoval_tpu.models.restormer import Restormer, RestormerRefFusion
from textualdegremoval_tpu.models.nafnet import NAFNet, NAFNetRefFusion
from textualdegremoval_tpu.models.drsformer import DRSformer, DRSformerRefFusion
from textualdegremoval_tpu.models.promptir import PromptIR, PromptIRRefFusion
from textualdegremoval_tpu.models.sfnet import SFNet, SFNetRefFusion
from textualdegremoval_tpu.models.nafnet_dynamic import NAFNetDynamicFusion

_REGISTRY: dict[str, type] = {}


def register_network(cls, name: str | None = None):
    _REGISTRY[name or cls.__name__] = cls
    return cls


for _cls in (Restormer, RestormerRefFusion, NAFNet, NAFNetRefFusion,
             DRSformer, DRSformerRefFusion, PromptIR, PromptIRRefFusion,
             SFNet, SFNetRefFusion, NAFNetDynamicFusion):
    register_network(_cls)

# Reference "Local" (TLC) variants map to the same modules with
# tlc_train_size set by the caller.
_REGISTRY["NAFNetLocal"] = NAFNet
_REGISTRY["NAFNetLocal_RefFusion"] = NAFNetRefFusion
_REGISTRY["NAFNetLocalDynamic"] = NAFNetDynamicFusion
# Reference 200L/SPA file = DRSformer without MEFC
_REGISTRY["DRSformer200L_SPA_RefFusion"] = DRSformerRefFusion

# Keys consumed by the wrapper layer, not the network constructor.
_NON_CTOR_KEYS = {"type", "scale"}
# Reference YAML knobs whose casing/name differs from our field names.
_KEY_ALIASES = {"LayerNorm_type": "ln_type", "bias": "bias"}


def network_names() -> list[str]:
    return sorted(_REGISTRY)


def define_network(opt: dict, dtype=jnp.float32):
    """Instantiate a network module from a reference-style network_g dict."""
    opt = dict(opt)
    name = opt.pop("type")
    cls = _REGISTRY[name]
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in opt.items():
        if k in _NON_CTOR_KEYS:
            continue
        k = _KEY_ALIASES.get(k, k)
        if k in fields:
            kwargs[k] = tuple(v) if isinstance(v, list) else v
    if "dtype" in fields:
        kwargs.setdefault("dtype", dtype)
    if name.startswith("NAFNetLocal") and "tlc_train_size" in fields:
        ts = opt.get("train_size", (1, 3, 256, 256))
        kwargs.setdefault("tlc_train_size", (ts[-2], ts[-1]))
    return cls(**kwargs)
