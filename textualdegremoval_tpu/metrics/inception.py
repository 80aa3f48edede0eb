"""InceptionV3 pool3 feature extractor for FID, in Flax.

The reference's FID is dead code — `metrics/fid.py:7` imports
`models.archs.inception`, a module that does not exist (SURVEY.md §2.5
item 9).  This is the working replacement: the standard InceptionV3 graph
(torchvision layer naming, so the pytorch-fid / torchvision checkpoints
convert mechanically through convert/torch_to_jax.py), with the FID-variant
pooling semantics (3x3 stride-1 average pools exclude padding from the
divisor, as in pytorch-fid's FIDInception blocks).

Outputs the 2048-d pool3 activations used by FID.  Inputs are NHWC RGB in
[0, 1]; `extract_features` resizes to 299 and maps to [-1, 1] (TF Inception
convention).

Weight loading: `load_torch_inception(path)` converts a torch state dict
(torchvision `inception_v3` or pytorch-fid `pt_inception-2015-12-05`
naming) into the Flax tree.  Without weights the module still runs
(random init) so the FID *pipeline* is exercisable everywhere; scores are
only comparable across runs using the same weights.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def _avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME average pool, padding excluded from the divisor
    (torch count_include_pad=False — the FID-Inception variant)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    counts = lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None], 0.0, lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return summed / counts


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class BasicConv2d(nn.Module):
    """conv(bias=False) + BatchNorm(eps=1e-3) + relu (torchvision naming:
    children 'conv' and 'bn')."""

    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Sequence[tuple[int, int]] | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), tuple(self.strides),
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _pad(py: int, px: int):
    return ((py, py), (px, px))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1, 1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1, 1),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_pad(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad(0, 1),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_pad(1, 0),
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature trunk up to pool3 (2048-d).  Input NHWC, 299x299 nominal
    (any /32-friendly size runs; FID protocol resizes to 299)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


def load_torch_inception(path: str) -> dict:
    """Convert a torch InceptionV3 state dict (torchvision or pytorch-fid
    naming) into the Flax variable tree for `InceptionV3`."""
    from textualdegremoval_tpu.convert.torch_to_jax import (
        convert_state_dict, split_batch_stats)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("AuxLogits", "fc"))}
    return split_batch_stats(convert_state_dict(sd))


def extract_features(variables: dict, images: jnp.ndarray,
                     batch_size: int = 32) -> jnp.ndarray:
    """NHWC RGB images in [0,1] -> (N, 2048) pool3 features.

    Resizes to 299 (bilinear, the pytorch-fid protocol) and maps to the
    [-1, 1] TF-Inception input range.
    """
    model = InceptionV3()
    n = images.shape[0]
    if images.shape[1:3] != (299, 299):
        images = jax.image.resize(
            images, (n, 299, 299, images.shape[-1]), method="bilinear")
    images = images * 2.0 - 1.0
    fwd = jax.jit(lambda v, im: model.apply(v, im))
    outs = []
    for i in range(0, n, batch_size):
        outs.append(fwd(variables, images[i:i + batch_size]))
    return jnp.concatenate(outs, axis=0)
