"""Checkpoint key mappings for the frozen/trainable towers.

Converts the original artifacts into our Flax trees:
* I2T Mapper / TR CleanMapper — reference `mapper_<step>.pt` state dicts
  (per-word Sequentials mapping_{i}.{0,1,3,4,6,7,9}) -> stacked WordMLPs
  tensors, plus the UNet global-k/v projections the reference stores inside
  the mapper (`<layer>_to_k.weight` attributes, wiring
  main_train_i2t_mapping.py:573-612).
* DINOv2 (facebookresearch naming) -> models.dino.DinoVisionTransformer.
* HF CLIPTextModel / CLIPVisionModel -> models.clip towers.
* diffusers AutoencoderKL / UNet2DConditionModel -> models.vae / models.unet.

All pure numpy.  Each function takes a {torch_key: array} dict.
"""

from __future__ import annotations

import re

import numpy as np
import flax.traverse_util as traverse_util


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _unflatten(flat):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


# ---------------------------------------------------------------------------
# Mappers
# ---------------------------------------------------------------------------

_SEQ_LINEARS = {0: "linear0", 3: "linear1", 6: "linear2", 9: "linear3"}
_SEQ_LNS = {1: "ln0", 4: "ln1", 7: "ln2"}


def convert_mapper(state_dict, num_words: int, prefix: str = "mapping",
                   with_patch: bool = True) -> dict:
    """Reference Mapper/CleanMapper state dict -> WordMLPs stacked params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    out = {}
    branches = [prefix] + ([f"{prefix}_patch"] if with_patch else [])
    for branch in branches:
        dst = "mapping_patch" if branch.endswith("_patch") else "mapping"
        for seq_i, name in _SEQ_LINEARS.items():
            w = np.stack([sd[f"{branch}_{i}.{seq_i}.weight"].T
                          for i in range(num_words)])
            b = np.stack([sd[f"{branch}_{i}.{seq_i}.bias"]
                          for i in range(num_words)])
            out[f"{dst}/{name}_kernel"] = w
            out[f"{dst}/{name}_bias"] = b
        for seq_i, name in _SEQ_LNS.items():
            out[f"{dst}/{name}_weight"] = np.stack(
                [sd[f"{branch}_{i}.{seq_i}.weight"] for i in range(num_words)])
            out[f"{dst}/{name}_bias"] = np.stack(
                [sd[f"{branch}_{i}.{seq_i}.bias"] for i in range(num_words)])
    return _unflatten(out)


def extract_global_kv(state_dict) -> dict:
    """The reference stores each attn2's global K/V copies on the mapper as
    attributes named after the layer path with dots replaced
    ('<path>_to_k.weight').  Returns {layer_path: {'to_k': W, 'to_v': W}}
    with (in, out)-transposed kernels."""
    out: dict[str, dict] = {}
    for k, v in state_dict.items():
        m = re.match(r"(.+)_to_([kv])\.weight$", k)
        if not m:
            continue
        path, which = m.group(1), m.group(2)
        out.setdefault(path, {})[f"to_{which}"] = _np(v).T
    return out


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------


def convert_dino(state_dict) -> dict:
    sd = {k: _np(v) for k, v in state_dict.items()}
    out = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed/kernel": sd["patch_embed.proj.weight"].transpose(
            2, 3, 1, 0),
        "patch_embed/bias": sd["patch_embed.proj.bias"],
        "norm/scale": sd["norm.weight"],
        "norm/bias": sd["norm.bias"],
    }
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"blocks\.(\d+)\.", k)))
    for i in range(n_blocks):
        p = f"blocks.{i}"
        d = f"blocks_{i}"
        out[f"{d}/norm1/scale"] = sd[f"{p}.norm1.weight"]
        out[f"{d}/norm1/bias"] = sd[f"{p}.norm1.bias"]
        out[f"{d}/norm2/scale"] = sd[f"{p}.norm2.weight"]
        out[f"{d}/norm2/bias"] = sd[f"{p}.norm2.bias"]
        out[f"{d}/ls1_gamma"] = sd[f"{p}.ls1.gamma"]
        out[f"{d}/ls2_gamma"] = sd[f"{p}.ls2.gamma"]
        out[f"{d}/attn/qkv/kernel"] = sd[f"{p}.attn.qkv.weight"].T
        out[f"{d}/attn/qkv/bias"] = sd[f"{p}.attn.qkv.bias"]
        out[f"{d}/attn/proj/kernel"] = sd[f"{p}.attn.proj.weight"].T
        out[f"{d}/attn/proj/bias"] = sd[f"{p}.attn.proj.bias"]
        if f"{p}.mlp.w12.weight" in sd:  # SwiGLU FFN (giant2)
            out[f"{d}/mlp/w12/kernel"] = sd[f"{p}.mlp.w12.weight"].T
            out[f"{d}/mlp/w12/bias"] = sd[f"{p}.mlp.w12.bias"]
            out[f"{d}/mlp/w3/kernel"] = sd[f"{p}.mlp.w3.weight"].T
            out[f"{d}/mlp/w3/bias"] = sd[f"{p}.mlp.w3.bias"]
        else:
            out[f"{d}/mlp/fc1/kernel"] = sd[f"{p}.mlp.fc1.weight"].T
            out[f"{d}/mlp/fc1/bias"] = sd[f"{p}.mlp.fc1.bias"]
            out[f"{d}/mlp/fc2/kernel"] = sd[f"{p}.mlp.fc2.weight"].T
            out[f"{d}/mlp/fc2/bias"] = sd[f"{p}.mlp.fc2.bias"]
    return _unflatten(out)


# ---------------------------------------------------------------------------
# CLIP (HF transformers naming)
# ---------------------------------------------------------------------------


def _convert_clip_layers(sd, src_prefix, n_layers):
    out = {}
    for i in range(n_layers):
        p = f"{src_prefix}.layers.{i}"
        d = f"layers_{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            out[f"{d}/{ln}/scale"] = sd[f"{p}.{ln}.weight"]
            out[f"{d}/{ln}/bias"] = sd[f"{p}.{ln}.bias"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out[f"{d}/self_attn/{proj}/kernel"] = \
                sd[f"{p}.self_attn.{proj}.weight"].T
            out[f"{d}/self_attn/{proj}/bias"] = \
                sd[f"{p}.self_attn.{proj}.bias"]
        for fc in ("fc1", "fc2"):
            out[f"{d}/mlp/{fc}/kernel"] = sd[f"{p}.mlp.{fc}.weight"].T
            out[f"{d}/mlp/{fc}/bias"] = sd[f"{p}.mlp.{fc}.bias"]
    return out


def convert_clip_text(state_dict) -> dict:
    sd = {k.removeprefix("text_model."): _np(v)
          for k, v in state_dict.items()}
    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    out = {
        "token_embedding/embedding":
            sd["embeddings.token_embedding.weight"],
        "position_embedding":
            sd["embeddings.position_embedding.weight"],
        "final_layer_norm/scale": sd["final_layer_norm.weight"],
        "final_layer_norm/bias": sd["final_layer_norm.bias"],
    }
    out.update(_convert_clip_layers(sd, "encoder", n_layers))
    return _unflatten(out)


def convert_clip_vision(state_dict) -> dict:
    sd = {k.removeprefix("vision_model."): _np(v)
          for k, v in state_dict.items()}
    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    out = {
        "patch_embedding/kernel":
            sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0),
        "class_embedding": sd["embeddings.class_embedding"],
        "position_embedding":
            sd["embeddings.position_embedding.weight"],
        # HF's layer is literally named 'pre_layrnorm'
        "pre_layrnorm/scale": sd["pre_layrnorm.weight"],
        "pre_layrnorm/bias": sd["pre_layrnorm.bias"],
    }
    out.update(_convert_clip_layers(sd, "encoder", n_layers))
    return _unflatten(out)


# ---------------------------------------------------------------------------
# diffusers VAE / UNet
# ---------------------------------------------------------------------------


def _conv(sd, src, dst, out):
    out[f"{dst}/kernel"] = sd[f"{src}.weight"].transpose(2, 3, 1, 0)
    if f"{src}.bias" in sd:
        out[f"{dst}/bias"] = sd[f"{src}.bias"]


def _lin(sd, src, dst, out):
    out[f"{dst}/kernel"] = sd[f"{src}.weight"].T
    if f"{src}.bias" in sd:
        out[f"{dst}/bias"] = sd[f"{src}.bias"]


def _gn(sd, src, dst, out):
    out[f"{dst}/scale"] = sd[f"{src}.weight"]
    out[f"{dst}/bias"] = sd[f"{src}.bias"]


def _vae_resnet(sd, src, dst, out):
    _gn(sd, f"{src}.norm1", f"{dst}/norm1", out)
    _conv(sd, f"{src}.conv1", f"{dst}/conv1", out)
    _gn(sd, f"{src}.norm2", f"{dst}/norm2", out)
    _conv(sd, f"{src}.conv2", f"{dst}/conv2", out)
    if f"{src}.conv_shortcut.weight" in sd:
        _conv(sd, f"{src}.conv_shortcut", f"{dst}/conv_shortcut", out)


def _vae_attn(sd, src, dst, out):
    # diffusers 0.16: query/key/value/proj_attn; >=0.18: to_q/to_k/to_v/to_out.0
    names = (("query", "key", "value", "proj_attn")
             if f"{src}.query.weight" in sd
             else ("to_q", "to_k", "to_v", "to_out.0"))
    _gn(sd, f"{src}.group_norm", f"{dst}/group_norm", out)
    for torch_n, mine in zip(names, ("to_q", "to_k", "to_v", "to_out")):
        _lin(sd, f"{src}.{torch_n}", f"{dst}/{mine}", out)


def convert_vae(state_dict, n_down: int = 4, layers_per_block: int = 2) -> dict:
    sd = {k: _np(v) for k, v in state_dict.items()}
    out = {}
    _conv(sd, "encoder.conv_in", "encoder/conv_in", out)
    for bi in range(n_down):
        for li in range(layers_per_block):
            _vae_resnet(sd, f"encoder.down_blocks.{bi}.resnets.{li}",
                        f"encoder/down_{bi}_resnet_{li}", out)
        if bi < n_down - 1:
            _conv(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv",
                  f"encoder/down_{bi}_downsample", out)
    _vae_resnet(sd, "encoder.mid_block.resnets.0", "encoder/mid_resnet_0", out)
    _vae_attn(sd, "encoder.mid_block.attentions.0", "encoder/mid_attn", out)
    _vae_resnet(sd, "encoder.mid_block.resnets.1", "encoder/mid_resnet_1", out)
    _gn(sd, "encoder.conv_norm_out", "encoder/conv_norm_out", out)
    _conv(sd, "encoder.conv_out", "encoder/conv_out", out)
    _conv(sd, "quant_conv", "encoder/quant_conv", out)

    _conv(sd, "post_quant_conv", "decoder/post_quant_conv", out)
    _conv(sd, "decoder.conv_in", "decoder/conv_in", out)
    _vae_resnet(sd, "decoder.mid_block.resnets.0", "decoder/mid_resnet_0", out)
    _vae_attn(sd, "decoder.mid_block.attentions.0", "decoder/mid_attn", out)
    _vae_resnet(sd, "decoder.mid_block.resnets.1", "decoder/mid_resnet_1", out)
    for bi in range(n_down):
        for li in range(layers_per_block + 1):
            _vae_resnet(sd, f"decoder.up_blocks.{bi}.resnets.{li}",
                        f"decoder/up_{bi}_resnet_{li}", out)
        if bi < n_down - 1:
            _conv(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv",
                  f"decoder/up_{bi}_upsample", out)
    _gn(sd, "decoder.conv_norm_out", "decoder/conv_norm_out", out)
    _conv(sd, "decoder.conv_out", "decoder/conv_out", out)
    return _unflatten(out)


def _unet_resnet(sd, src, dst, out):
    _gn(sd, f"{src}.norm1", f"{dst}/norm1", out)
    _conv(sd, f"{src}.conv1", f"{dst}/conv1", out)
    _lin(sd, f"{src}.time_emb_proj", f"{dst}/time_emb_proj", out)
    _gn(sd, f"{src}.norm2", f"{dst}/norm2", out)
    _conv(sd, f"{src}.conv2", f"{dst}/conv2", out)
    if f"{src}.conv_shortcut.weight" in sd:
        _conv(sd, f"{src}.conv_shortcut", f"{dst}/conv_shortcut", out)


def _unet_tblock(sd, src, dst, out, global_kv: dict | None = None,
                 src_attn_path: str | None = None):
    for ln in ("norm1", "norm2", "norm3"):
        _gn(sd, f"{src}.{ln}", f"{dst}/{ln}", out)
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            _lin(sd, f"{src}.{attn}.{proj}", f"{dst}/{attn}/{proj}", out)
        _lin(sd, f"{src}.{attn}.to_out.0", f"{dst}/{attn}/to_out", out)
    # global K/V for attn2: from the mapper artifact if provided, else
    # initialized as copies of to_k/to_v (the reference's clone-at-wiring)
    gk = None
    if global_kv is not None and src_attn_path is not None:
        gk = global_kv.get(src_attn_path)
    out[f"{dst}/attn2/to_k_global/kernel"] = (
        gk["to_k"] if gk else out[f"{dst}/attn2/to_k/kernel"])
    out[f"{dst}/attn2/to_v_global/kernel"] = (
        gk["to_v"] if gk else out[f"{dst}/attn2/to_v/kernel"])
    _lin(sd, f"{src}.ff.net.0.proj", f"{dst}/ff_geglu/proj", out)
    _lin(sd, f"{src}.ff.net.2", f"{dst}/ff_out", out)


def _unet_transformer(sd, src, dst, out, global_kv=None, attn_path=None):
    _gn(sd, f"{src}.norm", f"{dst}/norm", out)
    _lin(sd, f"{src}.proj_in", f"{dst}/proj_in", out)
    _unet_tblock(sd, f"{src}.transformer_blocks.0", f"{dst}/blocks_0", out,
                 global_kv, attn_path)
    _lin(sd, f"{src}.proj_out", f"{dst}/proj_out", out)


def convert_unet(state_dict, n_blocks: int = 4, layers_per_block: int = 2,
                 global_kv: dict | None = None) -> dict:
    """diffusers UNet2DConditionModel -> models.unet.UNet2DCondition.

    global_kv: optional {attn-path: {to_k, to_v}} from extract_global_kv
    (the trained injection projections live in the mapper artifact)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    out = {}
    _conv(sd, "conv_in", "conv_in", out)
    _lin(sd, "time_embedding.linear_1", "time_emb_1", out)
    _lin(sd, "time_embedding.linear_2", "time_emb_2", out)

    for bi in range(n_blocks):
        has_attn = bi < n_blocks - 1
        for li in range(layers_per_block):
            _unet_resnet(sd, f"down_blocks.{bi}.resnets.{li}",
                         f"down_{bi}_resnet_{li}", out)
            if has_attn:
                _unet_transformer(
                    sd, f"down_blocks.{bi}.attentions.{li}",
                    f"down_{bi}_attn_{li}", out, global_kv,
                    f"down_blocks.{bi}.attentions.{li}.transformer_blocks."
                    f"0.attn2")
        if bi < n_blocks - 1:
            _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv",
                  f"down_{bi}_downsample", out)

    _unet_resnet(sd, "mid_block.resnets.0", "mid_resnet_0", out)
    _unet_transformer(sd, "mid_block.attentions.0", "mid_attn", out,
                      global_kv,
                      "mid_block.attentions.0.transformer_blocks.0.attn2")
    _unet_resnet(sd, "mid_block.resnets.1", "mid_resnet_1", out)

    for bi in range(n_blocks):
        has_attn = bi > 0
        for li in range(layers_per_block + 1):
            _unet_resnet(sd, f"up_blocks.{bi}.resnets.{li}",
                         f"up_{bi}_resnet_{li}", out)
            if has_attn:
                _unet_transformer(
                    sd, f"up_blocks.{bi}.attentions.{li}",
                    f"up_{bi}_attn_{li}", out, global_kv,
                    f"up_blocks.{bi}.attentions.{li}.transformer_blocks."
                    f"0.attn2")
        if bi < n_blocks - 1:
            _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv",
                  f"up_{bi}_upsample", out)

    _gn(sd, "conv_norm_out", "conv_norm_out", out)
    _conv(sd, "conv_out", "conv_out", out)
    return _unflatten(out)
