"""Bidirectional checkpoint conversion: torch sd -> flax tree -> torch sd,
bitwise on every key, against the ACTUAL reference arch code (VERDICT r2
item 4).  Proves the torch->flax mapping is lossless in both directions so
that when real pretrained checkpoints appear, parity is one command in
either direction (export for the reference's eval scripts included).

No forward passes — pure state-dict structure, so full-size configs are
cheap.
"""

import numpy as np
import pytest
import torch

from test_reference_parity import load_ref_arch, randomize

from textualdegremoval_tpu.convert import convert_state_dict
from textualdegremoval_tpu.convert.torch_to_jax import split_batch_stats
from textualdegremoval_tpu.convert.jax_to_torch import (
    convert_params_to_torch, save_torch_checkpoint,
)


def roundtrip(tm):
    sd = {k: v for k, v in tm.state_dict().items()}
    tree = split_batch_stats(convert_state_dict(sd))
    back = convert_params_to_torch(tree, sd, strict=True)
    assert set(back) == set(sd)
    for k in sd:
        a = sd[k].detach().cpu().numpy()
        b = back[k]
        assert a.dtype == b.dtype, k
        np.testing.assert_array_equal(a, b, err_msg=k)


def _restormer():
    mod = load_ref_arch("network_restormer_guided_arch")
    return randomize(mod.Restormer(
        dim=48, num_blocks=[4, 6, 6, 8], num_refinement_blocks=4,
        heads=[1, 2, 4, 8], ffn_expansion_factor=2.66, bias=False,
        LayerNorm_type="WithBias"), seed=1)


def _restormer_reffusion_small():
    mod = load_ref_arch("network_restormer_guided_arch")
    # small dims: the RefFusion adds the MASA tower + fusion blocks; the
    # mapping is dimension-independent and the trunk is covered full-size
    return randomize(mod.RestormerRefFusion(
        dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
        heads=[1, 1, 2, 2], nf=8, ext_n_blocks=[1, 1, 1, 1],
        reffusion_n_blocks=[1, 1, 1, 1], lr_block_size=4), seed=2)


def _nafnet():
    mod = load_ref_arch("network_nafnet_guided_arch")
    return randomize(mod.NAFNet(
        width=64, middle_blk_num=1, enc_blk_nums=[1, 1, 1, 28],
        dec_blk_nums=[1, 1, 1, 1]), seed=5)


def _nafnet_reffusion_small():
    mod = load_ref_arch("network_nafnet_guided_arch")
    return randomize(mod.NAFNetRefFusion(
        width=8, middle_blk_num=1, enc_blk_nums=[1, 1, 1, 1],
        dec_blk_nums=[1, 1, 1, 1], nf=8, ext_n_blocks=[1, 1, 1, 1],
        reffusion_n_blocks=[1, 1, 1, 1, 1], lr_block_size=2), seed=6)


def _drsformer():
    mod = load_ref_arch("network_drsformer_guided_arch")
    return randomize(mod.DRSformer(
        dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8]), seed=7)


def _promptir():
    mod = load_ref_arch("network_promptir_guided_arch")
    return randomize(mod.PromptIR(
        dim=48, num_blocks=[4, 6, 6, 8], num_refinement_blocks=4,
        heads=[1, 2, 4, 8], decoder=True), seed=9)


def _sfnet():
    mod = load_ref_arch("network_sfnet_guided_arch")
    return randomize(mod.SFNet(mode=["train"], num_res=16), seed=11)


def _nafnet_dynamic():
    mod = load_ref_arch("network_nafnet_guided_diffir_arch")
    return randomize(mod.NAFNetDynamicFusion(
        width=64, middle_blk_num=1, enc_blk_nums=[1, 1, 1, 28],
        dec_blk_nums=[1, 1, 1, 1]), seed=13)


CASES = {
    "restormer_dim48": _restormer,
    "restormer_reffusion": _restormer_reffusion_small,
    "nafnet_w64": _nafnet,
    "nafnet_reffusion": _nafnet_reffusion_small,
    "drsformer_dim48_mefc": _drsformer,
    "promptir_dim48_decoder": _promptir,
    "sfnet_res16": _sfnet,
    "nafnet_dynamic_w64": _nafnet_dynamic,
}


def test_roundtrip_restormer_fast():
    roundtrip(_restormer_reffusion_small())


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_all_backbones(name):
    roundtrip(CASES[name]())


def test_dead_params_carried_through():
    """PromptIR's declared-but-unused params are dropped by the forward
    conversion; the reverse must restore them from the template so the
    reference loads the result with strict=True."""
    tm = _promptir()
    sd = tm.state_dict()
    dead = [k for k in sd if "chnl_reduce" in k]
    assert dead, "expected dead keys in PromptIR"
    tree = split_batch_stats(convert_state_dict(sd))
    back = convert_params_to_torch(tree, sd)
    for k in dead:
        np.testing.assert_array_equal(back[k], sd[k].numpy())
    # and the reference itself accepts the round-tripped dict strictly
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in back.items()}, strict=True)


def test_strict_detects_missing_leaf():
    tm = _restormer_reffusion_small()
    sd = tm.state_dict()
    tree = split_batch_stats(convert_state_dict(sd))
    params = tree["params"]
    # drop one leaf -> strict must raise
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    victim = next(iter(flat))
    del flat[victim]
    with pytest.raises(ValueError, match="no flax leaf"):
        convert_params_to_torch(tu.unflatten_dict(flat), sd)


def test_mapper_roundtrip_bitwise():
    """I2T mapper: reference mapper_<step>.pt layout -> stacked WordMLPs ->
    back, bitwise (the trainable pipeline-A artifact; export path for
    mappers trained here, main_train_i2t_mapping.py:239-247 format)."""
    from torch_oracles import OMapper
    from textualdegremoval_tpu.convert.tower_maps import (
        convert_mapper, extract_global_kv,
    )
    from textualdegremoval_tpu.convert.jax_to_torch import (
        convert_mapper_to_torch,
    )

    nw = 3
    tm = OMapper(32, 24, nw, 64)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    sd = tm.state_dict()
    # attach global-kv attributes the way the reference training script does
    sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2_to_k"
       ".weight"] = torch.randn(8, 4, generator=g)
    sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2_to_v"
       ".weight"] = torch.randn(8, 4, generator=g)
    tree = convert_mapper(sd, nw)
    gkv = extract_global_kv(sd)
    back = convert_mapper_to_torch(tree, nw, global_kv=gkv)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)


def test_save_torch_checkpoint_reference_format(tmp_path):
    tm = _restormer_reffusion_small()
    sd = tm.state_dict()
    tree = split_batch_stats(convert_state_dict(sd))
    p = str(tmp_path / "net_g_1.pth")
    save_torch_checkpoint(tree, sd, p, ema_variables=tree)
    ck = torch.load(p, weights_only=True)
    assert set(ck) == {"params", "params_ema"}
    tm.load_state_dict(ck["params"], strict=True)
