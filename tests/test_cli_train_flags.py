"""The train CLI's precision / remat / fused-kernel flags take effect on
the constructed network (VERDICT r3 item 2: the reference's 384px batch-8
protocol — options/train_restoration/003_….yml:24-33 — needs bf16+remat to
fit a 16 GB chip, so these must be reachable from the product surface)."""

import jax.numpy as jnp

from textualdegremoval_tpu.cli.train_restoration import resolve_network


def _opt(train_extra=None, net_extra=None):
    net = {"type": "RestormerRefFusion", "dim": 8,
           "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
           "heads": [1, 1, 2, 2], "nf": 8, "ext_n_blocks": [1, 1, 1, 1],
           "reffusion_n_blocks": [1, 1, 1, 1], "lr_block_size": 4}
    net.update(net_extra or {})
    train = {"total_iter": 4}
    train.update(train_extra or {})
    return {"network_g": net, "train": train}


class TestResolveNetwork:
    def test_defaults_fp32_no_remat(self):
        model, remat, dtype = resolve_network(_opt())
        assert dtype == jnp.float32 and model.dtype == jnp.float32
        assert remat is False
        assert model.fused is None and model.bwd_mode is None

    def test_yaml_train_keys(self):
        model, remat, dtype = resolve_network(_opt(train_extra={
            "mixed_precision": "bf16", "remat": True,
            "fused_kernels": "on"}))
        assert dtype == jnp.bfloat16 and model.dtype == jnp.bfloat16
        assert remat is True
        assert model.fused is True
        assert model.bwd_mode == "remat"

    def test_cli_overrides_beat_yaml(self):
        model, remat, dtype = resolve_network(
            _opt(train_extra={"mixed_precision": "bf16", "remat": True,
                              "fused_kernels": "on"}),
            mixed_precision="fp32", fused="off")
        assert dtype == jnp.float32
        assert model.fused is False
        assert remat is True  # not overridden -> YAML value

    def test_yaml_bool_fused_and_network_g_precedence(self):
        # fused_kernels as a YAML bool works; an explicit network_g.fused
        # wins over the train-level knob
        model, _, _ = resolve_network(_opt(train_extra={
            "fused_kernels": False}))
        assert model.fused is False
        model, _, _ = resolve_network(_opt(
            train_extra={"fused_kernels": "off"},
            net_extra={"fused": True}))
        assert model.fused is True

    def test_nafnet_fused_threads_without_bwd_mode(self):
        # NAFNet has a fused field but no bwd_mode — resolve_network must
        # not crash threading remat into it (define_network field-filters)
        opt = _opt(train_extra={"remat": True, "fused_kernels": "on"})
        opt["network_g"] = {"type": "NAFNetRefFusion", "width": 8,
                            "enc_blk_nums": [1, 1, 1, 1],
                            "dec_blk_nums": [1, 1, 1, 1], "nf": 8,
                            "ext_n_blocks": [1, 1, 1, 1],
                            "reffusion_n_blocks": [1, 1, 1, 1, 1]}
        model, remat, _ = resolve_network(opt)
        assert remat is True and model.fused is True
