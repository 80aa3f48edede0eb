"""Decompose the guided-restoration train step (tools/bench_train.py
643.9 ms @ 384px b1) into stages on the real chip:

  fwd        — loss only (fused-kernel forward)
  masa       — masa_encode+match+warp fwd+bwd alone
  full       — the whole train step (same as bench_train)

Usage: python tools/bench_train_parts.py [part ...]   (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FUSED = os.environ.get("TDR_FUSED_TBLOCK", "1") in ("1", "true", "on")
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

SIZE = 384
ITERS = 5
REPEATS = 3


def timed(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion
    from textualdegremoval_tpu.losses import l1_loss

    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "fwd", "fwdbwd", "masa", "masa_enc", "warp"]

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16, fused=FUSED)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    gt = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)["params"]

    def loss(p, lq, ref, gt):
        pred = model.apply({"params": p}, lq, ref)
        if isinstance(pred, (list, tuple)):
            pred = pred[-1]
        return l1_loss(pred.astype(jnp.float32), gt)

    # every chain feeds the iteration's scalar back into the inputs so the
    # loop body is NOT loop-invariant (XLA hoists invariant bodies out of
    # fori_loop and the per-iteration time reads ITERS-times too small)
    if "fwd" in parts:
        def fwd_chain(p, lq, ref, gt):
            def body(_, carry):
                lq_i, acc = carry
                l = loss(p, lq_i, ref, gt)
                return (lq_i + (l * 1e-12).astype(lq_i.dtype), acc + l)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(fwd_chain, params, lq, ref, gt)
        print(json.dumps({"part": "fwd_loss", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "fwdbwd" in parts:
        def fb_chain(p, lq, ref, gt):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(loss)(p, lq_i, ref, gt)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(fb_chain, params, lq, ref, gt)
        print(json.dumps({"part": "fwd_bwd", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "masa" in parts:
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)
        from textualdegremoval_tpu.ops import masa_match_and_warp

        enc = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams = jax.jit(enc.init)(key, lq)

        def masa_loss(ep, lq, ref):
            feat_lq, feat_ref = masa_encode_pair(
                lambda x: enc.apply(ep, x), lq, ref)
            warp = masa_match_and_warp(feat_lq[-1], feat_ref,
                                       lr_block_size=8)
            return sum(jnp.sum(jnp.abs(w.astype(jnp.float32)))
                       for w in warp)

        def masa_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(masa_loss)(ep, lq_i, ref)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(masa_chain, eparams, lq, ref)
        print(json.dumps({"part": "masa_fwd_bwd", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "masa_enc" in parts:
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)

        enc2 = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams2 = jax.jit(enc2.init)(key, lq)

        def enc_loss(ep, lq, ref):
            feat_lq, feat_ref = masa_encode_pair(
                lambda x: enc2.apply(ep, x), lq, ref)
            return sum(jnp.sum(jnp.abs(f.astype(jnp.float32)))
                       for f in feat_lq + feat_ref)

        def enc_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(enc_loss)(ep, lq_i, ref)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(enc_chain, eparams2, lq, ref)
        print(json.dumps({"part": "masa_enc_fwd_bwd",
                          "ms": round(t * 1e3, 1)}), flush=True)

    if "warp" in parts:
        # match+warp alone, grads w.r.t. the FEATURES (isolates the
        # search/gather/transfer backward from the encoder backward)
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)
        from textualdegremoval_tpu.ops import masa_match_and_warp
        from textualdegremoval_tpu.ops.masa import masa_gather_windows

        enc3 = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams3 = jax.jit(enc3.init)(key, lq)
        feat_lq, feat_ref = jax.jit(
            lambda ep, a, b: masa_encode_pair(
                lambda x: enc3.apply(ep, x), a, b))(eparams3, lq, ref)
        feat_lq = [jax.lax.stop_gradient(f) for f in feat_lq]
        feat_ref = [jax.lax.stop_gradient(f) for f in feat_ref]

        def warp_loss(feats):
            f_lq, f_ref = feats
            warp = masa_match_and_warp(f_lq[-1], f_ref, lr_block_size=8)
            return sum(jnp.sum(jnp.abs(w.astype(jnp.float32)))
                       for w in warp)

        def wchain(grad):
            def run(feats):
                def body(_, carry):
                    fl, acc = carry
                    if grad:
                        l, g = jax.value_and_grad(warp_loss)((fl, feat_ref))
                        gsum = jax.tree_util.tree_reduce(
                            lambda a, b:
                            a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                            g, jnp.zeros(()))
                        l = l + gsum
                    else:
                        l = warp_loss((fl, feat_ref))
                    fl = [f + (l * 1e-12).astype(f.dtype) for f in fl]
                    return (fl, acc + l)
                return jax.lax.fori_loop(
                    0, ITERS, body, (feats, jnp.zeros(())))[1]
            return run

        t_f = timed(wchain(False), feat_lq)
        t_fb = timed(wchain(True), feat_lq)
        print(json.dumps({"part": "warp_fwd", "ms": round(t_f * 1e3, 1)}),
              flush=True)
        print(json.dumps({"part": "warp_fwd_bwd",
                          "ms": round(t_fb * 1e3, 1)}), flush=True)

        # isolate the window-gather backward: gather at every scale with a
        # FIXED plausible corner set, sum windows, grads w.r.t. features
        n, hd, wd, cd = feat_lq[-1].shape
        pb = (hd // 8) * (wd // 8)
        d = 2 * int(wd / (2 * (wd // 8)) * 1.5) + 1
        d2 = min(d, wd - 2) + 2
        y1 = jnp.tile(
            jnp.arange(pb, dtype=jnp.int32) % max(hd - d2, 1), (n, 1))
        x1 = jnp.tile(
            jnp.arange(pb, dtype=jnp.int32) % max(wd - d2, 1), (n, 1))

        def gat_loss(f_ref):
            tot = jnp.zeros((), jnp.float32)
            ns = len(f_ref)
            for lvl, f in enumerate(f_ref):
                s = 2 ** (ns - 1 - lvl)
                win = masa_gather_windows(f, y1, x1, d2, d2, s)
                tot = tot + jnp.sum(jnp.abs(win.astype(jnp.float32)))
            return tot

        def gchain(grad):
            def run(fr):
                def body(_, carry):
                    fl, acc = carry
                    if grad:
                        l, g = jax.value_and_grad(gat_loss)(fl)
                        gsum = sum(jnp.sum(jnp.abs(x)).astype(jnp.float32)
                                   for x in g)
                        l = l + gsum
                    else:
                        l = gat_loss(fl)
                    fl = [f + (l * 1e-12).astype(f.dtype) for f in fl]
                    return (fl, acc + l)
                return jax.lax.fori_loop(
                    0, ITERS, body, (fr, jnp.zeros(())))[1]
            return run

        t_gf = timed(gchain(False), feat_ref)
        t_gfb = timed(gchain(True), feat_ref)
        print(json.dumps({"part": "gather_fwd", "ms": round(t_gf * 1e3, 1)}),
              flush=True)
        print(json.dumps({"part": "gather_fwd_bwd",
                          "ms": round(t_gfb * 1e3, 1)}), flush=True)

    if "warp_stages" in parts:
        # transfer-only and fine-search-only fwd vs fwd+bwd at the in-model
        # 384 px shapes (same geometry masa_match_and_warp derives)
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)
        from textualdegremoval_tpu.ops.masa import (
            masa_transfer, masa_fine_search)

        enc4 = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams4 = jax.jit(enc4.init)(key, lq)
        feat_lq, feat_ref = jax.jit(
            lambda ep, a, b: masa_encode_pair(
                lambda x: enc4.apply(ep, x), a, b))(eparams4, lq, ref)
        n, hd, wd, cd = feat_lq[-1].shape
        py = px = hd // 8
        pb = py * px
        nb = n * pb
        ky = kx = 8
        d = min(2 * int(wd / (2 * px) * 1.5) + 1, wd - 2)
        d2 = d + 2
        kk = jax.random.split(key, 8)
        idx = jax.random.randint(kk[0], (nb, ky, kx), 0,
                                 (d2 - 2) * (d2 - 2), jnp.int32)
        att = jax.random.normal(kk[1], (nb, ky, kx), jnp.float32)
        lq_blocks = jax.random.normal(kk[2], (nb, ky + 2, kx + 2, cd),
                                      jnp.bfloat16)
        win_deep = jax.random.normal(kk[3], (nb, d2, d2, cd), jnp.bfloat16)

        ns = len(feat_ref)
        wins = [jax.random.normal(kk[4 + l], (
            nb, d2 * 2 ** (ns - 1 - l), d2 * 2 ** (ns - 1 - l),
            feat_ref[l].shape[-1]), jnp.bfloat16) for l in range(ns)]

        def tr_loss(wins, att):
            tot = jnp.zeros((), jnp.float32)
            for l, w in enumerate(wins):
                s = 2 ** (ns - 1 - l)
                o = masa_transfer(w, idx, att, 3, s)
                tot = tot + jnp.sum(jnp.abs(o.astype(jnp.float32)))
            return tot

        def fine_loss(lq_blocks, win_deep):
            _, soft = masa_fine_search(lq_blocks, win_deep, 3)
            return jnp.sum(jnp.abs(soft))

        def mk_chain(loss, grad):
            def run(a, b):
                def body(_, carry):
                    aa, acc = carry
                    if grad:
                        l, g = jax.value_and_grad(loss, argnums=(0, 1))(aa, b)
                        gsum = sum(jnp.sum(jnp.abs(x)).astype(jnp.float32)
                                   for x in jax.tree_util.tree_leaves(g))
                        l = l + gsum
                    else:
                        l = loss(aa, b)
                    aa = jax.tree_util.tree_map(
                        lambda f: f + (l * 1e-12).astype(f.dtype), aa)
                    return (aa, acc + l)
                return jax.lax.fori_loop(0, ITERS, body,
                                         (a, jnp.zeros(())))[1]
            return run

        for name, loss, a, b in [
            ("transfer", tr_loss, wins, att),
            ("fine_search", fine_loss, lq_blocks, win_deep),
        ]:
            tf_ = timed(mk_chain(loss, False), a, b)
            tfb = timed(mk_chain(loss, True), a, b)
            print(json.dumps({"part": f"{name}_fwd",
                              "ms": round(tf_ * 1e3, 1)}), flush=True)
            print(json.dumps({"part": f"{name}_fwd_bwd",
                              "ms": round(tfb * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
