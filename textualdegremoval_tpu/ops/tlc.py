"""TLC (test-time local converter) pooling.

Replaces global average pooling with a sliding box average whose kernel is
scaled by the test/train size ratio so that test-time channel statistics
match the train-crop statistics.

Parity target: reference models/archs/nafnet_local_arch.py:10-76 (exact
cumsum implementation, auto_pad with replicate borders).  The `fast_imp`
branch is intentionally not reproduced — on TPU the exact integral-image
form is already a handful of fused VPU ops.

In jit, kernel sizes are static (derived from static shapes), so TLC does not
cause recompiles beyond the usual per-input-shape specialization.
"""

import jax.numpy as jnp


def local_avg_pool(x: jnp.ndarray, kernel_size: tuple[int, int]) -> jnp.ndarray:
    """Sliding-window box average over NHWC with same-size replicate-padded
    output.  Falls back to global mean when the kernel covers the image
    (matching the reference's adaptive_avg_pool2d(1) fast path)."""
    n, h, w, c = x.shape
    k1 = min(h, int(kernel_size[0]))
    k2 = min(w, int(kernel_size[1]))
    if k1 >= h and k2 >= w:
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    xf = x.astype(jnp.float32)
    s = jnp.cumsum(jnp.cumsum(xf, axis=2), axis=1)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    s1 = s[:, :-k1, :-k2]
    s2 = s[:, :-k1, k2:]
    s3 = s[:, k1:, :-k2]
    s4 = s[:, k1:, k2:]
    out = (s4 + s1 - s2 - s3) / float(k1 * k2)

    # auto_pad: replicate-pad back to the input spatial size, centered.
    oh, ow = out.shape[1], out.shape[2]
    pt, pb = (h - oh) // 2, (h - oh + 1) // 2
    pl, pr = (w - ow) // 2, (w - ow + 1) // 2
    out = jnp.pad(out, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="edge")
    return out.astype(x.dtype)


def tlc_kernel_size(
    base_size: tuple[int, int],
    train_size: tuple[int, int],
    test_size: tuple[int, int],
) -> tuple[int, int]:
    """Derive the test-time kernel: base * test / train (per axis).

    Reference: nafnet_local_arch.py:30-36."""
    return (
        test_size[0] * base_size[0] // train_size[0],
        test_size[1] * base_size[1] // train_size[1],
    )
