"""textualdegremoval_tpu — TPU-native framework for textual-degradation-removal
image restoration.

A from-scratch JAX/Flax/Pallas/pjit re-design of the capabilities of
mrluin/TextualDegRemoval (arXiv 2312.17334):

* Pipeline A — textual guidance generation: CLIP image encoder -> I2T mapper
  -> TR clean mapper -> pseudo-word injection into a frozen SD 2.1 text
  encoder -> DDIM CFG sampling of a clean reference image.
* Pipeline B — guided restoration: Restormer/NAFNet/DRSformer/SFNet/PromptIR
  backbones augmented with a MASA-style cross-image patch search/transfer
  module and per-level reference-fusion blocks.

Everything is NHWC, statically shaped, jit/pjit-first.  Data parallelism is
expressed with `jax.sharding.Mesh` + `NamedSharding`; kernels that XLA does
not fuse well are written in Pallas (`textualdegremoval_tpu.ops.pallas`).
"""

from textualdegremoval_tpu.version import __version__

__all__ = ["__version__"]
