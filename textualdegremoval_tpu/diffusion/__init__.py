from textualdegremoval_tpu.diffusion.ddim import DDIMScheduler, cfg_sample

__all__ = ["DDIMScheduler", "cfg_sample"]
