from textualdegremoval_tpu.losses.losses import (
    l1_loss,
    mse_loss,
    psnr_loss,
    charbonnier_loss,
    build_loss,
)

__all__ = ["l1_loss", "mse_loss", "psnr_loss", "charbonnier_loss", "build_loss"]
