from .point_losses import PointLossConfig, point_losses, select_topk_masks
from .diffusion_losses import diffusion_loss

__all__ = [
    "PointLossConfig",
    "point_losses",
    "select_topk_masks",
    "diffusion_loss",
]
