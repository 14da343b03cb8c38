from .groupnorm_silu import fused_group_norm_silu

__all__ = ["fused_group_norm_silu"]
