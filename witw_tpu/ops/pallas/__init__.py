from witw_tpu.ops.pallas.fused_match import fused_corr_distance

__all__ = ["fused_corr_distance"]
