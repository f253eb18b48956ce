from hank_tpu.utils import checkpoint, timing

__all__ = ["checkpoint", "timing"]
