from hank_tpu.utils import checkpoint, native, profiling, timing

__all__ = ["checkpoint", "native", "profiling", "timing"]
