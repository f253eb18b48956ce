from hank_tpu.ops import egm, linalg, transition

__all__ = ["egm", "linalg", "transition"]
