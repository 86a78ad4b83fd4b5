from wayverb_tpu.parallel import sharding

__all__ = ["sharding"]
