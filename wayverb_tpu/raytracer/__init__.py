from wayverb_tpu.raytracer import histogram

__all__ = ["histogram"]
