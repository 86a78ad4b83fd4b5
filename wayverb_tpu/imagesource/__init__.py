from wayverb_tpu.imagesource import exact, postprocess

__all__ = ["exact", "postprocess"]
