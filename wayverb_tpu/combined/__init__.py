from wayverb_tpu.combined import engine, postprocess

__all__ = ["engine", "postprocess"]
