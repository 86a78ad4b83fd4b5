from wayverb_tpu.signal import multiband, filters, windows, resample

__all__ = ["multiband", "filters", "windows", "resample"]
