from wayverb_tpu.waveguide import (boundary, descriptor, postprocess,
                                   receivers, run, setup, sources, stencil)

__all__ = ["boundary", "descriptor", "postprocess", "receivers", "run",
           "setup", "sources", "stencil"]
