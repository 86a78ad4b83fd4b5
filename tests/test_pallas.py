"""Pallas stencil kernel parity (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.waveguide.stencil import interior_step
from wayverb_tpu.waveguide.stencil_pallas import (XT, interior_step_pallas,
                                                  use_pallas)


class TestPallasStencil:
    @pytest.mark.parametrize("shape", [(16, 16, 128), (8, 8, 128),
                                       (32, 24, 256)])
    def test_matches_jnp_interior(self, rng, shape):
        cur = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        prev = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        mask = jnp.asarray((rng.random(shape) > 0.3).astype(np.float32))
        ref = interior_step(cur, prev, mask)
        out = interior_step_pallas(cur, prev, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_rejects_unaligned(self, rng):
        shape = (10, 16, 128)  # X not a multiple of XT
        cur = jnp.zeros(shape)
        with pytest.raises(ValueError):
            interior_step_pallas(cur, cur, cur, interpret=True)

    def test_use_pallas_on_cpu_is_false(self):
        assert not use_pallas((16, 16, 128))
