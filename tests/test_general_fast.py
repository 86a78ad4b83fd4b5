"""Fused general-mesh step (stencil_pallas.weighted_step + boundary_update):
parity vs the (B, 6)-gather reference path on a genuinely general (rotated,
non-axis-aligned) scene, Pallas-interpret parity at tile-aligned dims, and
the hand VJP vs autodiff through the jnp formulation.

Reference treatment being matched: one kernel covers interior + boundary
nodes per step (``src/waveguide/src/program.cpp:393-487``)."""

import jax
import jax.numpy as jnp
import numpy as np

from wayverb_tpu.core.geometry import Box, TriangleSoup, box_scene
from wayverb_tpu.waveguide import boundary as bdry
from wayverb_tpu.waveguide.descriptor import (compute_adjusted_boundary,
                                              descriptor_for_box,
                                              grid_spacing)
from wayverb_tpu.waveguide.setup import (build_structure,
                                         classify_inside_scene)
from wayverb_tpu.waveguide.stencil import (waveguide_step,
                                           waveguide_step_reference)
from wayverb_tpu.waveguide.stencil_pallas import (XT, _wcall, _wkernel,
                                                  _wkernel_bwd,
                                                  weighted_step,
                                                  weighted_step_jnp)

FS = 3333.33
DX = grid_spacing(340.0, 1.0 / FS)


def rotated_box_mesh(absorption=0.25, angle=0.42):
    """A box rotated about z: boundary nodes of every direction config,
    plus reentrant nodes — none of the shoebox fast paths apply."""
    box = Box((0, 0, 0), (0.9, 0.8, 0.7))
    soup = box_scene(box)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    verts = np.asarray(soup.vertices) @ rot.T
    soup = TriangleSoup(vertices=jnp.asarray(verts),
                        triangles=soup.triangles, surfaces=soup.surfaces)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    aabb = Box(tuple(lo), tuple(hi))
    adjusted = compute_adjusted_boundary(
        aabb, tuple((lo + hi) / 2), DX)
    desc = descriptor_for_box(adjusted, DX)
    inside = classify_inside_scene(desc, soup)
    coeffs = bdry.compute_boundary_coefficients(
        np.full(8, absorption), FS)
    coef_b, coef_a = bdry.coefficient_table([coeffs])
    structure = build_structure(desc, inside, soup, coef_b, coef_a)
    return desc, structure


class TestGeneralFusedParity:
    def test_matches_gather_reference_on_rotated_box(self):
        desc, s = rotated_box_mesh()
        dims = desc.dimensions
        rng = np.random.default_rng(3)
        # random interior excitation, zero outside/boundary (physical state)
        cur = jnp.asarray(
            rng.normal(size=dims).astype(np.float32) *
            np.asarray(s.interior_mask))
        prev = jnp.asarray(
            rng.normal(size=dims).astype(np.float32) *
            np.asarray(s.interior_mask))
        f_fast = s.initial_filter_state()
        f_ref = s.initial_filter_state()
        for _ in range(6):
            nxt_f, f_fast = waveguide_step(cur, prev, f_fast, s)
            nxt_r, f_ref = waveguide_step_reference(cur, prev, f_ref, s)
            np.testing.assert_allclose(np.asarray(nxt_f), np.asarray(nxt_r),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(f_fast),
                                       np.asarray(f_ref), atol=2e-5)
            prev, cur = cur, nxt_f

    def test_weight_code_interior_bits(self):
        desc, s = rotated_box_mesh()
        code = np.asarray(s.weight_code)
        interior = np.asarray(s.interior_mask) > 0
        assert (code[interior] == 0x103F).all()
        b_idx = np.asarray(s.b_node_idx)
        bcode = code.reshape(-1)[b_idx]
        # every boundary node has at least one weight-2 (inner) direction
        assert ((bcode >> 6) & 0x3F).min() > 0
        # and never the interior subtract-previous bit
        assert ((bcode >> 12) & 1).max() == 0
        # outside nodes are all-zero rows
        outside = ~interior
        outside.reshape(-1)[b_idx] = False
        assert (code[outside] == 0).all()


class TestWeightedKernelInterpret:
    def _aligned_case(self):
        rng = np.random.default_rng(11)
        X, Y, Z = 2 * XT, 8, 128
        cur = jnp.asarray(rng.normal(size=(X, Y, Z)).astype(np.float32))
        prev = jnp.asarray(rng.normal(size=(X, Y, Z)).astype(np.float32))
        code = jnp.asarray(
            rng.integers(0, 1 << 13, size=(X, Y, Z)).astype(np.int32))
        return cur, prev, code

    def test_forward_matches_jnp(self):
        cur, prev, code = self._aligned_case()
        ref = weighted_step_jnp(cur, prev, code)
        out = _wcall(_wkernel, [(cur, True), (prev, False), (code, False)],
                     True, *cur.shape, cur.dtype)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_backward_kernel_matches_jnp_transpose(self):
        cur, prev, code = self._aligned_case()
        g = jnp.asarray(np.random.default_rng(5).normal(
            size=cur.shape).astype(np.float32))

        def f(c):
            return jnp.sum(weighted_step_jnp(c, prev, code) * g)

        ref = jax.grad(f)(cur)
        out = _wcall(_wkernel_bwd, [(g, True), (code, True)],
                     True, *cur.shape, cur.dtype)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestWeightedStepVJP:
    def test_custom_vjp_matches_autodiff(self):
        rng = np.random.default_rng(7)
        dims = (6, 7, 9)
        cur = jnp.asarray(rng.normal(size=dims).astype(np.float32))
        prev = jnp.asarray(rng.normal(size=dims).astype(np.float32))
        code = jnp.asarray(
            rng.integers(0, 1 << 13, size=dims).astype(np.int32))
        h = jnp.asarray(rng.normal(size=dims).astype(np.float32))

        gc, gp = jax.grad(
            lambda c, p: jnp.sum(weighted_step(c, p, code) * h),
            argnums=(0, 1))(cur, prev)
        rc, rp = jax.grad(
            lambda c, p: jnp.sum(weighted_step_jnp(c, p, code) * h),
            argnums=(0, 1))(cur, prev)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(rp),
                                   atol=1e-5)


class TestCarriedBoundaryParity:
    def test_run_waveguide_matches_manual_reference_loop(self):
        """run_waveguide's carried boundary-prev optimisation (patch_tap
        compact injection mirror) must reproduce the step-by-step reference
        loop with a HardSource, boundary filters included."""
        import jax.numpy as jnp
        from wayverb_tpu.waveguide.receivers import NodeReceiver
        from wayverb_tpu.waveguide.run import run_waveguide
        from wayverb_tpu.waveguide.sources import (HardSource,
                                                   impulse_signal)

        desc, s = rotated_box_mesh()
        dims = desc.dimensions
        inside_locs = np.argwhere(np.asarray(s.interior_mask) > 0)
        src_loc = inside_locs[len(inside_locs) // 2]
        src_idx = int(np.ravel_multi_index(tuple(src_loc), dims))
        steps = 14
        source = HardSource(node_idx=jnp.asarray(src_idx, dtype=jnp.int32),
                            signal=impulse_signal(steps, 1.0))
        receiver = NodeReceiver(
            node_idx=jnp.asarray(src_idx + 1, dtype=jnp.int32))

        out = run_waveguide(s, dims, source, receiver, steps)
        got = np.asarray(out["outputs"])
        assert bool(out["stable"])

        # manual loop with the gather-based oracle step
        n = int(np.prod(dims))
        cur = jnp.zeros(dims)
        prev = jnp.zeros(dims)
        fstate = s.initial_filter_state()
        ref = []
        for t in range(steps):
            cur_flat = source.inject(cur.reshape(n), t)
            cur = cur_flat.reshape(dims)
            ref.append(float(cur_flat[src_idx + 1]))
            nxt, fstate = waveguide_step_reference(cur, prev, fstate, s)
            prev, cur = cur, nxt
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5)
