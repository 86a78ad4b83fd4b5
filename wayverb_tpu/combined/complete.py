"""The all-pairs render driver: validate placements, run every
source×receiver pair, render every capsule, normalize jointly, write files.

Parity: reference ``combined/threaded_engine.cpp:60-280`` (complete_engine)
— minus the background thread (call it from your own executor if needed)
and plus progress callbacks as plain callables.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wayverb_tpu.combined import engine as eng
from wayverb_tpu.combined.model import (CapsuleModel, Project,
                                        compute_output_path)
from wayverb_tpu.combined.validate import validate_placements
from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, TriangleSoup
from wayverb_tpu.utils.audio import write_wav


@dataclasses.dataclass
class RenderedChannel:
    source: str
    receiver: str
    capsule: str
    path: str
    signal: np.ndarray


def run_project(project: Project, soup: TriangleSoup, key,
                environment: Environment = Environment(),
                scene_box: Optional[Box] = None,
                write_files: bool = True,
                state_callback: Callable[[str, float], None] = lambda s, p:
                None) -> List[RenderedChannel]:
    """Render the whole project; returns the per-channel signals.

    ``state_callback(state, progress)`` mirrors the reference's engine-state
    event stream (engine.h:38-48).
    """
    surfaces = project.surface_table()
    state_callback("initialising", 0.0)
    e = eng.Engine(
        soup, surfaces,
        eng.WaveguideParameters(cutoff=project.waveguide.cutoff,
                                usable_portion=(
                                    project.waveguide.usable_portion)),
        environment=environment, scene_box=scene_box)

    validate_placements([s.position for s in project.sources],
                        [r.position for r in project.receivers], e.mesh)

    rt_params = eng.RaytracerParameters(
        rays=project.raytracer.rays,
        maximum_image_source_order=(
            project.raytracer.maximum_image_source_order),
        receiver_radius=project.raytracer.receiver_radius,
        histogram_sample_rate=project.raytracer.histogram_sample_rate)

    channels: List[RenderedChannel] = []
    pairs = [(s, r) for s in project.sources for r in project.receivers]
    for i, (src, rcv) in enumerate(pairs):
        base = i / max(len(pairs), 1)
        state_callback(f"rendering {src.name} -> {rcv.name}", base)
        pair_key = jax.random.fold_in(key, i)
        results = e.run(
            src.position, rcv.position, pair_key, rt_params,
            state_callback=lambda ph, base=base, src=src, rcv=rcv:
            state_callback(f"{ph} {src.name} -> {rcv.name}", base))
        for j, capsule in enumerate(rcv.capsules):
            method = capsule.build(rcv.pointing)
            signal = eng.render(results, method,
                                project.output.sample_rate,
                                jax.random.fold_in(pair_key, j + 1))
            channels.append(RenderedChannel(
                source=src.name, receiver=rcv.name, capsule=capsule.name,
                path=compute_output_path(src, rcv, capsule, project.output),
                signal=np.asarray(signal)))

    # joint peak normalization (threaded_engine.cpp:241-260)
    peak = max((np.abs(c.signal).max() for c in channels), default=1.0)
    scale = 1.0 / max(peak, 1e-12)
    for c in channels:
        c.signal = c.signal * scale

    if write_files:
        state_callback("writing files", 1.0)
        for c in channels:
            write_wav(c.path, c.signal, project.output.sample_rate,
                      bit_depth=project.output.bit_depth)
    state_callback("done", 1.0)
    return channels
