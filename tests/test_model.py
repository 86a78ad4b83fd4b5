"""Project model round-trip + complete-engine driver test (reference
round_trip.cpp / app_model.cpp / threaded_engine test)."""

import os

import jax
import numpy as np
import pytest

from wayverb_tpu.combined.complete import run_project
from wayverb_tpu.combined.model import (CAPSULE_PRESETS, MATERIAL_PRESETS,
                                        CapsuleModel, MaterialModel,
                                        OutputModel, Project, ReceiverModel,
                                        SourceModel, WaveguideModel,
                                        RaytracerModel, compute_output_path)
from wayverb_tpu.core.geometry import Box, box_scene


class TestModelRoundTrip:
    def test_json_roundtrip(self, tmp_path):
        p = Project(
            sources=[SourceModel("s1", (1.0, 1.0, 1.0))],
            receivers=[ReceiverModel(
                "r1", (2.0, 1.0, 1.0), capsules=[
                    CapsuleModel("omni"),
                    CapsuleModel("left", "hrtf", channel=0)])],
            materials=[MaterialModel("brick", [0.05] * 8, [0.2] * 8)],
        )
        path = str(tmp_path / "project.json")
        p.save(path)
        q = Project.load(path)
        assert q.to_dict() == p.to_dict()

    def test_defaults_roundtrip(self, tmp_path):
        p = Project()
        path = str(tmp_path / "p.json")
        p.save(path)
        assert Project.load(path).to_dict() == p.to_dict()

    def test_surface_table_shape(self):
        p = Project(materials=[MaterialModel(), MaterialModel("x")])
        t = p.surface_table()
        assert t.absorption.shape == (2, 8)

    def test_output_path_naming(self):
        path = compute_output_path(
            SourceModel("s"), ReceiverModel("r"), CapsuleModel("omni"),
            OutputModel(output_directory="/tmp", unique_id="proj"))
        assert path == "/tmp/proj.s_s.r_r.c_omni.wav"

    def test_presets_valid(self):
        assert len(MATERIAL_PRESETS) >= 10
        for m in MATERIAL_PRESETS:
            assert len(m.absorption) == 8
            assert all(0.0 <= a <= 1.0 for a in m.absorption)
        kinds = {c.kind for c in CAPSULE_PRESETS}
        assert kinds == {"microphone", "hrtf"}

    def test_capsule_build(self):
        from wayverb_tpu.core.attenuator import Hrtf, Microphone
        assert isinstance(CapsuleModel(kind="microphone").build(),
                          Microphone)
        assert isinstance(CapsuleModel(kind="hrtf").build(), Hrtf)
        with pytest.raises(ValueError):
            CapsuleModel(kind="laser").build()


class TestCompleteEngine:
    def test_run_project_end_to_end(self, tmp_path):
        box = Box((0, 0, 0), (3.0, 2.5, 2.2))
        project = Project(
            sources=[SourceModel("s1", (1.0, 1.2, 0.8))],
            receivers=[ReceiverModel(
                "r1", (2.0, 1.3, 1.5),
                capsules=[CapsuleModel("omni"),
                          CapsuleModel("card", shape=0.5)])],
            materials=[MaterialModel("walls", [0.1] * 8, [0.1] * 8)],
            raytracer=RaytracerModel(rays=1 << 12),
            waveguide=WaveguideModel(cutoff=300.0),
        )
        project.output.output_directory = str(tmp_path)
        project.output.sample_rate = 8000.0
        project.raytracer.histogram_sample_rate = 1000.0

        states = []
        channels = run_project(
            project, box_scene(box), jax.random.PRNGKey(0), scene_box=box,
            state_callback=lambda s, p: states.append(s))
        assert len(channels) == 2
        peak = max(np.abs(c.signal).max() for c in channels)
        assert peak == pytest.approx(1.0)
        for c in channels:
            assert os.path.exists(c.path)
        assert states[0] == "initialising" and states[-1] == "done"

    def test_bad_placement_raises(self):
        box = Box((0, 0, 0), (3.0, 2.5, 2.2))
        project = Project(
            sources=[SourceModel("s1", (10.0, 10.0, 10.0))],
            receivers=[ReceiverModel("r1", (2.0, 1.3, 1.5))],
        )
        with pytest.raises(RuntimeError):
            run_project(project, box_scene(box), jax.random.PRNGKey(0),
                        scene_box=box, write_files=False)
