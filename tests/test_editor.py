"""Headless editor/controller (Lumined analog): scripted session test.

Covers VERDICT round-1 item 4: mutate a model through the controller,
step it deterministically (MockTime), save, reload, and replay
bit-identically (ParticleEditor/Controller.cs:24, View.cs:34-39, 72-101).
"""

import numpy as np

from illuminant_tpu.models.editor import EditorController
from illuminant_tpu.models.parameter import Parameter


def _build_session(tmp_path=None):
    ed = EditorController(capacity=1 << 10)
    ed.add_system("sparks")
    ed.add_transform(0, "Spawner", {
        "MinRate": 600.0,
        "MaxRate": 600.0,
        "Life": {"Constant": 2.0, "RandomScale": 0.5},
        "Position": {"Constant": [64.0, 64.0, 0.0],
                     "RandomScale": [8.0, 8.0, 0.0], "Type": "Spherical"},
        "Velocity": {"RandomScale": [30.0, 30.0, 0.0],
                     "Type": "Spherical"},
        "Color": {"Constant": [1.0, 0.8, 0.2, 1.0]},
    })
    ed.add_transform(0, "Gravity", {
        "Attractors": [{"Position": [64.0, 120.0, 0.0], "Radius": 200.0,
                        "Strength": 50.0, "FalloffType": "Linear"}],
        "MaximumAcceleration": 500.0,
    })
    return ed


def test_scripted_session_mutate_step_save_reload_replay(tmp_path):
    ed = _build_session()
    assert len(ed.model.systems) == 1
    assert len(ed.model.systems[0].transforms) == 2
    assert ed.selection.system == 0

    # Step 10 frames; particles spawn and move.
    for _ in range(10):
        ed.update(1.0 / 60.0)
    assert ed.live_count > 0
    digest_a = ed.state_digest()

    # Property edit through the controller restarts deterministically.
    ed.set_transform_property(0, 1, "Attractors", [
        {"Position": [64.0, 120.0, 0.0], "Radius": 200.0,
         "Strength": 150.0, "FalloffType": "Linear"}])
    for _ in range(10):
        ed.update(1.0 / 60.0)
    digest_b = ed.state_digest()
    # The edit changed the trajectory.
    assert not np.array_equal(digest_a["0:velocity"],
                              digest_b["0:velocity"])

    # Save -> reload -> replay the same 10 steps: bit-identical state.
    path = str(tmp_path / "scene.json")
    ed.save(path)
    ed2 = EditorController.load(path, capacity=1 << 10)
    for _ in range(10):
        ed2.update(1.0 / 60.0)
    digest_c = ed2.state_digest()
    for k in digest_b:
        np.testing.assert_array_equal(digest_b[k], digest_c[k])


def test_pause_and_single_step():
    ed = _build_session()
    ed.update()
    live_1 = ed.live_count
    assert live_1 > 0

    ed.toggle_pause()
    ed.update()
    ed.update()
    assert ed.live_count == live_1  # paused: nothing advanced
    assert ed.time.seconds == 1.0 / 60.0

    ed.queue_step()  # StepPending: exactly one step while paused
    ed.update()
    assert ed.time.seconds == 2.0 / 60.0
    live_2 = ed.live_count
    assert live_2 > live_1
    ed.update()
    assert ed.live_count == live_2  # still paused again


def test_add_remove_and_selection():
    ed = _build_session()
    ed.add_system("smoke")
    assert ed.selection.system == 1
    assert ed.selected_system.name == "smoke"

    ed.add_transform(1, "Spawner", {"MinRate": 10.0, "MaxRate": 10.0,
                                    "Life": {"Constant": 1.0}})
    assert ed.selected_transform.type == "Spawner"

    ed.remove_transform(1, 0)
    assert len(ed.model.systems[1].transforms) == 0

    ed.remove_system(1)
    assert len(ed.model.systems) == 1
    assert ed.selection.system == 0

    dup = ed.duplicate_system(0)
    assert "copy" in dup.name
    assert len(ed.model.systems) == 2
    assert len(ed.model.systems[1].transforms) == 2


def test_named_variable_editing_feeds_transforms():
    ed = EditorController(capacity=1 << 10)
    ed.add_system("s")
    ed.set_named_variable("spawnRate", 120.0)
    ed.add_transform(0, "Spawner", {
        "MinRate": {"Name": "spawnRate"},
        "MaxRate": {"Name": "spawnRate"},
        "Life": {"Constant": 5.0},
        "Position": {"Constant": [0.0, 0.0, 0.0]},
    })
    for _ in range(60):
        ed.update(1.0 / 60.0)
    n_before = ed.live_count
    assert abs(n_before - 120) <= 12  # ~120/s for 1s

    ed.set_named_variable("spawnRate", 240.0)
    for _ in range(60):
        ed.update(1.0 / 60.0)
    assert abs(ed.live_count - 240) <= 24
