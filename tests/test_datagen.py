"""Data-generation label tooling tests on a hand-built scene json."""

import json

import numpy as np
import pytest

from objectpermanence_tpu.datagen import cater_tasks, perfect_perception, scene_labels


def make_scene(num_frames=300):
    """Scene: snitch (Spl_0), two cones, a cube.
    Cone_1 contains the snitch at frames [50..60] (contain action ends at
    50), slides [70..90], pick_places at 120 (containment 50..120).
    Cone_2 contains Cone_1 ("babushka") 80..100.
    """
    def locations(x, y):
        return {str(f): [x, y, 0.35] for f in range(num_frames)}

    objects = [
        {"instance": "Spl_0", "shape": "spl", "size": "small", "color": "gold",
         "material": "metal", "locations": locations(0.5, 0.5)},
        {"instance": "Cone_1", "shape": "cone", "size": "medium", "color": "blue",
         "material": "metal", "locations": locations(0.6, 0.6)},
        {"instance": "Cone_2", "shape": "cone", "size": "large", "color": "red",
         "material": "rubber", "locations": locations(2.0, -1.0)},
        {"instance": "Cube_0", "shape": "cube", "size": "small", "color": "green",
         "material": "rubber", "locations": locations(-2.0, 2.0)},
    ]
    # action name field is the literal "_contain"/"_slide"/... (the
    # generator's action vocabulary, `generate/actions.py:422-508`)
    movements = {
        "Spl_0": [["_no_op", None, 0, 30]],
        "Cone_1": [
            ["_contain", "Spl_0", 40, 50],
            ["_slide", None, 70, 90],
            ["_pick_place", None, 120, 140],
        ],
        "Cone_2": [
            ["_contain", "Cone_1", 70, 80],
            ["_pick_place", None, 100, 110],
        ],
        "Cube_0": [["_slide", None, 10, 20]],
    }
    return {"objects": objects, "movements": movements}


def test_containment_frames():
    scene = make_scene()
    frames = scene_labels.snitch_containment_frames(scene)
    assert frames == list(range(50, 121))


def test_containment_with_move_frames():
    scene = make_scene()
    frames = scene_labels.snitch_containment_with_move_frames(scene)
    assert frames == list(range(70, 91))


def test_static_frames():
    all_frames = list(range(50, 121))
    moving = list(range(70, 91))
    static = scene_labels.static_frames(all_frames, moving)
    assert static == list(range(50, 70)) + list(range(91, 121))


def test_tracked_object_with_babushka():
    scene = make_scene()
    labels, babushka = scene_labels.tracked_object_labels(scene)
    # before containment: snitch label
    assert labels[0] == 140 and labels[49] == 140
    # during snitch containment: Cone_1's class (medium_blue_cone_metal)
    from objectpermanence_tpu.vocab import OBJECTS_NAME_TO_IDX
    cone1 = OBJECTS_NAME_TO_IDX["medium_blue_cone_metal"]
    cone2 = OBJECTS_NAME_TO_IDX["large_red_cone_rubber"]
    assert labels[55] == cone1
    # while Cone_1 is itself contained (80..100): Cone_2's class
    assert labels[90] == cone2
    assert labels[101] == cone1       # back to Cone_1 after its reappearance
    assert labels[121] == 140         # after pick_place: snitch again
    assert babushka == 21             # frames 80..100


def test_no_containment_without_cone():
    scene = make_scene()
    # a cube "containing" must be ignored (only cones contain)
    scene["movements"]["Cube_0"].append(["_contain", "Spl_0", 5, 8])
    frames = scene_labels.snitch_containment_frames(scene)
    assert frames == list(range(50, 121))


def test_write_annotation_files(tmp_path):
    scenes_dir = tmp_path / "scenes"
    scenes_dir.mkdir()
    (scenes_dir / "vid1.json").write_text(json.dumps(make_scene()))
    paths = scene_labels.write_annotation_files(scenes_dir, tmp_path / "out")
    content = paths["containment"].read_text()
    assert content.startswith("vid1\t50,51")
    assert paths["babushka"].read_text().splitlines()[1] == "vid1,21"


def test_localization_class_quadrants():
    scene = make_scene()
    # snitch final position (0.5, 0.5): x=floor(0.5)+3=3, y=3 -> 3*6+3=21
    assert cater_tasks.localization_class(scene) == 21
    scene["objects"][0]["locations"][str(299)] = [-2.5, 1.2, 0.35]
    assert cater_tasks.localization_class(scene) == (1 + 3) * 6 + (-3 + 3)


def test_actions_present():
    scene = make_scene()
    labels = cater_tasks.actions_present_labels(scene)
    names = [cater_tasks.ACTION_CLASSES[l] for l in labels]
    assert ("cone", "_contain") in names
    assert ("cone", "_slide") in names
    assert ("cone", "_pick_place") in names
    assert ("cube", "_slide") in names
    assert ("sphere", "_slide") not in names


def test_action_order_labels_tiny():
    scene = make_scene()
    classes = cater_tasks.action_order_classes(n=2)
    active = cater_tasks.action_order_labels(scene, classes)
    # "cube _slide [10,20] BEFORE cone _contain [40,50]" must be active
    target = ((("cube", "_slide"), ("cone", "_contain")), ("before",))
    assert classes.index(target) in active
    # and the impossible reverse ordering must not be
    wrong = ((("cube", "_slide"), ("cone", "_contain")), ("after",))
    assert classes.index(wrong) not in active


def test_write_task_labels(tmp_path):
    scenes_dir = tmp_path / "scenes"
    scenes_dir.mkdir()
    for i in range(4):
        (scenes_dir / f"vid{i}.json").write_text(json.dumps(make_scene()))
    paths = cater_tasks.write_task_labels(scenes_dir, tmp_path / "lists")
    localize = paths["localize"].read_text().splitlines()
    assert len(localize) == 4 and localize[0].endswith(" 21")
    train = paths["train"].read_text().splitlines()
    val = paths["val"].read_text().splitlines()
    assert len(train) == 2 and len(val) == 2
    assert set(train) | set(val) == {f"vid{i}.avi" for i in range(4)}

    # reference-layout per-dataset dirs (gen_train_test.py:298-330)
    for dset in ("localize", "localize_4x4", "localize_8x8",
                 "actions_present", "actions_order_uniq"):
        for split, n_expected in (("train", 2), ("val", 2)):
            lines = paths[f"{dset}/{split}"].read_text().splitlines()
            assert len(lines) == n_expected, (dset, split)
            for line in lines:
                name, label = line.split(" ", 1)
                assert name.endswith(".avi") and label
    # every scene is identical: action-order labels must agree across files
    order_lines = paths["actions_order_uniq/train"].read_text().splitlines()
    labels = {int(x) for x in order_lines[0].split(" ", 1)[1].split(",")}
    classes = cater_tasks.action_order_classes(n=2, unique=True)
    # "cube _slide BEFORE cone _contain" is scripted in make_scene
    assert classes.index(
        ((("cube", "_slide"), ("cone", "_contain")), ("before",))) in labels
    meta = json.loads(
        (tmp_path / "lists" / "actions_order_uniq" / "metadata.json")
        .read_text())
    assert meta["num_classes"] == len(classes)
    # label ids are self-describing: the serialized class table round-trips
    # to the exact tuples action_order_classes produces (ADVICE r4)
    assert meta["action_order_n"] == 2
    restored = [tuple((tuple(tuple(a) for a in acts), tuple(orders)))
                for acts, orders in meta["classes"]]
    assert restored == classes
    present_meta = json.loads(
        (tmp_path / "lists" / "actions_present" / "metadata.json").read_text())
    assert [tuple(c) for c in present_meta["classes"]] == \
        list(cater_tasks.ACTION_CLASSES)


def test_action_order_n_generalizes(tmp_path):
    """action_order_n other than the default 2 must work (n=1: single
    actions dedup to the 14 ACTION_CLASSES; n=3: triple orderings) — the
    first uniq implementation only handled 1-element ordering tuples and
    crashed for every non-default n."""
    assert len(cater_tasks.action_order_classes(n=1, unique=True)) == len(
        cater_tasks.ACTION_CLASSES)
    classes3 = cater_tasks.action_order_classes(n=3, unique=True)
    # full set 14^3 * 3^2; dedup keeps one of each reversal pair, and only
    # palindromic classes (reverse(el) == el) survive unpaired
    assert 14**3 * 9 / 2 < len(classes3) < 14**3 * 9
    scenes_dir = tmp_path / "scenes"
    scenes_dir.mkdir()
    (scenes_dir / "vid0.json").write_text(json.dumps(make_scene()))
    paths = cater_tasks.write_task_labels(scenes_dir, tmp_path / "lists3",
                                          action_order_n=3)
    meta = json.loads(
        (tmp_path / "lists3" / "actions_order_uniq" / "metadata.json")
        .read_text())
    assert meta["num_classes"] == len(classes3)


def test_write_task_labels_drops_empty_multilabels(tmp_path):
    """The reference drops rows whose label string is empty
    (gen_train_test.py:320-323) — a scene with no actions must vanish from
    actions_present/actions_order splits but stay in localize."""
    scenes_dir = tmp_path / "scenes"
    scenes_dir.mkdir()
    quiet = make_scene()
    quiet["movements"] = {name: [] for name in quiet["movements"]}
    for i in range(3):
        (scenes_dir / f"vid{i}.json").write_text(json.dumps(quiet))
    paths = cater_tasks.write_task_labels(scenes_dir, tmp_path / "lists")
    n_loc = sum(len(paths[f"localize/{s}"].read_text().splitlines())
                for s in ("train", "val"))
    n_act = sum(len(paths[f"actions_present/{s}"].read_text().splitlines())
                for s in ("train", "val"))
    n_ord = sum(len(paths[f"actions_order_uniq/{s}"].read_text().splitlines())
                for s in ("train", "val"))
    assert n_loc == 3 and n_act == 0 and n_ord == 0


# --- golden test vs the reference's own gen_train_test.py --------------------

def _load_reference_gen_train_test():
    import importlib.util
    import os
    import sys
    import types
    from pathlib import Path

    ref = Path("/root/reference/generate/gen_train_test.py")
    if not ref.exists():
        pytest.skip("reference repo not mounted")
    # satisfy `from generate.gen_utils import mkdir_p` without importing the
    # real gen_utils (it imports cv2, absent from the compute environment)
    pkg = types.ModuleType("generate")
    pkg.__path__ = [str(ref.parent)]
    gu = types.ModuleType("generate.gen_utils")
    gu.mkdir_p = lambda p: os.makedirs(p, exist_ok=True)
    sys.modules.setdefault("generate", pkg)
    sys.modules["generate.gen_utils"] = gu
    spec = importlib.util.spec_from_file_location("ref_gen_train_test", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _golden_scenes():
    """Deterministic scene variants exercising orderings, negative-grid
    positions, and repeated actions."""
    scenes = [make_scene()]
    s = make_scene()
    s["objects"][0]["locations"][str(299)] = [-2.5, 1.2, 0.35]  # negative x
    s["movements"]["Cube_0"].append(["_rotate", None, 60, 70])
    scenes.append(s)
    s = make_scene()
    s["movements"]["Spl_0"] = [["_slide", None, 0, 10],
                               ["_pick_place", None, 15, 25]]
    s["movements"]["Cone_2"].append(["_slide", None, 40, 55])
    scenes.append(s)
    return scenes


def test_action_order_classes_match_reference():
    from itertools import product as iproduct
    mod = _load_reference_gen_train_test()
    action_sets = list(iproduct(mod.ACTION_CLASSES, repeat=2))
    orderings = list(iproduct(mod.ORDERING, repeat=1))
    ref_classes = list(iproduct(action_sets, orderings))
    assert cater_tasks.action_order_classes(n=2) == ref_classes
    assert (cater_tasks.action_order_classes(n=2, unique=True)
            == mod.action_order_unique(ref_classes))


def test_task_labels_match_reference_golden():
    """Run the reference's OWN label functions (localize_dataset,
    actions_or_not_dataset, compute_active_labels) on fixture scenes and
    require exact agreement with this framework's labels."""
    import copy

    mod = _load_reference_gen_train_test()
    classes = cater_tasks.action_order_classes(n=2, unique=True)
    for i, scene in enumerate(_golden_scenes()):
        # localize at all three grids (deepcopy per call: the reference's
        # localize_dataset mutates `locations` in place when rescaling)
        for rows_cols, ours in ((None, cater_tasks.localization_class(scene)),
                                ((2, 2), cater_tasks.localization_class(scene, 2, 2)),
                                ((4, 4), cater_tasks.localization_class(scene, 4, 4))):
            data = {f"v{i}.avi": copy.deepcopy(scene)}
            if rows_cols is None:
                _, lbls, _ = mod.localize_dataset(data)
            else:
                _, lbls, _ = mod.localize_dataset(data, *rows_cols)
            assert lbls[0] == ours, (i, rows_cols)

        _, ref_actions, _ = mod.actions_or_not_dataset(
            {f"v{i}.avi": copy.deepcopy(scene)}, mod.ACTION_CLASSES)
        ours = ",".join(str(l) for l in cater_tasks.actions_present_labels(scene))
        assert ref_actions[0] == ours, i

        _, ref_active = mod.compute_active_labels(
            (f"v{i}.avi", copy.deepcopy(scene)), classes=classes, n=2)
        assert sorted(ref_active) == cater_tasks.action_order_labels(
            scene, classes, n=2), i


# --- perfect perception ------------------------------------------------------

def _gt_bb_for_scene(scene, num_frames=300):
    """GT track boxes: every object a fixed 20x20 box at distinct spots,
    except the cube overlaps the snitch completely in frames 200..210."""
    tracks = {}
    spots = {"Spl_0": (100, 100), "Cone_1": (150, 100), "Cone_2": (200, 50),
             "Cube_0": (40, 160)}
    for obj in scene["objects"]:
        key = "_".join(obj[a] for a in ["size", "color", "shape", "material", "instance"])
        x, y = spots[obj["instance"]]
        boxes = [[x, y, 20, 20] for _ in range(num_frames)]
        if obj["instance"] == "Cube_0":
            for f in range(200, 211):
                boxes[f] = [98, 98, 26, 26]  # covers the snitch box
        tracks[key] = boxes
    return tracks


def test_perfect_perception_generation(tmp_path):
    scene = make_scene()
    # camera distance: make the snitch farther than the cube so the overlap
    # at frames 200..210 occludes the SNITCH (smaller box, farther away)
    for f in range(300):
        scene["objects"][0]["locations"][str(f)] = [0.5, 0.5, 0.3]   # snitch
        scene["objects"][3]["locations"][str(f)] = [4.0, -3.0, 1.0]  # cube near cam

    scenes_dir = tmp_path / "scenes"
    labels_dir = tmp_path / "labels"
    scenes_dir.mkdir(); labels_dir.mkdir()
    (scenes_dir / "vid1.json").write_text(json.dumps(scene))
    (labels_dir / "vid1_bb.json").write_text(json.dumps(_gt_bb_for_scene(scene)))

    gen = perfect_perception.PerfectPerceptionGenerator(
        scenes_dir, labels_dir, tmp_path / "out", visible_ratio=0.99,
        mode="visible_only")
    written = gen.generate()
    assert written == ["vid1"]

    import pickle
    with open(tmp_path / "out" / "vid1.pkl", "rb") as f:
        data = pickle.load(f)
    assert len(data["bb"]) == 300

    # during snitch containment (50..120) the snitch class is absent
    assert 140 not in data["labels"][60]
    assert 140 in data["labels"][0]
    # during Cone_1's babushka containment (80..100) Cone_1 is absent too
    from objectpermanence_tpu.vocab import OBJECTS_NAME_TO_IDX
    cone1 = OBJECTS_NAME_TO_IDX["medium_blue_cone_metal"]
    assert cone1 not in data["labels"][90]
    assert cone1 in data["labels"][130]
    # full occlusion by the closer cube at 200..210 removes the snitch
    assert 140 not in data["labels"][205]
    assert 140 in data["labels"][195]

    vis_file = gen.generate_snitch_visible_frames()
    line = vis_file.read_text().splitlines()[0]
    name, frames_str = line.split("\t")
    visible = set(int(x) for x in frames_str.split(","))
    assert 0 in visible and 60 not in visible and 205 not in visible


# ---------------------------------------------------------------------------
# Randomized action planner (VERDICT r1 missing #4)
# ---------------------------------------------------------------------------

def _find_nested_scene(max_seed=200, num_frames=300):
    """Deterministically search for a plan where a loaded cone is itself
    contained (true 'babushka' nesting: an outer contain targets a cone
    while that cone still holds the snitch)."""
    from objectpermanence_tpu.datagen.simulator import SceneSimulator

    for seed in range(max_seed):
        sim = SceneSimulator(seed, num_frames=num_frames, num_objects=7,
                             snitch_bias=0.5)
        objs, movements = sim.build()
        snitch_contains = [
            (name, m) for name, mv in movements.items() for m in mv
            if m[0] == "_contain" and m[1] == "Spl_0"]
        for inner_cone, inner_m in snitch_contains:
            for name, mv in movements.items():
                for m in mv:
                    if m[0] != "_contain" or m[1] != inner_cone:
                        continue
                    # outer contain while the inner cone still holds Spl_0
                    if sim.contains[inner_cone][m[2]] == "Spl_0":
                        return sim, objs, movements, inner_cone, name, m
    raise AssertionError("no nested-containment plan found")


def test_planner_generates_nested_containment():
    from objectpermanence_tpu.datagen import scene_labels

    sim, objs, movements, inner_cone, outer_cone, outer_m = _find_nested_scene()
    scene = sim.scene_json(objs, movements)
    labels, babushka = scene_labels.tracked_object_labels(scene)
    assert babushka > 0, "nested containment must surface as babushka frames"
    outer_label = scene_labels.class_label(
        scene_labels.object_class_name(outer_cone, scene))
    assert outer_label in labels, "outer cone must carry the snitch signal"
    # recursive was_contained resolves the full chain at a nested frame
    frame = outer_m[3]
    assert sim.was_contained(outer_cone, "Spl_0", frame)


def test_planner_collision_free_and_contained_ride_along():
    """Plans validate collision-free over many seeds, and contained objects
    ride with their container during group slides (actions.py semantics)."""
    import numpy as np
    from objectpermanence_tpu.datagen.simulator import SceneSimulator

    rode = 0
    for seed in range(25):
        sim = SceneSimulator(seed, num_frames=300, num_objects=6,
                             snitch_bias=0.5)
        objs, movements = sim.build()  # build() raises on any collision
        by_name = {o.instance: o for o in objs}
        for name, mv in movements.items():
            contains = [m for m in mv if m[0] == "_contain"]
            for cm in contains:
                inner = by_name[cm[1]]
                cone = by_name[name]
                # find a later slide of the cone while containment holds
                for sl in mv:
                    if (sl[0] == "_slide" and sl[2] > cm[3]
                            and sim.contains[name][sl[2]] == cm[1]):
                        # inner xy tracks the cone xy during the slide
                        np.testing.assert_allclose(
                            inner.positions[sl[3]][:2],
                            cone.positions[sl[3]][:2], atol=1e-9)
                        rode += 1
    assert rode > 0, "no carried slide found across 25 seeds"


def test_planner_release_splits_and_clears_containment():
    from objectpermanence_tpu.datagen.simulator import SceneSimulator

    found = False
    for seed in range(50):
        sim = SceneSimulator(seed, num_frames=300, num_objects=6,
                             snitch_bias=0.5)
        objs, movements = sim.build()
        for name, mv in movements.items():
            contain_ms = [m for m in mv if m[0] == "_contain"]
            picks = [m for m in mv if m[0] == "_pick_place"]
            for cm in contain_ms:
                later = [p for p in picks if p[2] > cm[3]]
                if later:
                    release = later[0]
                    assert sim.contains[name][release[3]] is None
                    found = True
    assert found, "no containment release found across 50 seeds"


def test_camera_motion_scenes():
    """Random camera motion (reference render_videos.py:809-843): keyframes
    every 30 frames with x OR y at +-10 and z in {8,10,12}; GT boxes move
    even for static objects; the motion draws from a DEDICATED rng so the
    scene plan itself is byte-identical to the fixed-camera scene."""
    from objectpermanence_tpu.datagen.simulator import SceneSimulator

    fixed = SceneSimulator(123, num_frames=90, num_objects=5)
    moving = SceneSimulator(123, num_frames=90, num_objects=5,
                            camera_motion=True)
    objs_f, mov_f = fixed.build()
    objs_m, mov_m = moving.build()
    # same plan: the camera stream must not perturb object randomness
    assert fixed.scene_json(objs_f, mov_f)["objects"] == \
        moving.scene_json(objs_m, mov_m)["objects"]
    assert "camera_motion" not in fixed.scene_json(objs_f, mov_f)
    keys = moving.scene_json(objs_m, mov_m)["camera_motion"]["keyframes"]
    assert keys[0][0] == 0
    base = keys[0][1]
    for f, loc in keys[1:]:
        assert f % 30 == 0 or f == 90
        assert loc[2] in (8.0, 10.0, 12.0)
        assert loc[0] in (-10.0, 10.0, base[0]) and \
            loc[1] in (-10.0, 10.0, base[1])
    # per-frame interpolation is continuous and hits the keyframes
    import numpy as np
    for f, loc in keys[:-1]:
        np.testing.assert_allclose(moving.camera_location(min(f, 89)),
                                   loc if f < 90 else keys[-1][1], atol=1.0)
    # static objects' GT boxes move when the camera does
    bb_f = fixed.gt_bb_json(objs_f)
    bb_m = moving.gt_bb_json(objs_m)
    name = objs_f[0].track_name
    assert bb_f[name] != bb_m[name]
    # boxes stay inside the frame (projection stays sane off-axis)
    for boxes in bb_m.values():
        for x, y, w, h in boxes:
            assert 0 <= x <= 320 and 0 <= y <= 240 and w >= 0 and h >= 0


def test_camera_matrix_at_base_is_identity():
    """camera_matrix_at(camera_center()) must reproduce the fixed camera."""
    import numpy as np
    from objectpermanence_tpu.ops.homography import (
        CATER_CAM, camera_center, camera_matrix_at, project_3d_point,
    )

    np.testing.assert_allclose(camera_matrix_at(camera_center()), CATER_CAM,
                               atol=1e-9)
    pts = np.array([[0.0, 0.0, 0.3], [1.0, -2.0, 0.5]])
    np.testing.assert_allclose(
        project_3d_point(pts, cam=camera_matrix_at(camera_center())),
        project_3d_point(pts), atol=1e-9)


def test_camera_motion_consistency_in_occlusion_and_paint_order():
    """Camera-motion scenes: occlusion labels and renderer paint order must
    follow the per-frame camera, not the fixed location (round-5 review)."""
    from objectpermanence_tpu.datagen.perfect_perception import (
        CAMERA_LOCATION, occluded_pair, scene_camera_location,
    )

    # camera moved to the opposite side: coord1 (near the fixed camera)
    # is now the FARTHER one, flipping which box gets occluded
    box_small = [100, 100, 20, 20]
    box_big = [95, 95, 40, 40]
    near_fixed = [5.0, -4.0, 0.3]
    far_fixed = [-5.0, 4.0, 0.3]
    r_fixed = occluded_pair(box_small, box_big, near_fixed, far_fixed, 0.5)
    moved = np.asarray([-10.0, 6.0, 8.0])
    r_moved = occluded_pair(box_small, box_big, near_fixed, far_fixed, 0.5,
                            camera_location=moved)
    assert r_fixed is None          # small box is nearer the fixed camera
    assert r_moved == (True, False)  # ...but farther from the moved one

    # scene_camera_location: fixed scenes -> constant; keyframes interp
    scene = make_scene()
    np.testing.assert_array_equal(scene_camera_location(scene, 123),
                                  CAMERA_LOCATION)
    scene["camera_motion"] = {"keyframes": [[0, [0.0, 0.0, 10.0]],
                                            [30, [10.0, 0.0, 8.0]]]}
    np.testing.assert_allclose(scene_camera_location(scene, 15),
                               [5.0, 0.0, 9.0])
    np.testing.assert_allclose(scene_camera_location(scene, 99),
                               [10.0, 0.0, 8.0])
