"""Synthetic CATER scene simulator (no Blender).

Generates scene jsons + GT `<name>_bb.json` files in the real CATER schema
(`generate/render_videos.py:359-461`'s outputs), using the actual CATER
camera matrix for 2D boxes — so the whole label pipeline (datagen/
scene_labels, datagen/perfect_perception, ingest, training) runs without
any rendered pixels. Rendering itself remains external tooling (the
reference drives Blender/Cycles; SURVEY §2.11).

Scene dynamics mirror the reference's action planner semantics
(`generate/actions.py`): per-interval actions `_slide` / `_pick_place` /
`_rotate` / `_no_op`, plus cone `_contain` events — only cones contain,
contained objects ride with their container until the cone's next
`_pick_place`, and the first three objects are always snitch, medium cone,
large cone (`render_videos.py:846-979`).
"""

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from objectpermanence_tpu import FRAME_HEIGHT, FRAME_WIDTH, VIDEO_NUM_FRAMES
from objectpermanence_tpu.ops.homography import project_3d_point
from objectpermanence_tpu.vocab import COLORS, MATERIALS

# plausible CATER object footprints (half-extent, height) per size
SIZE_GEOMETRY = {"small": (0.35, 0.7), "medium": (0.5, 1.0), "large": (0.7, 1.4)}
PLAY_RADIUS = 2.8  # objects live on the [-3, 3]^2 plane


@dataclass
class SimObject:
    instance: str
    shape: str
    size: str
    color: str
    material: str
    positions: np.ndarray = None           # (T, 3) base-center positions
    actions: List[list] = field(default_factory=list)
    contained_by: Optional[str] = None

    @property
    def class_name(self) -> str:
        return f"{self.size}_{self.color}_{self.shape}_{self.material}"

    @property
    def track_name(self) -> str:
        return f"{self.class_name}_{self.instance}"


def _project_box(center: np.ndarray, half: float, height: float) -> List[float]:
    """Project the 8 corners of an object's bounding volume to a 2D xywh
    pixel box (mirrors `camera_view_bounds_2d`, `render_videos.py:623-687`)."""
    cx, cy, cz = center
    corners = np.array([
        [cx + sx * half, cy + sy * half, cz + sz * height]
        for sx in (-1, 1) for sy in (-1, 1) for sz in (0, 1)
    ])
    img = project_3d_point(corners)  # [-1, 1], y negated already
    xs = (img[:, 0] + 1) * FRAME_WIDTH / 2
    ys = (img[:, 1] + 1) * FRAME_HEIGHT / 2
    x1 = float(np.clip(xs.min(), 0, FRAME_WIDTH - 1))
    y1 = float(np.clip(ys.min(), 0, FRAME_HEIGHT - 1))
    x2 = float(np.clip(xs.max(), 1, FRAME_WIDTH))
    y2 = float(np.clip(ys.max(), 1, FRAME_HEIGHT))
    return [x1, y1, x2 - x1, y2 - y1]


def _interp_positions(pos: np.ndarray, start: int, end: int,
                      target: np.ndarray) -> None:
    """Linearly move pos[start..end] toward target, hold afterwards."""
    start = min(start, len(pos) - 1)
    end = min(end, len(pos) - 1)
    span = max(end - start, 1)
    origin = pos[start].copy()
    for f in range(start, min(end + 1, len(pos))):
        alpha = (f - start) / span
        pos[f] = origin + alpha * (target - origin)
    pos[min(end + 1, len(pos) - 1):] = pos[min(end, len(pos) - 1)]


class SceneSimulator:
    """Randomized but deterministic scene builder."""

    def __init__(self, seed: int, num_frames: int = VIDEO_NUM_FRAMES,
                 num_objects: int = 6):
        self.rng = np.random.RandomState(seed)
        self.num_frames = num_frames
        self.num_objects = num_objects

    def _random_spot(self) -> np.ndarray:
        return np.array([self.rng.uniform(-PLAY_RADIUS, PLAY_RADIUS),
                         self.rng.uniform(-PLAY_RADIUS, PLAY_RADIUS), 0.0])

    def _make_objects(self) -> List[SimObject]:
        objs = [
            SimObject("Spl_0", "spl", "small", "gold", "metal"),
            SimObject("Cone_1", "cone", "medium",
                      self.rng.choice(COLORS), self.rng.choice(MATERIALS)),
            SimObject("Cone_2", "cone", "large",
                      self.rng.choice(COLORS), self.rng.choice(MATERIALS)),
        ]
        shapes = ["cube", "cylinder", "sphere"]
        for k in range(3, self.num_objects):
            objs.append(SimObject(
                f"Obj_{k}", self.rng.choice(shapes),
                self.rng.choice(["small", "medium", "large"]),
                self.rng.choice(COLORS), self.rng.choice(MATERIALS)))
        for obj in objs:
            obj.positions = np.tile(self._random_spot(), (self.num_frames, 1))
        return objs

    def build(self) -> Tuple[List[SimObject], Dict[str, List[list]]]:
        objs = self._make_objects()
        by_name = {o.instance: o for o in objs}
        movements: Dict[str, List[list]] = {o.instance: [] for o in objs}

        T = self.num_frames
        quarter = T // 4

        # timeline: [0, T/4): free slides; [T/4]: Cone_1 contains the snitch;
        # [T/4, T/2): carried slide; [T/2]: pick_place releases;
        # [T/2, 3T/4): more slides; optional second containment.
        for obj in objs:
            if obj.shape == "spl" or obj.instance == "Cone_1":
                continue
            start = int(self.rng.randint(5, max(quarter - 20, 6)))
            end = start + int(self.rng.randint(10, 25))
            target = self._random_spot()
            _interp_positions(obj.positions, start, end, target)
            movements[obj.instance].append(["_slide", None, start, end])

        cone1 = by_name["Cone_1"]
        snitch = by_name["Spl_0"]

        # timeline scaled to T so short test scenes stay in range
        def frames(fraction, minimum=2):
            return max(int(T * fraction), minimum)

        # contain: cone slides onto the snitch over [c_start, c_end]
        c_start = quarter
        c_end = min(c_start + frames(0.04), T - 10)
        _interp_positions(cone1.positions, c_start, c_end,
                          snitch.positions[c_start].copy())
        movements["Cone_1"].append(["_contain", "Spl_0", c_start, c_end])

        # carried slide while containing
        s_start = min(c_end + frames(0.03), T - 8)
        s_end = min(s_start + frames(0.1), T - 6)
        carry_target = self._random_spot()
        _interp_positions(cone1.positions, s_start, s_end, carry_target)
        movements["Cone_1"].append(["_slide", None, s_start, s_end])
        # the snitch rides with the cone (actions.py containment semantics)
        _interp_positions(snitch.positions, s_start, s_end, carry_target)

        # release
        p_start = min(s_end + frames(0.06), T - 4)
        p_end = min(p_start + frames(0.05), T - 2)
        release_target = self._random_spot()
        _interp_positions(cone1.positions, p_start, p_end, release_target)
        movements["Cone_1"].append(["_pick_place", None, p_start, p_end])

        # late free action for the snitch
        late = min(p_end + frames(0.06), T - 3)
        late_end = min(late + frames(0.06), T - 1)
        snitch_target = self._random_spot()
        _interp_positions(snitch.positions, late, late_end, snitch_target)
        movements["Spl_0"].append(["_slide", None, late, late_end])

        # occasionally rotate a distractor (no displacement)
        for obj in objs[3:]:
            if self.rng.rand() < 0.5:
                r_start = int(self.rng.randint(0, T - 20))
                movements[obj.instance].append(["_rotate", None, r_start, r_start + 10])

        for obj in objs:
            if not movements[obj.instance]:
                movements[obj.instance].append(["_no_op", None, 0, 10])

        return objs, movements

    def scene_json(self, objs, movements) -> dict:
        return {
            "objects": [
                {
                    "instance": o.instance, "shape": o.shape, "size": o.size,
                    "color": str(o.color), "material": str(o.material),
                    "locations": {str(f): [float(v) for v in o.positions[f]]
                                  for f in range(self.num_frames)},
                }
                for o in objs
            ],
            "movements": movements,
        }

    def gt_bb_json(self, objs) -> dict:
        tracks = {}
        for o in objs:
            half, height = SIZE_GEOMETRY[o.size]
            tracks[o.track_name] = [
                _project_box(o.positions[f], half, height)
                for f in range(self.num_frames)
            ]
        return tracks


def simulate_dataset(root, num_videos: int = 8, seed: int = 0,
                     num_frames: int = VIDEO_NUM_FRAMES,
                     num_objects: int = 6) -> Tuple[Path, Path]:
    """Write scenes/ + labels/ for `num_videos` simulated scenes.
    Returns (scenes_dir, labels_dir)."""
    root = Path(root)
    scenes_dir = root / "scenes"
    labels_dir = root / "labels"
    scenes_dir.mkdir(parents=True, exist_ok=True)
    labels_dir.mkdir(parents=True, exist_ok=True)

    for v in range(num_videos):
        name = f"CATER_sim_{v:06d}"
        sim = SceneSimulator(seed * 1000 + v, num_frames, num_objects)
        objs, movements = sim.build()
        with open(scenes_dir / f"{name}.json", "w") as f:
            json.dump(sim.scene_json(objs, movements), f)
        with open(labels_dir / f"{name}_bb.json", "w") as f:
            json.dump(sim.gt_bb_json(objs), f)
    return scenes_dir, labels_dir
