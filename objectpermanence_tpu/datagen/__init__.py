"""Dataset/label generation tooling (offline, host-side).

Ports of the reference's `generate/` label-derivation scripts (SURVEY
§2.11) as pure Python/numpy — Blender rendering itself stays external
tooling. Consumes the CATER scene-json schema:

- `scene["objects"]`: [{instance, size, color, shape, material,
  locations: {frame: [x, y, z]}}]
- `scene["movements"]`: {instance: [(action_name, target_or_None,
  start_frame, end_frame), ...]} where `_contain` actions carry the
  contained instance as target and containment runs from the contain
  action's END frame until the cone's next `_pick_place` START frame.
"""
