"""Vocabulary parity with the reference class table."""

import numpy as np

from objectpermanence_tpu import vocab


def test_vocab_size_and_snitch():
    assert vocab.NUM_CLASSES == 193
    assert vocab.OBJECTS_NAME_TO_IDX["small_gold_spl_metal"] == 140
    assert vocab.OBJECTS_IDX_TO_NAME[140] == "small_gold_spl_metal"


def test_spot_check_indices():
    # Anchors read from the reference table (object_indices.py)
    expected = {
        "large_blue_cone_metal": 0,
        "large_blue_cone_rubber": 32,
        "large_yellow_sphere_rubber": 63,
        "medium_blue_cone_metal": 64,
        "small_cyan_sphere_metal": 139,
        "small_gray_cone_metal": 141,
        "small_yellow_sphere_rubber": 192,
        "small_purple_cone_rubber": 181,
        "small_red_cone_rubber": 185,
    }
    for name, idx in expected.items():
        assert vocab.OBJECTS_NAME_TO_IDX[name] == idx, name


def test_is_cone():
    assert vocab.is_cone_object(0) == 1  # large_blue_cone_metal
    assert vocab.is_cone_object(140) == 0  # the snitch is not a cone
    assert vocab.is_cone_object(1) == 0  # cube
    # 3 sizes x 8 colors x 2 materials = 48 cones
    assert int(np.sum(vocab.IS_CONE)) == 48


def test_large_cone_indices_match_reference_constant():
    # reference: LARGE_CONS_INDICES = list(range(0, 64, 4)) (inference_main.py:18)
    assert list(vocab.large_cone_indices()) == list(range(0, 64, 4))
