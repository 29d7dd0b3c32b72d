"""Reference-trained `.pth` checkpoint loading (VERDICT r3 #2).

Round-trip: the REFERENCE's own torch models (imported from
/root/reference, executed — never copied) are instantiated, their
state_dicts saved as `.pth`, converted through
`models/convert_reasoning.py`, and the converted params must reproduce the
reference model's outputs within float tolerance — including
transformer_lstm under the `reference_compat` model-config flag, which
reproduces the reference's actual cross-batch attention semantics
(`learned_models.py:167,185`).
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
import torch
import jax

from objectpermanence_tpu.models.convert_reasoning import (
    convert_reference_state_dict,
)
from objectpermanence_tpu.models.registry import get_model_spec, init_model

REF_ROOT = Path("/root/reference")

# small dims keep the round-trip fast; conversion is shape-driven
CFGS = {
    "opnet": {"object_to_track_pred_dim": 15,
              "object_to_track_hidden_dim": 64, "videos_hidden_dim": 96},
    "opnet_lstm_mlp": {"object_to_track_pred_dim": 15,
                       "object_to_track_hidden_dim": 64,
                       "videos_hidden_dim": 96},
    "baseline_lstm": {"videos_hidden_dim": 96},
    "non_linear_lstm": {"boxes_features_dim": 32, "videos_hidden_dim": 96},
    "transformer_lstm": {"boxes_features_dim": 32, "num_attention_heads": 2,
                         "num_attention_layers": 2, "num_lstm_layers": 2,
                         "lstm_hidden_dim": 96},
}
REF_CLASSES = {
    "opnet": "OPNet", "opnet_lstm_mlp": "OPNetLstmMlp",
    "baseline_lstm": "BaselineLstm", "non_linear_lstm": "NonLinearLstm",
    "transformer_lstm": "TransformerLstm",
}
B, T, O = 2, 6, 15


def _ref_models():
    if not REF_ROOT.exists():
        pytest.skip("reference repo not mounted")
    spec = importlib.util.spec_from_file_location(
        "ref_learned_models_pth", REF_ROOT / "baselines" / "learned_models.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _boxes(feat, seed=3):
    return np.random.RandomState(seed).rand(B, T, O, feat).astype(np.float32)


@pytest.mark.parametrize("name", sorted(CFGS))
def test_pth_round_trip(name, tmp_path):
    """reference model -> .pth -> init_model -> identical outputs."""
    ref = _ref_models()
    torch.manual_seed(0)
    t_model = getattr(ref, REF_CLASSES[name])(CFGS[name]).eval()
    pth = tmp_path / "ref.pth"
    torch.save(t_model.state_dict(), pth)

    cfg = dict(CFGS[name])
    if name == "transformer_lstm":
        cfg["reference_compat"] = True   # reproduce the reference's actual
        #                                  cross-batch attention
    spec, params = init_model(name, cfg, checkpoint_path=str(pth))

    x = _boxes(spec.feature_width)
    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x))
    if spec.double_output:
        got_boxes, got_logits = spec.apply(params, x)
        np.testing.assert_allclose(np.asarray(got_boxes), ref_out[0].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_logits), ref_out[1].numpy(),
                                   rtol=1e-4, atol=1e-5)
    else:
        tol = (dict(rtol=1e-3, atol=1e-4) if name == "transformer_lstm"
               else dict(rtol=1e-4, atol=1e-5))
        got = spec.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), **tol)


def test_no_labels_variant_shares_format(tmp_path):
    """opnet_no_labels loads an OPNet-format .pth (same architecture)."""
    ref = _ref_models()
    torch.manual_seed(1)
    t_model = ref.OPNet(CFGS["opnet"]).eval()
    pth = tmp_path / "ref.pth"
    torch.save(t_model.state_dict(), pth)
    spec, params = init_model("opnet_no_labels", CFGS["opnet"],
                              checkpoint_path=str(pth))
    x = _boxes(6)
    with torch.no_grad():
        ref_boxes, _ = t_model(torch.from_numpy(x))
    got_boxes, _ = spec.apply(params, x)
    np.testing.assert_allclose(np.asarray(got_boxes), ref_boxes.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_transformer_compat_differs_from_default():
    """The compat path must actually change semantics (cross-batch
    attention): same params, same input, different outputs."""
    cfg = CFGS["transformer_lstm"]
    spec = get_model_spec("transformer_lstm")
    params = spec.init(jax.random.PRNGKey(0), cfg)
    x = _boxes(5)
    default = np.asarray(spec.apply(params, x))
    compat = np.asarray(spec.apply(params, x, reference_compat=True))
    assert not np.allclose(default, compat)


def test_strict_conversion_errors():
    ref = _ref_models()
    torch.manual_seed(0)
    sd = ref.OPNet(CFGS["opnet"]).state_dict()
    spec = get_model_spec("opnet")
    template = spec.init(jax.random.PRNGKey(0), CFGS["opnet"])

    missing = {k: v for k, v in sd.items() if "prediction_layer" not in k}
    with pytest.raises(KeyError):
        convert_reference_state_dict("opnet", missing, template)

    extra = dict(sd, stray_tensor=torch.zeros(3))
    with pytest.raises(ValueError, match="unconsumed"):
        convert_reference_state_dict("opnet", extra, template)

    bad_cfg_template = spec.init(
        jax.random.PRNGKey(0), dict(CFGS["opnet"], videos_hidden_dim=128))
    with pytest.raises(ValueError, match="shape"):
        convert_reference_state_dict("opnet", sd, bad_cfg_template)

    with pytest.raises(ValueError, match="beyond-reference|no reference"):
        convert_reference_state_dict("opnet_moe", sd, template)


def test_cli_inference_from_pth(tmp_path):
    """The inference driver accepts `model_path: *.pth` end-to-end
    (reference `models_factory.py:76-78` usage)."""
    from objectpermanence_tpu.data.fixtures import write_fixture_dataset
    from objectpermanence_tpu.infer.reasoning import reasoning_inference_main

    ref = _ref_models()
    torch.manual_seed(0)
    t_model = ref.OPNet(CFGS["opnet"]).eval()
    pth = tmp_path / "ref.pth"
    torch.save(t_model.state_dict(), pth)

    pred_dir, labels_dir, _ = write_fixture_dataset(
        tmp_path / "data", num_videos=2, seed=5, num_frames=12)
    results_dir = tmp_path / "results"
    reasoning_inference_main("opnet", str(results_dir), {
        "batch_size": 2,
        "sample_dir": str(pred_dir),
        "labels_dir": str(labels_dir),
        "model_path": str(pth),
    }, CFGS["opnet"])
    preds = sorted(results_dir.glob("*_bb.json"))
    assert len(preds) == 2

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
