"""Strongest parity check: run the REFERENCE's own model implementation
(imported from /root/reference, executed — never copied) on data produced
by our ingest pipeline, with weights copied tensor-for-tensor into our
model, and require float-level agreement of the outputs."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from objectpermanence_tpu.data import ingest
from objectpermanence_tpu.data.fixtures import write_fixture_dataset
from objectpermanence_tpu.models.registry import get_model_spec

REF_ROOT = Path("/root/reference")

OPNET_CFG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 64,
             "videos_hidden_dim": 96}


def _load_reference_models():
    if not REF_ROOT.exists():
        pytest.skip("reference repo not mounted")
    spec = importlib.util.spec_from_file_location(
        "ref_learned_models", REF_ROOT / "baselines" / "learned_models.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ingest_plus_opnet_matches_reference_model(tmp_path):
    ref_models = _load_reference_models()
    torch.manual_seed(0)
    ref_opnet = ref_models.OPNet(OPNET_CFG).eval()

    # data through OUR ingest (already golden-tested vs the reference's
    # dataset state machines)
    pred_dir, labels_dir, _ = write_fixture_dataset(tmp_path, num_videos=3,
                                                    seed=21, num_frames=50)
    dataset = ingest.ingest_directory(pred_dir, labels_dir, feature_width=6)
    boxes = dataset.boxes  # (3, 50, 15, 6)

    with torch.no_grad():
        ref_y, ref_logits = ref_opnet(torch.from_numpy(boxes))

    # copy the reference's weights into our parameter tree
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), OPNET_CFG)
    sd = ref_opnet.state_dict()

    def t(name):
        return jnp.asarray(sd[name].numpy())

    params["att_lstm"]["w_ih"] = t("object_to_track_LSTM.weight_ih_l0").T
    params["att_lstm"]["w_hh"] = t("object_to_track_LSTM.weight_hh_l0").T
    params["att_head"]["w"] = t("object_to_track_prediction.weight").T
    params["video_lstm"]["w_ih"] = t("video_LSTM.weight_ih_l0").T
    params["video_lstm"]["w_hh"] = t("video_LSTM.weight_hh_l0").T
    params["box_head"]["w"] = t("prediction_layer.weight").T

    got_y, got_logits = spec.apply(params, jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(got_y), ref_y.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logits), ref_logits.numpy(),
                               rtol=1e-4, atol=1e-5)

    # and the fused Pallas kernel agrees too (interpret mode on CPU)
    from objectpermanence_tpu.ops.pallas_scan import opnet_fused_forward
    fused_y, fused_logits = opnet_fused_forward(params, jnp.asarray(boxes),
                                                block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(fused_y), ref_y.numpy(),
                               rtol=1e-4, atol=1e-5)

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
