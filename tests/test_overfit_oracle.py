"""The learning-capability oracle: train -> sample LEARNS to inpaint.

Everything else in the suite pins pieces (golden module parity, loss
descent, sampler math); this is the composition test: a model trained by
mobi_tpu.training on a fixed tiny object set, sampled through the
production pipeline (get_input -> scanned DDIM -> decode_sample), must
reconstruct the masked object region — not just descend a loss. The
reference's equivalent oracle is its realism bench against published
checkpoints (/root/reference/README.md:155-160), unavailable without the
artifacts; this closed-loop gate needs none.

Calibration (1-core CPU host, seeds fixed, ~6 min):
  untrained: camera 9.3 dB, lidar 8.4 dB (masked-region PSNR vs GT)
  do-nothing baseline (the blanked hole): camera 10.3 dB, lidar 10.7 dB
  after VAE overfit (400) + full-UNet diffusion overfit (800, loss
  1.0 -> 0.039): camera 16.0 dB, lidar 13.0 dB, depth-MSE 0.56 -> 0.17
Gates sit ~2-3 dB below the calibrated results.

The v5e runs the same harness at mini-256 scale:
scripts/overfit_oracle_drive.py (PROFILE.md "Overfit learning oracle").
"""
import dataclasses

import jax
import numpy as np
import pytest

from mobi_tpu.models.diffusion import MobiDiffusion
from mobi_tpu.overfit_oracle import (
    make_object_set,
    overfit_diffusion,
    overfit_vaes,
    sample_and_score,
)
from tests.test_diffusion import TINY, TinyCondStage


@pytest.fixture(scope="module")
def oracle_base(cpu_devices):
    """Shared phase 1+2: untrained scores + overfit VAEs (reused by both
    the pure-overfit and the production-CFG-protocol diffusion runs)."""
    cfg = dataclasses.replace(TINY, u_cond_percent=0.0)
    model = MobiDiffusion(cfg)
    model.cond_model = TinyCondStage(conditions=("ref_image", "ref_bbox"))
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_object_set(4, 32, 32, seed=0)

    untrained = sample_and_score(model, params, batch, num_steps=10)
    params, vae_final = overfit_vaes(model, params, batch, steps=400)
    # host copies: both downstream diffusion fixtures run DONATED train
    # steps (overfit_diffusion), which would delete shared device buffers
    # out from under the other fixture
    return model, jax.device_get(params), batch, untrained, vae_final


@pytest.fixture(scope="module")
def oracle_run(oracle_base):
    model, params, batch, untrained, vae_final = oracle_base
    params, diff_final = overfit_diffusion(
        model, params, batch, steps=800, lr=3e-4
    )
    trained = sample_and_score(model, params, batch, num_steps=10)
    return untrained, trained, vae_final, diff_final


@pytest.fixture(scope="module")
def oracle_cfg_run(oracle_base):
    """The PRODUCTION protocol: CFG-dropout training (u_cond_percent=0.2,
    reference ddpm.py:1052-1056) then guided sampling at scale 5 through
    segmented PLMS (scripts/realism_test_bench.sh's --plms --scale 5).
    Proves the uncond vectors train into something that GUIDES — numeric
    golden parity of the CFG math cannot show that."""
    base_model, params, batch, untrained, _ = oracle_base
    cfg = dataclasses.replace(TINY, u_cond_percent=0.2)
    model = MobiDiffusion(cfg)
    model.cond_model = base_model.cond_model
    params, diff_final = overfit_diffusion(
        model, params, batch, steps=800, lr=3e-4, seed=3
    )
    trained = sample_and_score(
        model, params, batch, num_steps=10, guidance_scale=5.0,
        sampler="plms", sample_segments=5,
    )
    # same weights, unguided DDIM — isolates what guidance adds/destroys
    unguided = sample_and_score(model, params, batch, num_steps=10)
    return untrained, trained, unguided, diff_final


def test_vae_overfit_reconstructs(oracle_run):
    _, _, vae_final, _ = oracle_run
    assert vae_final["vae_camera"] < 0.05, vae_final
    assert vae_final["vae_lidar"] < 0.05, vae_final


def test_diffusion_loss_descends_to_overfit(oracle_run):
    _, _, _, diff_final = oracle_run
    assert diff_final["final_loss"] < 0.15, diff_final


def test_sampled_inpaints_beat_baselines(oracle_run):
    """THE gate: the sampled inpaint's masked-region PSNR must clear the
    do-nothing baseline by a wide margin and an absolute bar, in BOTH
    modalities — i.e. the trained system actually paints the object."""
    untrained, trained, _, _ = oracle_run
    c, c_base = trained["camera_psnr"], trained["camera_psnr_baseline"]
    l, l_base = trained["lidar_psnr"], trained["lidar_psnr_baseline"]

    assert c > c_base + 2.5, (trained, untrained)
    assert c > 13.5, trained
    assert l > l_base + 1.0, (trained, untrained)
    assert l > 11.5, trained
    # and it must be LEARNED: a clear gap over the untrained model
    assert c > untrained["camera_psnr"] + 4.0
    assert l > untrained["lidar_psnr"] + 2.0
    # lidar depth error (the reference's on-line metric family,
    # ddpm.py:1545-1597) collapses vs untrained
    assert trained["lidar_depth_mse"] < 0.3


def test_production_protocol_guides_not_garbles(oracle_cfg_run):
    """CFG-dropout training + scale-5 guided segmented-PLMS sampling (the
    reference's realism-bench protocol) must still inpaint: beat the
    do-nothing baseline and the untrained model in both modalities, and
    guidance must not collapse the result vs the same weights unguided."""
    untrained, trained, unguided, diff_final = oracle_cfg_run
    assert diff_final["final_loss"] < 0.2, diff_final

    c, c_base = trained["camera_psnr"], trained["camera_psnr_baseline"]
    l, l_base = trained["lidar_psnr"], trained["lidar_psnr_baseline"]
    assert c > c_base + 1.5, (trained, unguided)
    assert l > l_base + 0.5, (trained, unguided)
    assert c > untrained["camera_psnr"] + 3.0, (trained, untrained)
    # guidance at scale 5 extrapolates eps; on an overfit set it may cost
    # a little fidelity but must not destroy the inpaint
    assert c > unguided["camera_psnr"] - 3.0, (trained, unguided)
    assert l > unguided["lidar_psnr"] - 3.0, (trained, unguided)
