"""Camera-FID path parity: the reference's "FID" is a CLIP-FID (its vendored
inception.py:143-145 rewires InceptionV3.forward to clip.encode_image with
the OpenAI clip.load preprocess). These tests pin our pipeline to oracles:

  * preprocessing vs transformers.CLIPImageProcessor — HF's validated
    replica of the OpenAI `clip.load` transform (resize shortest-edge-224
    bicubic -> center-crop 224 -> CLIP normalize)
  * encode_image features vs transformers.CLIPVisionModelWithProjection
    (pooler -> visual_projection, no L2 norm — inception.py:143 output)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_golden_reference import max_err, nhwc, randomize_  # noqa: E402

from mobi_tpu.import_torch import to_numpy_state_dict  # noqa: E402

from mobi_tpu.eval.clip_embed import clip_preprocess_image, import_clip_b32  # noqa: E402
from mobi_tpu.models.clip import CLIPVisionTower  # noqa: E402


@pytest.mark.parametrize("size", [(400, 225), (123, 456), (224, 224), (640, 360)])
def test_clip_preprocess_matches_hf_processor(size):
    from PIL import Image

    rng = np.random.default_rng(hash(size) % 2**31)
    w, h = size
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))

    proc = transformers.CLIPImageProcessor()  # ViT-B/32 defaults: 224/224
    want = proc(images=img, return_tensors="np")["pixel_values"][0]  # CHW
    got = clip_preprocess_image(img)  # HWC

    err = np.abs(got.transpose(2, 0, 1) - want).max()
    assert err < 1e-5, f"preprocess max-err {err} at size {size}"


def test_clip_fid_features_match_encode_image():
    """import_clip_b32 + tower + projection == HF image_embeds (<1e-4)."""
    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=48, hidden_act="quick_gelu",
    )
    model = transformers.CLIPVisionModelWithProjection(cfg)
    randomize_(model, seed=11)
    model.eval()

    g = torch.Generator().manual_seed(5)
    img = torch.randn(3, 3, 32, 32, generator=g)
    with torch.no_grad():
        want = model(pixel_values=img).image_embeds.numpy()

    params, proj = import_clip_b32(
        to_numpy_state_dict(model.state_dict()), num_layers=2
    )
    tower = CLIPVisionTower(image_size=32, patch_size=16, width=64,
                            layers=2, heads=4)
    pooled = tower.apply({"params": params}, nhwc(img))
    got = np.asarray(pooled @ jnp.asarray(proj))

    assert proj.shape == (64, 48)
    err = max_err(got, want)
    assert err < 1e-4, f"encode_image feature max-err {err}"


def test_fid_cli_backbones_wired():
    """The CLI defaults to the reference-faithful clip backbone and keeps
    inception as an explicit opt-in."""
    import importlib

    mod = importlib.import_module("eval_tool.camera.fid_score")
    assert hasattr(mod, "compute_clip_features")
    assert hasattr(mod, "compute_inception_features")
    src = open(mod.__file__).read()
    assert 'default="clip"' in src
