"""Legacy LDM surfaces: ClassEmbedder, CLIP text tower, BERT/x-transformer
text encoder, EncoderUNetModel, noisy-latent classifier, aux datasets."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mobi_tpu.models.clip import CLIPTextTower
from mobi_tpu.models.encoders import ClassEmbedder
from mobi_tpu.models.text_transformer import (
    BERTEmbedder,
    SpatialRescaler,
    TransformerWrapper,
)
from mobi_tpu.models.unet import EncoderUNetModel


def test_class_embedder_lookup():
    emb = ClassEmbedder(num_classes=5, embed_dim=16)
    labels = jnp.asarray([0, 3, 3])
    params = emb.init(jax.random.PRNGKey(0), labels)
    out = emb.apply(params, labels)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(out[1], out[2])
    assert not np.allclose(out[0], out[1])


def test_clip_text_tower_causal():
    tower = CLIPTextTower(vocab_size=64, max_positions=16, width=32,
                          layers=2, heads=4)
    ids = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 0]])
    params = tower.init(jax.random.PRNGKey(0), ids)
    h = tower.apply(params, ids)
    assert h.shape == (1, 8, 32)
    # causality: changing a LATER token must not change earlier positions
    ids2 = ids.at[0, 6].set(7)
    h2 = tower.apply(params, ids2)
    np.testing.assert_allclose(h[:, :6], h2[:, :6], atol=1e-5)
    assert not np.allclose(h[:, 6:], h2[:, 6:])


def test_bert_embedder_shapes():
    emb = BERTEmbedder(n_embed=32, n_layer=2, vocab_size=100, max_seq_len=12)
    ids = jnp.zeros((2, 12), jnp.int32)
    params = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(params, ids)
    assert out.shape == (2, 12, 32)


def test_transformer_wrapper_padding_mask():
    tw = TransformerWrapper(num_tokens=50, max_seq_len=8, dim=16, depth=1,
                            heads=2)
    ids = jnp.asarray([[3, 4, 5, 0, 0, 0, 0, 0]])
    mask = jnp.asarray([[True, True, True, False, False, False, False, False]])
    params = tw.init(jax.random.PRNGKey(0), ids, mask)
    h = tw.apply(params, ids, mask)
    # padded tokens must not influence kept positions
    ids2 = ids.at[0, 5].set(9)
    h2 = tw.apply(params, ids2, mask)
    np.testing.assert_allclose(h[:, :3], h2[:, :3], atol=1e-5)


def test_spatial_rescaler():
    sr = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=4)
    x = jnp.zeros((1, 16, 16, 3))
    params = sr.init(jax.random.PRNGKey(0), x)
    y = sr.apply(params, x)
    assert y.shape == (1, 4, 4, 4)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial"])
def test_encoder_unet_pools(pool):
    m = EncoderUNetModel(
        in_channels=4, model_channels=16, out_channels=7, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        pool=pool,
    )
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    logits = m.apply(params, x, t)
    assert logits.shape == (2, 7)


def test_noisy_latent_classifier_trains():
    from mobi_tpu.models.classifier import (
        NoisyLatentClassifier,
        make_classifier_train_step,
    )

    clf = NoisyLatentClassifier(
        num_classes=3, in_channels=2, model_channels=8, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(), pool="adaptive",
        num_timesteps=10,
    )
    params = clf.init_params(jax.random.PRNGKey(0), latent_size=8)
    tx = optax.adam(1e-3)
    step = make_classifier_train_step(clf, tx)
    opt_state = tx.init(params)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 2))
    labels = jnp.asarray([0, 1, 2, 1])
    m0 = None
    for i in range(3):
        params, opt_state, metrics = step(
            params, opt_state, z0, labels, jax.random.PRNGKey(2 + i)
        )
        if m0 is None:
            m0 = metrics
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_openimages_dataset(tmp_path):
    import cv2

    from mobi_tpu.data.aux_datasets import OpenImagesDataset

    root = tmp_path / "oi"
    (root / "bbox" / "train_0").mkdir(parents=True)
    (root / "images" / "train_0").mkdir(parents=True)
    img = np.random.default_rng(0).integers(
        0, 255, (64, 96, 3), dtype=np.uint8
    )
    cv2.imwrite(str(root / "images" / "train_0" / "abc.jpg"), img)
    (root / "bbox" / "train_0" / "abc.txt").write_text("20 10 60 40\n")

    ds = OpenImagesDataset("train", str(root), image_size=32)
    assert len(ds) == 1
    ex = ds[0]
    assert ex["GT"].shape == (32, 32, 3)
    assert ex["inpaint_image"].shape == (32, 32, 3)
    assert ex["inpaint_mask"].shape == (32, 32, 1)
    assert ex["ref_img"].shape == (224, 224, 3)
    # masked region is zeroed in inpaint_image
    np.testing.assert_allclose(
        ex["inpaint_image"], ex["GT"] * ex["inpaint_mask"], atol=1e-6
    )
    assert ex["inpaint_mask"].min() == 0.0  # some region is masked


def test_lsun_and_imagenet_folder(tmp_path):
    import cv2

    from mobi_tpu.data.aux_datasets import ImageNetFolder, LSUNBase

    d = tmp_path / "imgs" / "n01440764"
    d.mkdir(parents=True)
    img = np.zeros((40, 60, 3), np.uint8)
    cv2.imwrite(str(d / "x.jpg"), img)

    inet = ImageNetFolder(str(tmp_path / "imgs"), size=16)
    ex = inet[0]
    assert ex["image"].shape == (16, 16, 3)
    assert int(ex["class_label"]) == 0

    lst = tmp_path / "list.txt"
    lst.write_text("n01440764/x.jpg\n")
    lsun = LSUNBase(str(lst), str(tmp_path / "imgs"), size=16, flip_p=0.0)
    ex = lsun[0]
    assert ex["image"].shape == (16, 16, 3)
