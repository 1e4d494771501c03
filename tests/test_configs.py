"""Every shipped YAML config loads, interpolates, and translates to a valid
MobiConfig (reference ships 8 configs: configs/*.yaml — see SURVEY §1
"config system"; values mirror /root/reference/configs/)."""

import glob
import os

import pytest

from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GENERATIVE = sorted(
    p
    for p in glob.glob(os.path.join(REPO, "configs", "*.yaml"))
    if "range_autoencoder" not in p
)


def test_all_reference_config_names_present():
    names = {os.path.basename(p) for p in glob.glob(os.path.join(REPO, "configs", "*"))}
    for ref in [
        "mobi_nusc-mini_256.yaml",
        "mobi_nusc-mini_512.yaml",
        "mobi_nusc_256.yaml",
        "mobi_nusc_512.yaml",
        "mobi_nusc_all-classes_256.yaml",
        "mobi_nusc_all-classes_512.yaml",
        "pbe.yaml",
        "range_autoencoder.yaml",
    ]:
        assert ref in names, f"reference config {ref} missing"


@pytest.mark.parametrize("path", GENERATIVE, ids=os.path.basename)
def test_config_loads_and_translates(path):
    cfg = load_config([path])
    mcfg = mobi_config_from_yaml(cfg)

    # latent = image_width // 8 (f=8 VAE) — the interpolation resolved
    assert mcfg.latent_size == cfg["image_width"] // 8 == mcfg.image_width // 8
    assert mcfg.image_height == cfg["image_height"]

    name = os.path.basename(path)
    if "pbe" in name:
        assert mcfg.use_camera and not mcfg.use_lidar
    else:
        assert mcfg.use_camera and mcfg.use_lidar
    if "all-classes" in name:
        assert len(cfg["classes"]) == 10
    # conditions tuple resolved through ${conditions}
    assert "ref_image" in mcfg.cond_stage_key

    # the resolution pairs: 256-variants train at batch >= 4, 512 at 2
    if "_256" in name and "mini" not in name and "pbe" not in name:
        assert cfg["batch_size"] == 20
    if name in ("mobi_nusc_512.yaml", "mobi_nusc_all-classes_512.yaml", "pbe.yaml"):
        assert cfg["batch_size"] == 2


@pytest.mark.parametrize(
    "name,epochs",
    [("mobi_nusc_256.yaml", 20), ("mobi_nusc_512.yaml", 30), ("pbe.yaml", 40)],
)
def test_trainer_epochs_match_reference(name, epochs):
    cfg = load_config([os.path.join(REPO, "configs", name)])
    assert cfg["trainer"]["max_epochs"] == epochs
