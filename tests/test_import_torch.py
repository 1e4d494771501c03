"""Checkpoint importer: synthetic reference-shaped state dicts must land
exactly on our init trees (every path present, every shape equal), and
numerics must match torch layer semantics after layout conversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mobi_tpu.import_torch import (
    import_unet,
    import_vae,
    merge_imported,
    to_numpy_state_dict,
)


def tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_paths(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


# ---------------------------------------------------------------- torch refs
def torch_unet_state_dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                          attention_resolutions=(2, 1), context_dim=64, heads=4,
                          in_ch=9, out_ch=4, bbox_cond=True, multimodal=True):
    """Build a reference-named state dict with reference-shaped tensors by
    replaying the construction loop of openaimodel.py:664-843."""
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.02
        sd[f"{name}.bias"] = torch.zeros(o)

    def lin_nobias(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.02

    def conv(name, i, o, k=3):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k) * 0.02
        sd[f"{name}.bias"] = torch.zeros(o)

    def norm(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)

    def resblock(name, i, o, emb):
        norm(f"{name}.in_layers.0", i)
        conv(f"{name}.in_layers.2", i, o)
        lin(f"{name}.emb_layers.1", emb, o)
        norm(f"{name}.out_layers.0", o)
        conv(f"{name}.out_layers.3", o, o)
        if i != o:
            conv(f"{name}.skip_connection", i, o, k=1)

    def xattn(name, q, ctx, inner):
        lin_nobias(f"{name}.to_q", q, inner)
        lin_nobias(f"{name}.to_k", ctx, inner)
        lin_nobias(f"{name}.to_v", ctx, inner)
        lin(f"{name}.to_out.0", inner, q)

    def transformer(name, ch):
        inner = ch
        norm(f"{name}.norm", ch)
        conv(f"{name}.proj_in", ch, inner, k=1)
        conv(f"{name}.proj_out", inner, ch, k=1)
        b = f"{name}.transformer_blocks.0"
        xattn(f"{b}.attn1", inner, inner, inner)
        xattn(f"{b}.attn2", inner, context_dim, inner)
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{b}.{n}", inner)
        lin(f"{b}.ff.net.0.proj", inner, inner * 8)
        lin(f"{b}.ff.net.2", inner * 4, inner)
        if bbox_cond:
            norm(f"{b}.cond_adapter_norm", inner)
            xattn(f"{b}.cond_adapter_attn", inner, context_dim, inner)
            lin(f"{b}.cond_adapter_connector", inner, inner)
        if multimodal:
            for m in ("camera", "lidar"):
                norm(f"{b}.cross_modal_norm_{m}", inner)
                xattn(f"{b}.cross_modal_attn_{m}", inner, inner, inner)
                lin(f"{b}.cross_modal_connector_{m}", inner, inner)

    emb = model_channels * 4
    lin("time_embed.0", model_channels, emb)
    lin("time_embed.2", emb, emb)
    conv("input_blocks.0.0", in_ch, model_channels)

    idx, ds, ch = 1, 1, model_channels
    chans = [model_channels]
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            resblock(f"input_blocks.{idx}.0", ch, mult * model_channels, emb)
            ch = mult * model_channels
            if ds in attention_resolutions:
                transformer(f"input_blocks.{idx}.1", ch)
            chans.append(ch)
            idx += 1
        if level != len(channel_mult) - 1:
            conv(f"input_blocks.{idx}.0.op", ch, ch)
            chans.append(ch)
            idx += 1
            ds *= 2

    resblock("middle_block.0", ch, ch, emb)
    transformer("middle_block.1", ch)
    resblock("middle_block.2", ch, ch, emb)

    idx = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            ich = chans.pop()
            resblock(f"output_blocks.{idx}.0", ch + ich, model_channels * mult, emb)
            ch = model_channels * mult
            sub = 1
            if ds in attention_resolutions:
                transformer(f"output_blocks.{idx}.{sub}", ch)
                sub += 1
            if level and i == num_res_blocks:
                conv(f"output_blocks.{idx}.{sub}.conv", ch, ch)
                ds //= 2
            idx += 1

    norm("out.0", ch)
    conv("out.2", model_channels, out_ch)
    return sd


def test_unet_import_structure_and_apply():
    from mobi_tpu.models.unet import UNetModel

    unet = UNetModel(
        in_channels=9, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        context_dim=64, bbox_cond=True, use_camera=True, use_lidar=True,
    )
    x = jnp.zeros((2, 8, 8, 9))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 2, 64))
    init = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    sd = to_numpy_state_dict(torch_unet_state_dict())
    imported = import_unet(sd, channel_mult=(1, 2), num_res_blocks=1,
                           attention_resolutions=(2, 1))

    init_paths = tree_paths(init)
    imp_paths = tree_paths(imported)
    missing = set(init_paths) - set(imp_paths)
    extra = set(imp_paths) - set(init_paths)
    assert not missing, f"importer missed {sorted(missing)[:8]}"
    assert not extra, f"importer produced unknown paths {sorted(extra)[:8]}"
    for p in init_paths:
        assert init_paths[p] == imp_paths[p], (
            f"shape mismatch at {p}: init {init_paths[p]} vs ckpt {imp_paths[p]}"
        )

    merged = merge_imported(init, imported)
    out = unet.apply({"params": merged},
                     jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 9)),
                     jnp.array([3, 500]),
                     jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64)))
    assert np.all(np.isfinite(np.asarray(out)))


def torch_vae_state_dict(ch=16, ch_mult=(1, 2), num_res_blocks=1, in_ch=3,
                         out_ch=3, z=4, lidar_adapter=False):
    sd = {}

    def conv(name, i, o, k=(3, 3)):
        sd[f"{name}.weight"] = torch.randn(o, i, *k) * 0.02
        sd[f"{name}.bias"] = torch.zeros(o)

    def norm(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)

    def res(name, i, o, k=(3, 3)):
        norm(f"{name}.norm1", i)
        conv(f"{name}.conv1", i, o, k)
        norm(f"{name}.norm2", o)
        conv(f"{name}.conv2", o, o, k)
        if i != o:
            conv(f"{name}.nin_shortcut", i, o, (1, 1))

    def attn(name, c):
        norm(f"{name}.norm", c)
        for n in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{n}", c, c, (1, 1))

    # encoder
    if lidar_adapter:
        conv("encoder.conv_in_lidar", in_ch, ch, (1, 5))
        res("encoder.res_block_lidar1", ch, ch, (1, 5))
        res("encoder.res_block_lidar2", ch, ch, (1, 5))
    else:
        conv("encoder.conv_in", in_ch, ch)
    cin = ch
    for lvl, mult in enumerate(ch_mult):
        for b in range(num_res_blocks):
            res(f"encoder.down.{lvl}.block.{b}", cin, ch * mult)
            cin = ch * mult
        if lvl != len(ch_mult) - 1:
            conv(f"encoder.down.{lvl}.downsample.conv", cin, cin)
    res("encoder.mid.block_1", cin, cin)
    attn("encoder.mid.attn_1", cin)
    res("encoder.mid.block_2", cin, cin)
    norm("encoder.norm_out", cin)
    conv("encoder.conv_out", cin, 2 * z)
    # decoder
    conv("decoder.conv_in", z, cin)
    res("decoder.mid.block_1", cin, cin)
    attn("decoder.mid.attn_1", cin)
    res("decoder.mid.block_2", cin, cin)
    cur = cin
    for lvl in reversed(range(len(ch_mult))):
        for b in range(num_res_blocks + 1):
            res(f"decoder.up.{lvl}.block.{b}", cur, ch * ch_mult[lvl])
            cur = ch * ch_mult[lvl]
        if lvl != 0:
            conv(f"decoder.up.{lvl}.upsample.conv", cur, cur)
    if lidar_adapter:
        res("decoder.res_block_lidar1", cur, cur, (1, 5))
        norm("decoder.norm_out_lidar1", cur)
        res("decoder.res_block_lidar2", cur, cur, (1, 5))
        norm("decoder.norm_out_lidar2", cur)
        conv("decoder.conv_out_lidar", cur, out_ch, (1, 5))
    else:
        norm("decoder.norm_out", cur)
        conv("decoder.conv_out", cur, out_ch)
    conv("quant_conv", 2 * z, 2 * z, (1, 1))
    conv("post_quant_conv", z, z, (1, 1))
    return sd


@pytest.mark.parametrize("lidar_adapter", [False, True])
def test_vae_import_structure(lidar_adapter):
    from mobi_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(
        embed_dim=4, ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
        z_channels=4, out_ch=2 if lidar_adapter else 3,
        lidar_adapter=lidar_adapter,
    )
    x = jnp.zeros((1, 32, 32, 2 if lidar_adapter else 3))
    init = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    sd = to_numpy_state_dict(
        torch_vae_state_dict(
            in_ch=2 if lidar_adapter else 3, out_ch=2 if lidar_adapter else 3,
            lidar_adapter=lidar_adapter,
        )
    )
    imported = import_vae(sd, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                          lidar_adapter=lidar_adapter)
    init_paths = tree_paths(init)
    imp_paths = tree_paths(imported)
    assert set(init_paths) == set(imp_paths), (
        f"missing={sorted(set(init_paths) - set(imp_paths))[:6]} "
        f"extra={sorted(set(imp_paths) - set(init_paths))[:6]}"
    )
    for p in init_paths:
        assert init_paths[p] == imp_paths[p], p


def test_dense_numeric_parity_after_import():
    """torch Linear == our Dense after the [out,in]->[in,out] transpose."""
    torch_lin = torch.nn.Linear(8, 5)
    x = torch.randn(3, 8)
    ref = torch_lin(x).detach().numpy()

    from mobi_tpu.models.layers import Dense

    d = Dense(5)
    params = {
        "params": {
            "Dense_0": {
                "kernel": jnp.asarray(torch_lin.weight.detach().numpy().T),
                "bias": jnp.asarray(torch_lin.bias.detach().numpy()),
            }
        }
    }
    ours = np.asarray(d.apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_numeric_parity_after_import():
    torch_conv = torch.nn.Conv2d(3, 6, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    ref = torch_conv(x).detach().numpy().transpose(0, 2, 3, 1)

    from mobi_tpu.import_torch import _t_conv
    from mobi_tpu.models.layers import Conv2d

    c = Conv2d(6, (3, 3))
    params = {
        "params": {
            "Conv_0": {
                "kernel": jnp.asarray(_t_conv(torch_conv.weight.detach().numpy())),
                "bias": jnp.asarray(torch_conv.bias.detach().numpy()),
            }
        }
    }
    ours = np.asarray(c.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_import_lidar_stage_from_config(tmp_path):
    """lidar_stage_config.params.ckpt_path auto-load (reference
    ddpm.py:546-562): existing file overlays the lidar VAE leaves; a missing
    file warns and leaves params untouched."""
    import torch

    from mobi_tpu.import_torch import import_lidar_stage_from_config
    from mobi_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(
        embed_dim=4, ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
        z_channels=4, out_ch=2, lidar_adapter=True,
    )
    init = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)), jax.random.PRNGKey(1)
    )["params"]
    params = {"vae_lidar": init, "unet": {"w": np.zeros((2, 2), np.float32)}}

    ckpt = tmp_path / "range_autoencoder.ckpt"
    torch.save(
        {"state_dict": torch_vae_state_dict(in_ch=2, out_ch=2, lidar_adapter=True)},
        ckpt,
    )
    cfg = {
        "range_height": 32,
        "model": {"params": {
            "use_lidar": True,
            "lidar_stage_config": {"params": {
                "ckpt_path": str(ckpt),
                "ddconfig": {
                    "ch": 16, "ch_mult": [1, 2], "num_res_blocks": 1,
                    "resolution": 32, "lidar_adapter": True,
                    "attn_resolutions": [],
                },
            }},
        }},
    }
    out = import_lidar_stage_from_config(cfg, params)
    # lidar leaves replaced, other trees untouched
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        params["vae_lidar"], out["vae_lidar"],
    )
    assert any(jax.tree_util.tree_leaves(changed))
    np.testing.assert_array_equal(out["unet"]["w"], params["unet"]["w"])

    # missing file: unchanged params, no raise
    cfg["model"]["params"]["lidar_stage_config"]["params"]["ckpt_path"] = (
        str(tmp_path / "nope.ckpt")
    )
    out2 = import_lidar_stage_from_config(cfg, params)
    assert out2 is params
