"""Value-level golden parity for the BEVFusion detector stack.

Oracles are the REFERENCE's own vendored torch modules
(/root/reference/bevfusion/mmdet3d/models/...) executed through the minimal
mm* stubs in tests/mm_stubs.py, with randomized weights exported in the
reference checkpoint layout and imported via mobi_tpu.import_bevfusion.
Where the reference does not vendor the torch source (mmdet Swin), the test
builds a torch replica of the documented mmdet semantics in-file.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mm_stubs  # noqa: E402
from test_golden_reference import max_err, nchw_to_nhwc, randomize_  # noqa: E402

from mobi_tpu.import_bevfusion import (  # noqa: E402
    import_lss_fpn,
    import_depth_lss,
    import_fuser,
    import_second,
    import_second_fpn,
    import_sparse_encoder,
    import_swin,
    import_transfusion_head,
)


def randomize_with_buffers_(module, seed=0, scale=0.05):
    """randomize_ + gaussian BN running stats (positive running_var) so
    parity covers the inference-time BN math."""
    randomize_(module, seed=seed, scale=scale)
    g = torch.Generator().manual_seed(seed + 1000)
    with torch.no_grad():
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * scale)
            elif name.endswith("running_var"):
                buf.copy_(1.0 + torch.rand(buf.shape, generator=g) * 0.5)


def prefixed_sd(module, prefix):
    return {f"{prefix}{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


# ------------------------------------------------------------------ SECOND
def test_second_backbone_parity():
    second_mod = mm_stubs.load_ref("mmdet3d/models/backbones/second.py",
                                   "ref_second_backbone")
    ref = second_mod.SECOND(
        in_channels=16, out_channels=[16, 32], layer_nums=[2, 2],
        layer_strides=[1, 2],
    )
    randomize_with_buffers_(ref, seed=3)
    ref.eval()

    x = torch.randn(1, 16, 16, 16, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        outs_ref = ref(x)

    from mobi_tpu.models.bevfusion import SECONDBackbone

    params = import_second(prefixed_sd(ref, "decoder.backbone."),
                           "decoder.backbone.", layer_nums=(2, 2))
    ours = SECONDBackbone(out_channels=(16, 32), layer_nums=(2, 2),
                          layer_strides=(1, 2))
    outs = ours.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))

    assert len(outs) == len(outs_ref) == 2
    for o, r in zip(outs, outs_ref):
        err = max_err(o, nchw_to_nhwc(r))
        assert err < 1e-4, f"SECOND backbone max-err {err}"


def test_second_fpn_parity():
    neck_mod = mm_stubs.load_ref("mmdet3d/models/necks/second.py",
                                 "ref_second_fpn")
    ref = neck_mod.SECONDFPN(
        in_channels=[16, 32], out_channels=[24, 24], upsample_strides=[1, 2],
        use_conv_for_no_stride=True,
    )
    randomize_with_buffers_(ref, seed=5)
    ref.eval()

    g = torch.Generator().manual_seed(1)
    xs = [torch.randn(1, 16, 16, 16, generator=g),
          torch.randn(1, 32, 8, 8, generator=g)]
    with torch.no_grad():
        out_ref = ref(xs)[0]

    from mobi_tpu.models.bevfusion import SECONDFPN

    params = import_second_fpn(prefixed_sd(ref, "decoder.neck."),
                               "decoder.neck.", upsample_strides=(1, 2))
    ours = SECONDFPN(out_channels=(24, 24), upsample_strides=(1, 2))
    out = ours.apply(
        {"params": params}, [jnp.asarray(nchw_to_nhwc(x)) for x in xs]
    )
    err = max_err(out, nchw_to_nhwc(out_ref))
    assert err < 1e-4, f"SECONDFPN max-err {err}"


def test_conv_fuser_parity():
    fuser_mod = mm_stubs.load_ref("mmdet3d/models/fusers/conv.py", "ref_fuser")
    lidar_c, lidar_d = 6, 2
    ref = fuser_mod.ConvFuser(in_channels=[8, lidar_c * lidar_d],
                              out_channels=16)
    randomize_with_buffers_(ref, seed=7)
    ref.eval()

    g = torch.Generator().manual_seed(2)
    cam = torch.randn(1, 8, 12, 12, generator=g)
    lidar_cd = torch.randn(1, lidar_c * lidar_d, 12, 12, generator=g)
    with torch.no_grad():
        out_ref = ref([cam, lidar_cd])

    from mobi_tpu.models.bevfusion import ConvFuser

    params = import_fuser(prefixed_sd(ref, "fuser."), "fuser.",
                          camera_channels=8, lidar_c=lidar_c, lidar_d=lidar_d)
    # our lidar BEV channels are z-major: ours[z*C + c] == torch[c*D + z]
    idx = np.arange(lidar_c * lidar_d)
    perm = (idx % lidar_c) * lidar_d + idx // lidar_c
    lidar_ours = nchw_to_nhwc(lidar_cd)[..., perm]
    out = ConvFuser(out_channels=16).apply(
        {"params": params},
        [jnp.asarray(nchw_to_nhwc(cam)), jnp.asarray(lidar_ours)],
    )
    err = max_err(out, nchw_to_nhwc(out_ref))
    assert err < 1e-4, f"ConvFuser max-err {err}"


# ------------------------------------------------------------- bbox coder
def test_transfusion_bbox_coder_golden():
    import sys
    import types

    if "mmdet.core.bbox" not in sys.modules:
        mm_stubs.install()
        bbox = types.ModuleType("mmdet.core.bbox")
        bbox.BaseBBoxCoder = object
        builder = types.ModuleType("mmdet.core.bbox.builder")
        builder.BBOX_CODERS = mm_stubs._registry()
        bbox.builder = builder
        sys.modules["mmdet.core.bbox"] = bbox
        sys.modules["mmdet.core.bbox.builder"] = builder
    coder_mod = mm_stubs.load_ref(
        "mmdet3d/core/bbox/coders/transfusion_bbox_coder.py", "ref_coder"
    )
    coder = coder_mod.TransFusionBBoxCoder(
        pc_range=[-54.0, -54.0], out_size_factor=8, voxel_size=[0.075, 0.075],
        post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        score_threshold=0.0, code_size=10,
    )

    B, P, C = 2, 16, 10
    g = torch.Generator().manual_seed(9)
    heat = torch.rand(B, C, P, generator=g)
    rot = torch.randn(B, 2, P, generator=g)
    dim = torch.randn(B, 3, P, generator=g) * 0.3
    center = torch.rand(B, 2, P, generator=g) * 180.0
    height = torch.randn(B, 1, P, generator=g)
    vel = torch.randn(B, 2, P, generator=g)
    ref_out = coder.decode(heat.clone(), rot.clone(), dim.clone(),
                           center.clone(), height.clone(), vel.clone())

    from mobi_tpu.models.bevfusion import TransFusionHeadTPU

    head = TransFusionHeadTPU()
    # arrange preds so our fused score equals the raw heatmap the coder gets:
    # query_labels = argmax class, query_heatmap_score 1 at that class,
    # sigmoid(pred_heat) == heat
    labels = heat.argmax(1)  # [B, P]
    logits = torch.logit(heat.clamp(1e-6, 1 - 1e-6))
    preds = {
        "heatmap": jnp.asarray(logits.permute(0, 2, 1).numpy()),
        "query_heatmap_score": jnp.asarray(
            torch.ones(B, P, C).numpy()
        ),
        "query_labels": jnp.asarray(labels.numpy()),
        "center": jnp.asarray(center.permute(0, 2, 1).numpy()),
        "height": jnp.asarray(height.permute(0, 2, 1).numpy()),
        "dim": jnp.asarray(dim.permute(0, 2, 1).numpy()),
        "rot": jnp.asarray(rot.permute(0, 2, 1).numpy()),
        "vel": jnp.asarray(vel.permute(0, 2, 1).numpy()),
    }
    out = head.decode_boxes(preds)
    for b in range(B):
        # our fused score at the argmax class equals the coder's max IF the
        # max class per proposal matches (one-hot restricts to query label)
        np.testing.assert_array_equal(
            np.asarray(out["labels"][b]), ref_out[b]["labels"].numpy()
        )
        err_s = max_err(out["scores"][b], ref_out[b]["scores"].numpy())
        err_b = max_err(out["bboxes"][b], ref_out[b]["bboxes"].numpy())
        assert err_s < 1e-5, f"coder scores max-err {err_s}"
        assert err_b < 1e-4, f"coder boxes max-err {err_b}"


# ------------------------------------------------------- decoder layer / FFN
def test_transfusion_decoder_and_ffn_parity():
    """Vendored models/utils/transformer.py TransformerDecoderLayer +
    PositionEmbeddingLearned + FFN vs our _DecoderLayer/_PredictionFFN via
    the importer's head mapping."""
    tr = mm_stubs.load_ref("mmdet3d/models/utils/transformer.py", "ref_tf")
    C, P, PK, B, H = 32, 12, 40, 2, 4
    dec = tr.TransformerDecoderLayer(
        C, H, dim_feedforward=64, dropout=0.0,
        self_posembed=tr.PositionEmbeddingLearned(2, C),
        cross_posembed=tr.PositionEmbeddingLearned(2, C),
    )
    heads = dict(center=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2),
                 vel=(2, 2), heatmap=(10, 2))
    ffn = tr.FFN(C, heads, head_conv=16)
    randomize_with_buffers_(dec, seed=13)
    randomize_with_buffers_(ffn, seed=14)
    dec.eval(); ffn.eval()

    g = torch.Generator().manual_seed(4)
    query = torch.randn(B, C, P, generator=g)
    key = torch.randn(B, C, PK, generator=g)
    qpos = torch.rand(B, P, 2, generator=g) * 10
    kpos = torch.rand(B, PK, 2, generator=g) * 10
    with torch.no_grad():
        q_ref = dec(query, key, qpos, kpos)         # [B, C, P]
        ffn_ref = {k: v for k, v in ffn(q_ref).items()}

    sd = {}
    sd.update(prefixed_sd(dec, "heads.object.decoder.0."))
    sd.update(prefixed_sd(ffn, "heads.object.prediction_heads.0."))
    # minimal extra layers the importer requires
    extra = torch.nn.ModuleDict({
        "shared_conv": torch.nn.Conv2d(8, C, 3, padding=1),
        "heatmap1": torch.nn.Conv2d(C, 10, 3, padding=1),
        "class_encoding": torch.nn.Conv1d(10, C, 1),
    })
    hm0 = mm_stubs.sys.modules["mmcv.cnn"].ConvModule(
        C, C, 3, padding=1, norm_cfg={"type": "BN2d"})
    sd.update(prefixed_sd(extra["shared_conv"], "heads.object.shared_conv."))
    sd.update(prefixed_sd(hm0, "heads.object.heatmap_head.0."))
    sd.update(prefixed_sd(extra["heatmap1"], "heads.object.heatmap_head.1."))
    sd.update(prefixed_sd(extra["class_encoding"], "heads.object.class_encoding."))

    params = import_transfusion_head(sd, "heads.object.")

    from mobi_tpu.models.bevfusion import _DecoderLayer, _PredictionFFN

    ours_dec = _DecoderLayer(C, H, 64)
    q_out = ours_dec.apply(
        {"params": params["decoder0"]},
        jnp.asarray(query.permute(0, 2, 1).numpy()),
        jnp.asarray(key.permute(0, 2, 1).numpy()),
        jnp.asarray(qpos.numpy()), jnp.asarray(kpos.numpy()),
    )
    err = max_err(q_out, q_ref.permute(0, 2, 1).numpy())
    # softmax-attention + 3 layernorms in fp32: observed noise ~1.4e-4
    assert err < 5e-4, f"decoder layer max-err {err}"

    ours_ffn = _PredictionFFN(10, head_conv=16)
    out = ours_ffn.apply({"params": params["pred0"]}, q_out)
    for name in ("center", "height", "dim", "rot", "vel", "heatmap"):
        err = max_err(out[name], ffn_ref[name].permute(0, 2, 1).numpy())
        assert err < 1e-3, f"FFN {name} max-err {err}"


# ------------------------------------------------------------- DepthLSS
def test_depth_lss_parity():
    """Full camera->BEV view transform vs the vendored DepthLSSTransform
    (depth_lss.py + base.py with a torch bev_pool oracle)."""
    dl = mm_stubs.load_vtransforms()

    iH, iW = 32, 88
    fH, fW = 4, 11
    N, Cin, Cout = 2, 16, 8
    ref = dl.DepthLSSTransform(
        in_channels=Cin, out_channels=Cout, image_size=(iH, iW),
        feature_size=(fH, fW), xbound=(-8.0, 8.0, 0.8),
        ybound=(-8.0, 8.0, 0.8), zbound=(-10.0, 10.0, 20.0),
        dbound=(1.0, 9.0, 0.5), downsample=2,
    )
    geo = {k: ref.state_dict()[k].clone()
           for k in ("dx", "bx", "nx", "frustum")}
    randomize_with_buffers_(ref, seed=21)
    with torch.no_grad():  # restore the geometry buffers randomize_ clobbered
        for k, v in geo.items():
            ref.state_dict()[k].copy_(v)
    ref.eval()

    g = torch.Generator().manual_seed(6)
    feats = torch.randn(1, N, Cin, fH, fW, generator=g)
    pts = torch.randn(600, 5, generator=g) * 4.0

    # simple camera geometry: cameras at +-30deg yaw, 1m up
    import math
    c2l = torch.zeros(1, N, 4, 4)
    intr = torch.zeros(1, N, 4, 4)
    for i in range(N):
        a = math.radians(-30 + 60 * i)
        fwd = torch.tensor([math.cos(a), math.sin(a), 0.0])
        right = torch.tensor([math.sin(a), -math.cos(a), 0.0])
        down = torch.tensor([0.0, 0.0, -1.0])
        R = torch.stack([right, down, fwd], dim=1)  # cam axes in lidar frame
        c2l[0, i, :3, :3] = R
        c2l[0, i, :3, 3] = torch.tensor([0.0, 0.0, 1.0])
        c2l[0, i, 3, 3] = 1.0
        intr[0, i] = torch.eye(4)
        intr[0, i, 0, 0] = intr[0, i, 1, 1] = 40.0
        intr[0, i, 0, 2] = iW / 2
        intr[0, i, 1, 2] = iH / 2
    l2c = torch.inverse(c2l)
    l2i = intr @ l2c
    eye = torch.eye(4).expand(1, N, 4, 4).contiguous()

    with torch.no_grad():
        out_ref = ref(
            feats, [pts], eye, eye, l2c, l2i, intr, c2l, eye,
            torch.eye(4)[None], None,
        )  # [1, Cout*Z, X, Y]

    from mobi_tpu.models.bevfusion import (
        DepthLSSTransformTPU,
        build_sparse_depth_map,
    )

    params = import_depth_lss(prefixed_sd(ref, "vt."), "vt.")
    ours = DepthLSSTransformTPU(
        in_channels=Cin, out_channels=Cout, image_size=(iH, iW),
        feature_size=(fH, fW), xbound=(-8.0, 8.0, 0.8),
        ybound=(-8.0, 8.0, 0.8), zbound=(-10.0, 10.0, 20.0),
        dbound=(1.0, 9.0, 0.5), downsample=2,
    )
    depth_map = build_sparse_depth_map(
        pts.numpy(), l2i[0].numpy(), (iH, iW)
    )
    out = ours.apply(
        {"params": params},
        jnp.asarray(feats[0].permute(0, 2, 3, 1).numpy()),
        jnp.asarray(depth_map),
        jnp.asarray(c2l[0].numpy()),
        jnp.asarray(intr[0, :, :3, :3].numpy()),
    )
    err = max_err(out, nchw_to_nhwc(out_ref))
    assert err < 1e-3, f"DepthLSS max-err {err}"


# ------------------------------------------------------------------ Swin
class _RefWindowMSA(torch.nn.Module):
    """mmdet swin WindowMSA semantics: fused qkv, relative position bias
    gathered through the double-step-seq + flip index buffer (the layout the
    released Swin-T checkpoints were trained with)."""

    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.scale = (dim // heads) ** -0.5
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads)
        )

        def double_step_seq(step1, len1, step2, len2):
            seq1 = torch.arange(0, step1 * len1, step1)
            seq2 = torch.arange(0, step2 * len2, step2)
            return (seq1[:, None] + seq2[None, :]).reshape(1, -1)

        rel_index_coords = double_step_seq(2 * window - 1, window, 1, window)
        rel_position_index = rel_index_coords + rel_index_coords.T
        rel_position_index = rel_position_index.flip(1)
        self.register_buffer("relative_position_index", rel_position_index)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B_, N, 3, self.heads, C // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask.unsqueeze(
                1
            ).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class _RefSwinBlock(torch.nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = torch.nn.ModuleDict({"w_msa": _RefWindowMSA(dim, heads, window)})
        self.norm2 = torch.nn.LayerNorm(dim)
        self.ffn = torch.nn.ModuleDict()
        # mmcv FFN state-dict layout: ffn.layers.0.0 / ffn.layers.1
        self.ffn["layers"] = torch.nn.ModuleList(
            [torch.nn.ModuleList([torch.nn.Linear(dim, dim * 4)]),
             torch.nn.Linear(dim * 4, dim)]
        )

    def forward(self, x):
        import torch.nn.functional as F

        B, H, W, C = x.shape
        w, shift = self.window, self.shift
        shortcut = x
        x = self.norm1(x)
        pad_h = (w - H % w) % w
        pad_w = (w - W % w) % w
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        if shift > 0:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img_mask = torch.zeros((1, Hp, Wp, 1))
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img_mask.view(1, Hp // w, w, Wp // w, w, 1).permute(
                0, 1, 3, 2, 4, 5
            ).reshape(-1, w * w)
            mask = (mw.unsqueeze(1) - mw.unsqueeze(2)) != 0
            mask = mask.float() * -100.0
        else:
            mask = None
        windows = x.view(B, Hp // w, w, Wp // w, w, C).permute(
            0, 1, 3, 2, 4, 5
        ).reshape(-1, w * w, C)
        windows = self.attn["w_msa"](windows, mask)
        x = windows.view(B, Hp // w, Wp // w, w, w, C).permute(
            0, 1, 3, 2, 4, 5
        ).reshape(B, Hp, Wp, C)
        if shift > 0:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x
        y = self.norm2(x)
        y = self.ffn["layers"][0][0](y)
        y = torch.nn.functional.gelu(y)
        y = self.ffn["layers"][1](y)
        return x + y


class _RefPatchMerging(torch.nn.Module):
    """mmdet PatchMerging: nn.Unfold(k=2, s=2) sampling (channel-major
    (c, kh, kw) flattening), then LayerNorm + Linear reduction."""

    def __init__(self, dim):
        super().__init__()
        self.norm = torch.nn.LayerNorm(4 * dim)
        self.reduction = torch.nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        import torch.nn.functional as F

        B, H, W, C = x.shape
        nchw = x.permute(0, 3, 1, 2)
        nchw = F.pad(nchw, (0, W % 2, 0, H % 2))
        u = F.unfold(nchw, kernel_size=2, stride=2)  # [B, C*4, L]
        u = u.transpose(1, 2)  # [B, L, C*4]
        u = self.reduction(self.norm(u))
        return u.view(B, (H + H % 2) // 2, (W + W % 2) // 2, -1)


class _RefSwin(torch.nn.Module):
    def __init__(self, embed=12, depths=(2, 2), heads=(3, 6), window=4,
                 out_indices=(0, 1)):
        super().__init__()
        self.depths, self.out_indices, self.window = depths, out_indices, window
        self.patch_embed = torch.nn.ModuleDict({
            "projection": torch.nn.Conv2d(3, embed, 4, stride=4),
            "norm": torch.nn.LayerNorm(embed),
        })
        self.stages = torch.nn.ModuleList()
        dim = embed
        for si, (d, h) in enumerate(zip(depths, heads)):
            stage = torch.nn.Module()
            stage.blocks = torch.nn.ModuleList(
                [_RefSwinBlock(dim, h, window, 0 if b % 2 == 0 else window // 2)
                 for b in range(d)]
            )
            if si < len(depths) - 1:
                stage.downsample = _RefPatchMerging(dim)
            self.stages.append(stage)
            dim *= 2
        for i in out_indices:
            self.add_module(f"norm{i}", torch.nn.LayerNorm(embed * (2 ** i)))

    def forward(self, x):
        x = self.patch_embed["projection"](x)
        x = x.permute(0, 2, 3, 1)
        x = self.patch_embed["norm"](x)
        outs = []
        for si, stage in enumerate(self.stages):
            for blk in stage.blocks:
                x = blk(x)
            if si in self.out_indices:
                outs.append(getattr(self, f"norm{si}")(x))
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return outs


def test_swin_parity_vs_mmdet_semantics():
    """SwinTransformerTPU + import_swin vs a torch replica of the mmdet Swin
    (unfold patch-merging, double-step-seq relative-position index, padded
    shifted windows) — feature size 14x14 exercises window padding + masks."""
    ref = _RefSwin(embed=12, depths=(2, 2), heads=(3, 6), window=4,
                   out_indices=(0, 1))
    randomize_(ref, seed=31)
    ref.eval()

    x = torch.randn(1, 3, 56, 56, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        outs_ref = ref(x)

    from mobi_tpu.models.swin import SwinTransformerTPU

    sd = prefixed_sd(ref, "encoders.camera.backbone.")
    params = import_swin(sd, "encoders.camera.backbone.", window=4,
                         depths=(2, 2), out_indices=(0, 1))
    ours = SwinTransformerTPU(embed_dim=12, depths=(2, 2), heads=(3, 6),
                              window=4, out_indices=(0, 1))
    outs = ours.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))

    assert len(outs) == len(outs_ref) == 2
    for i, (o, r) in enumerate(zip(outs, outs_ref)):
        err = max_err(o, r.numpy())
        assert err < 2e-4, f"swin out{i} max-err {err}"


# ----------------------------------------------------------- sparse encoder
def _dense_subm(x, mask, w, bn, relu=True):
    """Dense-torch submanifold conv oracle: outputs only at active sites
    (spconv SubMConv3d semantics). x [1, C, X, Y, Z]; w spconv layout
    (*k, in, out); mask [1, 1, X, Y, Z]."""
    import torch.nn.functional as F

    wt = torch.from_numpy(w).permute(4, 3, 0, 1, 2)
    y = F.conv3d(x, wt, padding=tuple(s // 2 for s in w.shape[:3]))
    y = _bn_affine(y, bn)
    if relu:
        y = torch.relu(y)
    return y * mask


def _dense_spconv(x, mask, w, bn, stride, padding, relu=True):
    """Dense strided SparseConv3d oracle: output site active iff any input
    in its receptive field is active."""
    import torch.nn.functional as F

    wt = torch.from_numpy(w).permute(4, 3, 0, 1, 2)
    y = F.conv3d(x, wt, stride=stride, padding=padding)
    ones = torch.ones(1, 1, *w.shape[:3])
    new_mask = (F.conv3d(mask, ones, stride=stride, padding=padding) > 0).float()
    y = _bn_affine(y, bn)
    if relu:
        y = torch.relu(y)
    return y * new_mask, new_mask


def _bn_affine(y, bn):
    w, b, m, v = (torch.from_numpy(bn[k]) for k in ("w", "b", "m", "v"))
    shape = (1, -1, 1, 1, 1)
    return (y - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-3) * w.view(
        shape
    ) + b.view(shape)


def _rand_sp(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def _rand_bn(rng, c):
    return {
        "w": (rng.standard_normal(c) * 0.2 + 1).astype(np.float32),
        "b": (rng.standard_normal(c) * 0.1).astype(np.float32),
        "m": (rng.standard_normal(c) * 0.1).astype(np.float32),
        "v": (rng.random(c) * 0.5 + 0.7).astype(np.float32),
    }


def test_sparse_encoder_dense_oracle():
    """SparseEncoderTPU + import_sparse_encoder vs a dense torch conv3d
    replica of spconv's SubMConv3d/SparseConv3d semantics, weights fabricated
    in the reference checkpoint layout (spconv (*k, in, out) kernels,
    sparse_encoder.py:11-218 key names)."""
    rng = np.random.default_rng(17)
    X, Y, Z = 32, 32, 25
    n_vox = 80
    coords = np.unique(
        np.stack([rng.integers(0, X, n_vox), rng.integers(0, Y, n_vox),
                  rng.integers(0, Z, n_vox)], 1), axis=0,
    )
    feats = rng.standard_normal((len(coords), 5)).astype(np.float32)

    # fabricate the reference state dict
    P = "encoders.lidar.backbone."
    chans = [(16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)]
    sd = {}
    bns = {}

    def put_convmodule(key, k, cin, cout):
        sd[f"{key}.0.weight"] = _rand_sp(rng, *k, cin, cout)
        bn = _rand_bn(rng, cout)
        bns[key] = bn
        sd[f"{key}.1.weight"] = bn["w"]
        sd[f"{key}.1.bias"] = bn["b"]
        sd[f"{key}.1.running_mean"] = bn["m"]
        sd[f"{key}.1.running_var"] = bn["v"]

    def put_basicblock(key, c):
        for conv, bn_name in (("conv1", "bn1"), ("conv2", "bn2")):
            sd[f"{key}.{conv}.weight"] = _rand_sp(rng, 3, 3, 3, c, c)
            bn = _rand_bn(rng, c)
            bns[f"{key}.{conv}"] = bn
            sd[f"{key}.{bn_name}.weight"] = bn["w"]
            sd[f"{key}.{bn_name}.bias"] = bn["b"]
            sd[f"{key}.{bn_name}.running_mean"] = bn["m"]
            sd[f"{key}.{bn_name}.running_var"] = bn["v"]

    put_convmodule(f"{P}conv_input", (3, 3, 3), 5, 16)
    for i, stage in enumerate(chans):
        base = f"{P}encoder_layers.encoder_layer{i + 1}"
        put_basicblock(f"{base}.0", stage[0])
        put_basicblock(f"{base}.1", stage[0])
        if len(stage) == 3:
            put_convmodule(f"{base}.2", (3, 3, 3), stage[0], stage[2])
    put_convmodule(f"{P}conv_out", (1, 1, 3), 128, 128)

    # ---- dense torch oracle
    x = torch.zeros(1, 5, X, Y, Z)
    mask = torch.zeros(1, 1, X, Y, Z)
    for (cx, cy, cz), f in zip(coords, feats):
        x[0, :, cx, cy, cz] = torch.from_numpy(f)
        mask[0, 0, cx, cy, cz] = 1.0

    def convmodule_key(i=None):
        return (f"{P}conv_input" if i is None
                else f"{P}encoder_layers.encoder_layer{i + 1}.2")

    h = _dense_subm(x, mask, sd[f"{P}conv_input.0.weight"], bns[f"{P}conv_input"])
    pads = [(1, 1, 1), (1, 1, 1), (1, 1, 0), None]
    for i, stage in enumerate(chans):
        base = f"{P}encoder_layers.encoder_layer{i + 1}"
        for j in range(2):
            res = h
            h = _dense_subm(h, mask, sd[f"{base}.{j}.conv1.weight"],
                            bns[f"{base}.{j}.conv1"])
            h = _dense_subm(h, mask, sd[f"{base}.{j}.conv2.weight"],
                            bns[f"{base}.{j}.conv2"], relu=False)
            h = torch.relu(h + res) * mask
        if len(stage) == 3:
            h, mask = _dense_spconv(
                h, mask, sd[f"{base}.2.0.weight"], bns[f"{base}.2"],
                stride=2, padding=pads[i],
            )
    h, mask = _dense_spconv(h, mask, sd[f"{P}conv_out.0.weight"],
                            bns[f"{P}conv_out"], stride=(1, 1, 2),
                            padding=0)
    # [1, C, X', Y', Z'] -> ours' z-major dense BEV [1, X', Y', Z'*C]
    ref_bev = h.permute(0, 2, 3, 4, 1).reshape(1, h.shape[2], h.shape[3], -1)

    # ---- ours
    from mobi_tpu.import_bevfusion import import_sparse_encoder
    from mobi_tpu.models.bevfusion import SparseEncoderTPU, plan_sparse_encoder

    params = import_sparse_encoder(sd, P)
    plans, out_coords, out_shape = plan_sparse_encoder(coords, (X, Y, Z))
    enc = SparseEncoderTPU()
    out = enc.apply(
        {"params": params}, jnp.asarray(feats), plans, out_coords, out_shape
    )
    assert out.shape == tuple(ref_bev.shape), (out.shape, ref_bev.shape)
    # the random BN stats don't actually normalize, so activations (and
    # fp32 noise) grow geometrically over the 14 layers — compare RELATIVE
    # to the output scale (bisect showed per-layer parity at 1e-7)
    ref_np = ref_bev.numpy()
    err = max_err(out, ref_np) / max(np.abs(ref_np).max(), 1.0)
    assert err < 1e-5, f"sparse encoder dense-oracle rel-err {err}"


# ----------------------------------------------------- results.json writer
def test_detections_to_nusc_results_global_frame():
    """Lidar->global conversion of decoded boxes (nuscenes_dataset.py:630-700
    semantics): rotation composition, size order, velocity rotation, and the
    SECOND-yaw unconversion."""
    from mobi_tpu.data.nuscenes_tables import quat_to_rot
    from mobi_tpu.detector_inference import detections_to_nusc_results

    yaw_l2g = 0.7
    c, s = np.cos(yaw_l2g), np.sin(yaw_l2g)
    l2g = np.eye(4)
    l2g[:2, :2] = [[c, -s], [s, c]]
    l2g[:3, 3] = [10.0, -5.0, 1.0]

    yaw_second = 0.3
    decoded = {
        "bboxes": np.array(
            [[4.0, 2.0, -1.0, 1.9, 4.5, 1.6, yaw_second, 3.0, 0.0]]
        ),
        "scores": np.array([0.9]),
        "labels": np.array([0]),  # car
        "keep": np.array([True]),
    }
    out = detections_to_nusc_results(decoded, "tok", l2g,
                                     box_convention="second")
    assert len(out) == 1
    r = out[0]
    want_center = l2g[:3, :3] @ np.array([4.0, 2.0, -1.0 + 0.8]) + l2g[:3, 3]
    np.testing.assert_allclose(r["translation"], want_center, atol=1e-9)
    assert r["size"] == [1.9, 4.5, 1.6]  # (w, l, h) passthrough for second
    # global yaw from the submitted quaternion == l2g yaw + (-yaw_second-pi/2)
    R = quat_to_rot(r["rotation"])
    got_yaw = np.arctan2(R[1, 0], R[0, 0])
    want_yaw = yaw_l2g + (-yaw_second - np.pi / 2)
    np.testing.assert_allclose(
        np.angle(np.exp(1j * (got_yaw - want_yaw))), 0.0, atol=1e-9
    )
    np.testing.assert_allclose(
        r["velocity"], l2g[:2, :2] @ np.array([3.0, 0.0]), atol=1e-9
    )
    assert r["detection_name"] == "car"
    assert r["attribute_name"] == "vehicle.moving"  # speed > 0.2


# ----------------------------------------------------- GeneralizedLSSFPN
def test_generalized_lss_fpn_parity():
    """Camera neck vs the reference's vendored GeneralizedLSSFPN
    (necks/generalized_lss.py:13-104): top-down align_corners=True bilinear
    upsample -> concat -> 1x1 ConvModule -> 3x3 ConvModule, through
    import_lss_fpn. Non-integer scale (2x6 -> 4x11) pins the upsample
    semantics."""
    from mobi_tpu.models.swin import GeneralizedLSSFPN

    lss_mod = mm_stubs.load_ref("mmdet3d/models/necks/generalized_lss.py",
                                "ref_generalized_lss")
    ref = lss_mod.GeneralizedLSSFPN(
        in_channels=[16, 32, 64], out_channels=24, num_outs=2,
    )
    randomize_with_buffers_(ref, seed=17)
    ref.eval()

    g = torch.Generator().manual_seed(18)
    xs = [torch.randn(2, c, h, w, generator=g)
          for c, (h, w) in zip((16, 32, 64), ((8, 22), (4, 11), (2, 6)))]
    with torch.no_grad():
        outs_ref = ref(xs)

    params = import_lss_fpn(prefixed_sd(ref, ""), "", num_levels=2)
    net = GeneralizedLSSFPN(out_channels=24)
    outs = net.apply({"params": params}, [nchw_to_nhwc(x) for x in xs])

    assert len(outs) == len(outs_ref) == 2
    for o, r in zip(outs, outs_ref):
        err = max_err(o, nchw_to_nhwc(r))
        assert err < 1e-4, f"FPN parity max-err {err}"
