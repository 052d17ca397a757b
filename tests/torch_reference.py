"""Independent torch reimplementation of the reference Meta-FCOS graph.

Built from the reference's structure (sylph/modeling/meta_fcos/fcos.py:382-667,
meta_arch/meta_one_stage_detector.py:174-323, code_generator.py:924-1002,
detectron2 R-50+FPN semantics) for full-model golden parity tests: weights
are generated under detectron2 state-dict names, the torch forward is
computed layer by layer from the state dict, and the flax model must
reproduce it after checkpoint conversion.

All forwards are fp32, NCHW. No torchvision dependency: ROIAlign uses the
numpy oracle from test_ops (adaptive sampling_ratio=0 grids).
"""

import numpy as np
import torch
import torch.nn.functional as F

R50_STAGES = (3, 4, 6, 3)
R50_MID = (64, 128, 256, 512)
R50_OUT = (256, 512, 1024, 2048)
PIXEL_MEAN = np.array([103.530, 116.280, 123.675], np.float32)


# ------------------------------------------------------------ weight gen
def _conv_w(rng, o, i, k):
    std = 1.0 / np.sqrt(i * k * k)
    return (rng.randn(o, i, k, k) * std).astype(np.float32)


def _bn_stats(rng, c):
    return {
        "weight": (1.0 + 0.1 * rng.randn(c)).astype(np.float32),
        "bias": (0.1 * rng.randn(c)).astype(np.float32),
        "running_mean": (0.1 * rng.randn(c)).astype(np.float32),
        "running_var": (0.8 + 0.4 * rng.rand(c)).astype(np.float32),
    }


def make_meta_fcos_sd(rng, num_classes=80, tower_convs=4,
                      codegen_tower_layers=2):
    """Random reference-named state dict for R-50 + FPN + MetaFCOSHead +
    CodeGenerator."""
    sd = {}
    bb = "backbone.bottom_up"
    sd[f"{bb}.stem.conv1.weight"] = _conv_w(rng, 64, 3, 7)
    for k, v in _bn_stats(rng, 64).items():
        sd[f"{bb}.stem.conv1.norm.{k}"] = v

    cin = 64
    for si, (n, mid, out) in enumerate(zip(R50_STAGES, R50_MID, R50_OUT)):
        stage = f"res{si + 2}"
        for b in range(n):
            base = f"{bb}.{stage}.{b}"
            specs = {"conv1": (cin if b == 0 else out, mid, 1),
                     "conv2": (mid, mid, 3), "conv3": (mid, out, 1)}
            if b == 0:
                specs["shortcut"] = (cin, out, 1)
            for name, (i, o, k) in specs.items():
                sd[f"{base}.{name}.weight"] = _conv_w(rng, o, i, k)
                for kk, vv in _bn_stats(rng, o).items():
                    sd[f"{base}.{name}.norm.{kk}"] = vv
        cin = out

    # FPN
    for lvl, c in ((3, 512), (4, 1024), (5, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = _conv_w(rng, 256, c, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = \
            (0.1 * rng.randn(256)).astype(np.float32)
        sd[f"backbone.fpn_output{lvl}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = \
            (0.1 * rng.randn(256)).astype(np.float32)
    for p in (6, 7):
        sd[f"backbone.top_block.p{p}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"backbone.top_block.p{p}.bias"] = \
            (0.1 * rng.randn(256)).astype(np.float32)

    # FCOS head
    head = "proposal_generator.fcos_head"
    for tower in ("cls_tower", "bbox_tower"):
        for i in range(tower_convs):
            sd[f"{head}.{tower}.{3*i}.weight"] = _conv_w(rng, 256, 256, 3)
            sd[f"{head}.{tower}.{3*i}.bias"] = \
                (0.1 * rng.randn(256)).astype(np.float32)
            sd[f"{head}.{tower}.{3*i+1}.weight"] = \
                (1.0 + 0.1 * rng.randn(256)).astype(np.float32)
            sd[f"{head}.{tower}.{3*i+1}.bias"] = \
                (0.1 * rng.randn(256)).astype(np.float32)
    for mod, (o, k) in (("cls_logits", (num_classes, 1)),
                        ("bbox_pred", (4, 3)), ("ctrness", (1, 3)),
                        ("iou_overlap", (1, 3))):
        sd[f"{head}.{mod}.weight"] = _conv_w(rng, o, 256, k)
        sd[f"{head}.{mod}.bias"] = (0.1 * rng.randn(o)).astype(np.float32)
    for i in range(5):
        sd[f"{head}.scales.{i}.scale"] = \
            np.asarray(1.0 + 0.1 * rng.randn(), np.float32)

    # Code generator (tower layout [conv, GN, ReLU] -> conv@3i, gn@3i+1)
    cg = "code_generator.code_generator_head"
    for i in range(codegen_tower_layers):
        sd[f"{cg}.support_set_shared_tower.{3*i}.weight"] = \
            _conv_w(rng, 256, 256, 3)
        sd[f"{cg}.support_set_shared_tower.{3*i}.bias"] = \
            (0.1 * rng.randn(256)).astype(np.float32)
        sd[f"{cg}.support_set_shared_tower.{3*i+1}.weight"] = \
            (1.0 + 0.1 * rng.randn(256)).astype(np.float32)
        sd[f"{cg}.support_set_shared_tower.{3*i+1}.bias"] = \
            (0.1 * rng.randn(256)).astype(np.float32)
    sd[f"{cg}.support_set_cls_conv.0.weight"] = _conv_w(rng, 256, 256, 3)
    sd[f"{cg}.support_set_cls_conv.0.bias"] = \
        (0.1 * rng.randn(256)).astype(np.float32)
    sd[f"{cg}.support_set_cls_bias.0.weight"] = _conv_w(rng, 1, 256, 3)
    sd[f"{cg}.support_set_cls_bias.0.bias"] = \
        (0.1 * rng.randn(1)).astype(np.float32)
    sd[f"{cg}.post_norm.weight"] = \
        (1.0 + 0.1 * rng.randn(256)).astype(np.float32)
    sd[f"{cg}.post_norm.bias"] = (0.1 * rng.randn(256)).astype(np.float32)
    sd[f"{cg}.conv_scale.scale"] = np.asarray(1.2, np.float32)
    sd[f"{cg}.bias_scale.scale"] = np.asarray(0.8, np.float32)
    return sd


# --------------------------------------------------------------- forward
def _t(x):
    return torch.from_numpy(np.asarray(x))


def _frozen_bn(x, sd, prefix, eps=1e-5):
    g = _t(sd[f"{prefix}.weight"])
    b = _t(sd[f"{prefix}.bias"])
    m = _t(sd[f"{prefix}.running_mean"])
    v = _t(sd[f"{prefix}.running_var"])
    scale = g / torch.sqrt(v + eps)
    return x * scale[None, :, None, None] + \
        (b - m * scale)[None, :, None, None]


def _conv(x, sd, prefix, stride=1, bias=True):
    w = _t(sd[f"{prefix}.weight"])
    b = _t(sd[f"{prefix}.bias"]) if bias and f"{prefix}.bias" in sd else None
    return F.conv2d(x, w, b, stride=stride, padding=w.shape[-1] // 2)


def _conv_bn_relu(x, sd, prefix, stride=1, relu=True):
    out = _frozen_bn(_conv(x, sd, prefix, stride, bias=False),
                     sd, f"{prefix}.norm")
    return F.relu(out) if relu else out


def torch_backbone_fpn(sd, images_bgr_hwc):
    """images (B,H,W,3) float32 BGR, unnormalized -> [P3..P7] NCHW."""
    x = _t(np.transpose(images_bgr_hwc - PIXEL_MEAN, (0, 3, 1, 2)))
    bb = "backbone.bottom_up"
    x = _conv_bn_relu(x, sd, f"{bb}.stem.conv1", stride=2)
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    feats = {}
    for si, n in enumerate(R50_STAGES):
        stage = f"res{si + 2}"
        stride = 1 if si == 0 else 2
        for b in range(n):
            base = f"{bb}.{stage}.{b}"
            out = _conv_bn_relu(x, sd, f"{base}.conv1",
                                stride=stride if b == 0 else 1)
            out = _conv_bn_relu(out, sd, f"{base}.conv2")
            out = _conv_bn_relu(out, sd, f"{base}.conv3", relu=False)
            if b == 0:
                sc = _conv_bn_relu(x, sd, f"{base}.shortcut", stride=stride,
                                   relu=False)
            else:
                sc = x
            x = F.relu(out + sc)
        feats[stage] = x

    laterals = [_conv(feats[f"res{l}"], sd, f"backbone.fpn_lateral{l}")
                for l in (3, 4, 5)]
    merged = [laterals[2]]
    for lat in laterals[1::-1]:
        merged.append(lat + F.interpolate(merged[-1], scale_factor=2,
                                          mode="nearest"))
    merged = merged[::-1]
    outs = [_conv(m, sd, f"backbone.fpn_output{l}")
            for l, m in zip((3, 4, 5), merged)]
    p6 = _conv(outs[-1], sd, "backbone.top_block.p6", stride=2)
    p7 = _conv(F.relu(p6), sd, "backbone.top_block.p7", stride=2)
    return outs + [p6, p7]


def _gn(x, sd, w_key, b_key, groups=32, eps=1e-5):
    return F.group_norm(x, groups, _t(sd[w_key]), _t(sd[b_key]), eps)


def _tower(x, sd, prefix, n=4):
    for i in range(n):
        x = _conv(x, sd, f"{prefix}.{3*i}")
        x = _gn(x, sd, f"{prefix}.{3*i+1}.weight", f"{prefix}.{3*i+1}.bias")
        x = F.relu(x)
    return x


def torch_fcos_head(sd, fpn_feats, class_code=None, tower_convs=4):
    """Dense head over 5 levels (reference fcos.py:382-667 MetaFCOSHead).

    Returns flattened level-major (B,K,C) logits, (B,K,4) reg (post
    relu(scale*conv), stride-normalized), (B,K) ctrness, (B,K) iou.
    """
    head = "proposal_generator.fcos_head"
    logits_l, reg_l, ctr_l, iou_l = [], [], [], []
    for li, f in enumerate(fpn_feats):
        ct = _tower(f, sd, f"{head}.cls_tower", tower_convs)
        bt = _tower(f, sd, f"{head}.bbox_tower", tower_convs)
        if class_code is not None:
            w = _t(class_code["cls_conv"])          # (N, 256)
            b = _t(class_code["cls_bias"])          # (N,)
            logit = torch.einsum("bchw,nc->bnhw", ct, w) \
                + b[None, :, None, None]
        else:
            logit = _conv(ct, sd, f"{head}.cls_logits")
        reg = _conv(bt, sd, f"{head}.bbox_pred")
        reg = reg * float(sd[f"{head}.scales.{li}.scale"])
        reg = F.relu(reg)
        ctr = _conv(bt, sd, f"{head}.ctrness")
        iou = _conv(bt, sd, f"{head}.iou_overlap")

        bsz = f.shape[0]
        logits_l.append(logit.reshape(bsz, logit.shape[1], -1)
                        .permute(0, 2, 1))
        reg_l.append(reg.reshape(bsz, 4, -1).permute(0, 2, 1))
        ctr_l.append(ctr.reshape(bsz, -1))
        iou_l.append(iou.reshape(bsz, -1))
    return (torch.cat(logits_l, 1).numpy(), torch.cat(reg_l, 1).numpy(),
            torch.cat(ctr_l, 1).numpy(), torch.cat(iou_l, 1).numpy())


def torch_code_generator(sd, fpn_feats, boxes, num_shots,
                         np_roi_align, strides=(8, 16, 32, 64, 128),
                         pooler_resolution=7, tower_layers=2,
                         prior_prob=0.01, normalize=True):
    """CodeGenerator forward (reference code_generator.py:924-1002):
    multilevel ROIAlignV2(sr=0) -> shared tower -> cls_conv/cls_bias heads
    with global avg pool -> k-shot mean -> post-norm GN + L2 + conv_scale,
    bias = prior + bias_scale * pred."""
    cg = "code_generator.code_generator_head"
    s = len(boxes)
    # detectron2 ROIPooler level assignment (same formula as
    # sylph_tpu.ops.roi_align.multilevel_roi_align)
    pooled = []
    for bi in range(s):
        x1, y1, x2, y2 = boxes[bi]
        area = max((x2 - x1) * (y2 - y1), 1e-6)
        lvl = int(np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)),
                          3, 7))
        li = lvl - 3
        feat = fpn_feats[li][bi].numpy().transpose(1, 2, 0)  # HWC
        pooled.append(np_roi_align(
            feat, boxes[bi:bi + 1], 1.0 / strides[li], pooler_resolution, 0)[0])
    x = _t(np.stack(pooled).transpose(0, 3, 1, 2))  # (S, 256, P, P)

    for i in range(tower_layers):
        x = _conv(x, sd, f"{cg}.support_set_shared_tower.{3*i}")
        x = _gn(x, sd, f"{cg}.support_set_shared_tower.{3*i+1}.weight",
                f"{cg}.support_set_shared_tower.{3*i+1}.bias")
        x = F.relu(x)

    conv_feat = _conv(x, sd, f"{cg}.support_set_cls_conv.0") \
        .mean(dim=(2, 3))                       # (S, 256)
    bias_feat = _conv(x, sd, f"{cg}.support_set_cls_bias.0") \
        .mean(dim=(2, 3)).reshape(-1)           # (S,)

    w = conv_feat.reshape(-1, num_shots, 256).mean(1)        # (N, 256)
    b = bias_feat.reshape(-1, num_shots).mean(1)             # (N,)
    raw = (w.numpy().copy(), b.numpy().copy())
    if not normalize:
        return raw

    wn = F.group_norm(w[:, :, None, None], 32, _t(sd[f"{cg}.post_norm.weight"]),
                      _t(sd[f"{cg}.post_norm.bias"]), 1e-5)[:, :, 0, 0]
    wn = wn / torch.clamp(wn.norm(dim=-1, keepdim=True), min=1e-12)
    wn = wn * float(sd[f"{cg}.conv_scale.scale"])
    prior = -np.log((1 - prior_prob) / prior_prob)
    bn = b * float(sd[f"{cg}.bias_scale.scale"]) + prior
    return {"cls_conv": wn.numpy(), "cls_bias": bn.numpy()}, raw
