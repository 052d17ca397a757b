"""Checkpoint-conversion golden tests.

Independent torch reimplementations of the detectron2 building blocks
(caffe bottleneck with FrozenBN, FCOS tower) generate state dicts under
detectron2 names; after conversion, the flax modules must reproduce the
torch activations — validating name mapping, OIHW→HWIO transposes,
FrozenBN folding, and padding semantics end to end.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from sylph_tpu.models.resnet import Bottleneck, FrozenBatchNorm
from sylph_tpu.utils.convert_weights import (convert_detectron2_checkpoint,
                                             _fold_bn, BN_EPS)


def _rand_bn_stats(rng, c):
    return {
        "weight": rng.randn(c).astype(np.float32),
        "bias": rng.randn(c).astype(np.float32),
        "running_mean": rng.randn(c).astype(np.float32) * 0.1,
        "running_var": rng.rand(c).astype(np.float32) + 0.5,
    }


def _torch_frozen_bn(x, stats):
    scale = torch.from_numpy(
        stats["weight"] / np.sqrt(stats["running_var"] + BN_EPS))
    bias = torch.from_numpy(
        stats["bias"] - stats["running_mean"] * scale.numpy())
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def test_bottleneck_matches_torch_reference():
    rng = np.random.RandomState(0)
    cin, cmid, cout, stride = 8, 4, 16, 2

    sd = {}
    convs = {}
    for name, (i, o, k, s) in {
        "conv1": (cin, cmid, 1, stride), "conv2": (cmid, cmid, 3, 1),
        "conv3": (cmid, cout, 1, 1), "shortcut": (cin, cout, 1, stride),
    }.items():
        w = (rng.randn(o, i, k, k) * 0.1).astype(np.float32)
        convs[name] = (w, k, s)
        sd[f"backbone.bottom_up.res2.0.{name}.weight"] = w
        for kk, vv in _rand_bn_stats(rng, o).items():
            sd[f"backbone.bottom_up.res2.0.{name}.norm.{kk}"] = vv

    x = rng.randn(1, 10, 12, cin).astype(np.float32)

    # torch reference (caffe bottleneck: stride in conv1)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    def tconv(name, inp):
        w, k, s = convs[name]
        out = F.conv2d(inp, torch.from_numpy(w), stride=s, padding=k // 2)
        stats = {kk: sd[f"backbone.bottom_up.res2.0.{name}.norm.{kk}"]
                 for kk in ("weight", "bias", "running_mean", "running_var")}
        return _torch_frozen_bn(out, stats)

    out = F.relu(tconv("conv1", tx))
    out = F.relu(tconv("conv2", out))
    out = tconv("conv3", out)
    ref = F.relu(out + tconv("shortcut", tx))
    ref = ref.permute(0, 2, 3, 1).numpy()

    # converted flax
    params = convert_detectron2_checkpoint(sd)
    block = Bottleneck(out_channels=cout, bottleneck_channels=cmid,
                       stride=stride, has_shortcut=True)
    got = block.apply({"params": params["backbone"]["res2_block0"]},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_fcos_tower_conversion():
    """4-conv GN tower under detectron2 sequential naming → flax tower."""
    from sylph_tpu.models.fcos_head import _Tower

    rng = np.random.RandomState(1)
    c = 32
    sd = {}
    tower = nn.Sequential()
    layers = []
    for i in range(4):
        conv = nn.Conv2d(c, c, 3, padding=1)
        gn = nn.GroupNorm(32 if c % 32 == 0 else 1, c)
        with torch.no_grad():
            conv.weight.normal_(0, 0.1)
            conv.bias.normal_()
            gn.weight.normal_(1, 0.1)
            gn.bias.normal_(0, 0.1)
        layers += [conv, gn, nn.ReLU()]
        sd[f"proposal_generator.fcos_head.cls_tower.{3*i}.weight"] = \
            conv.weight.detach().numpy()
        sd[f"proposal_generator.fcos_head.cls_tower.{3*i}.bias"] = \
            conv.bias.detach().numpy()
        sd[f"proposal_generator.fcos_head.cls_tower.{3*i+1}.weight"] = \
            gn.weight.detach().numpy()
        sd[f"proposal_generator.fcos_head.cls_tower.{3*i+1}.bias"] = \
            gn.bias.detach().numpy()
    torch_tower = nn.Sequential(*layers)

    x = rng.randn(2, 9, 11, c).astype(np.float32)
    with torch.no_grad():
        ref = torch_tower(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).permute(0, 2, 3, 1).numpy()

    params = convert_detectron2_checkpoint(sd)
    flax_tower = _Tower(num_convs=4, channels=c, norm="GN")
    got = flax_tower.apply({"params": params["fcos_head"]["cls_tower"]},
                           jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_codegen_tower_and_heads_conversion():
    rng = np.random.RandomState(2)
    cg = "code_generator.code_generator_head"
    sd = {}
    # two tower layers [conv,GN,ReLU] -> indices conv@0, gn@1, conv@3, gn@4
    for li, (ci, gi) in enumerate(((0, 1), (3, 4))):
        sd[f"{cg}.support_set_shared_tower.{ci}.weight"] = \
            rng.randn(256, 256, 3, 3).astype(np.float32)
        sd[f"{cg}.support_set_shared_tower.{ci}.bias"] = \
            rng.randn(256).astype(np.float32)
        sd[f"{cg}.support_set_shared_tower.{gi}.weight"] = \
            rng.randn(256).astype(np.float32)
        sd[f"{cg}.support_set_shared_tower.{gi}.bias"] = \
            rng.randn(256).astype(np.float32)
    sd[f"{cg}.support_set_cls_conv.0.weight"] = \
        rng.randn(256, 256, 3, 3).astype(np.float32)
    sd[f"{cg}.support_set_cls_conv.0.bias"] = rng.randn(256).astype(np.float32)
    sd[f"{cg}.post_norm.weight"] = rng.randn(256).astype(np.float32)
    sd[f"{cg}.post_norm.bias"] = rng.randn(256).astype(np.float32)
    sd[f"{cg}.conv_scale.scale"] = np.asarray(1.5, np.float32)
    sd[f"{cg}.bias_scale.scale"] = np.asarray(0.7, np.float32)

    p = convert_detectron2_checkpoint(sd)["code_generator"]
    assert p["tower_conv0"]["kernel"].shape == (3, 3, 256, 256)
    assert p["tower_conv0_gn"]["scale"].shape == (256,)
    assert p["tower_conv1"]["kernel"].shape == (3, 3, 256, 256)
    assert p["cls_conv_head"]["kernel"].shape == (3, 3, 256, 256)
    assert float(p["conv_scale"]["scale"]) == pytest.approx(1.5)
    assert float(p["bias_scale"]["scale"]) == pytest.approx(0.7)


def test_fold_bn_math():
    rng = np.random.RandomState(3)
    stats = _rand_bn_stats(rng, 6)
    sd = {f"pre.{k}": v for k, v in stats.items()}
    scale, bias = _fold_bn("pre", sd)
    x = rng.randn(4, 6).astype(np.float32)
    want = ((x - stats["running_mean"])
            / np.sqrt(stats["running_var"] + BN_EPS)
            * stats["weight"] + stats["bias"])
    np.testing.assert_allclose(x * scale + bias, want, rtol=1e-5, atol=1e-5)


def test_imagenet_pkl_name_scheme():
    """MSRA/detectron2 ImageNet pkls name the backbone WITHOUT the
    'backbone.bottom_up.' prefix; conversion must handle that scheme."""
    rng = np.random.RandomState(0)
    sd = {
        "stem.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "stem.conv1.norm.weight": rng.randn(64).astype(np.float32),
        "stem.conv1.norm.bias": rng.randn(64).astype(np.float32),
        "stem.conv1.norm.running_mean": rng.randn(64).astype(np.float32),
        "stem.conv1.norm.running_var":
            rng.rand(64).astype(np.float32) + 0.5,
        "res2.0.conv1.weight": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2.0.conv1.norm.weight": rng.randn(64).astype(np.float32),
        "res2.0.conv1.norm.bias": rng.randn(64).astype(np.float32),
        "res2.0.conv1.norm.running_mean": rng.randn(64).astype(np.float32),
        "res2.0.conv1.norm.running_var":
            rng.rand(64).astype(np.float32) + 0.5,
    }
    params = convert_detectron2_checkpoint(sd)
    assert "stem_conv1" in params["backbone"]
    assert params["backbone"]["stem_conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "res2_block0" in params["backbone"]


def test_convert_raises_on_unknown_backbone_scheme():
    """A state dict with backbone-like keys that match no known scheme
    must fail loud, not silently keep the random init."""
    import pytest
    sd = {"module.backbone.body.res2.0.conv1.weight":
          np.zeros((64, 64, 1, 1), np.float32)}
    with pytest.raises(ValueError, match="name schemes"):
        convert_detectron2_checkpoint(sd)


def test_conversion_report_flags_misnamed_keys():
    """The per-family audit must surface keys the converter did not map
    (they would silently stay at random init) and classify ignorable
    bookkeeping keys separately (VERDICT r2 next #7)."""
    rng = np.random.RandomState(0)
    head = "proposal_generator.fcos_head"
    sd = {
        f"{head}.cls_logits.weight": rng.randn(4, 8, 3, 3).astype(np.float32),
        f"{head}.cls_logits.bias": rng.randn(4).astype(np.float32),
        # deliberately misnamed (typo'd tower): must be reported unmatched
        f"{head}.cls_towerr.0.weight": rng.randn(8, 8, 3, 3).astype(np.float32),
        # bookkeeping: ignorable, never "unmatched"
        "pixel_mean": np.zeros(3, np.float32),
        f"{head}.cls_tower.0.num_batches_tracked": np.zeros((), np.int64),
    }
    report = {}
    convert_detectron2_checkpoint(sd, report=report)
    assert f"{head}.cls_towerr.0.weight" in report["unmatched"]
    assert "pixel_mean" in report["ignored"]
    fam = report["by_family"]["fcos_head"]
    assert fam["matched"] == 2
    assert f"{head}.cls_towerr.0.weight" in fam["unmatched"]
    assert not report["by_family"]["backbone"]["unmatched"]


def test_rcnn_family_conversion_golden():
    """roi_heads/rpn_head conversion: the flax ROIBoxHead fed NHWC ROI
    features must reproduce the torch (NCHW-flattened) box head after
    the fc1 permutation; RPN conv weights convert OIHW->HWIO."""
    import jax

    from sylph_tpu.models.rcnn import ROIBoxHead

    torch.manual_seed(0)
    c, p, fc_dim, n_cls = 8, 7, 16, 5

    class TorchBoxHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(c * p * p, fc_dim)
            self.fc2 = nn.Linear(fc_dim, fc_dim)

        def forward(self, x):  # x: (N, C, P, P)
            x = x.flatten(1)
            x = F.relu(self.fc1(x))
            return F.relu(self.fc2(x))

    box_head = TorchBoxHead()
    cls_score = nn.Linear(fc_dim, n_cls + 1)
    bbox_pred = nn.Linear(fc_dim, 4)

    sd = {}
    for name, mod in (("roi_heads.box_head.fc1", box_head.fc1),
                      ("roi_heads.box_head.fc2", box_head.fc2),
                      ("roi_heads.box_predictor.cls_score", cls_score),
                      ("roi_heads.box_predictor.bbox_pred", bbox_pred)):
        sd[f"{name}.weight"] = mod.weight.detach().numpy()
        sd[f"{name}.bias"] = mod.bias.detach().numpy()
    # RPN conv for the OIHW->HWIO check
    rpn_conv = nn.Conv2d(c, c, 3, padding=1)
    sd["proposal_generator.rpn_head.conv.weight"] = \
        rpn_conv.weight.detach().numpy()
    sd["proposal_generator.rpn_head.conv.bias"] = \
        rpn_conv.bias.detach().numpy()

    report = {}
    params = convert_detectron2_checkpoint(sd, report=report,
                                           roi_box_channels=c)
    assert not report["unmatched"], report["unmatched"]
    assert params["rpn_head"]["conv"]["kernel"].shape == (3, 3, c, c)

    x = np.random.RandomState(1).randn(3, c, p, p).astype(np.float32)
    with torch.no_grad():
        feats = box_head(torch.from_numpy(x))
        t_scores = cls_score(feats).numpy()
        t_deltas = bbox_pred(feats).numpy()

    flax_head = ROIBoxHead(fc_dim=fc_dim, num_classes=n_cls,
                           cls_agnostic_bbox=True)
    j_scores, j_deltas = flax_head.apply(
        {"params": params["box_head"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))   # NCHW -> NHWC
    np.testing.assert_allclose(np.asarray(j_scores), t_scores,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_deltas), t_deltas,
                               rtol=1e-4, atol=1e-4)
