"""ROIEncoder conversion golden test.

Builds the reference ROIEncoder graph in plain torch under reference
state-dict names (roi_encoder.py:26-281, utils.py:70-165: fusion conv +
MS_CAM context attention, tokenizer, nn.TransformerEncoder over shots,
weight/bias MLP heads), converts the state dict, and requires the flax
ROIEncoder to reproduce the generated class codes.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sylph_tpu.models.roi_encoder import ROIEncoder
from sylph_tpu.train.checkpoint import merge_params
from sylph_tpu.utils.convert_weights import convert_detectron2_checkpoint

from test_ops import np_roi_align

C = 256
P = 7
HEADS = 8
STRIDES = (8, 16, 32, 64, 128)


def _torch_roi_encoder_modules(rng):
    """Reference-named torch modules (roi_encoder.py from_config)."""
    torch.manual_seed(3)
    inter = C // 4
    fusion = nn.Sequential(
        nn.Conv2d(C, C, 3, padding=1), nn.GroupNorm(32, C), nn.ReLU())
    local_att = nn.Sequential(
        nn.Conv2d(C, inter, 1), nn.GroupNorm(32, inter), nn.ReLU(),
        nn.Conv2d(inter, C, 1), nn.GroupNorm(32, C))
    global_att = nn.Sequential(
        nn.AdaptiveAvgPool2d(1),
        nn.Conv2d(C, inter, 1), nn.GroupNorm(32, inter), nn.ReLU(),
        nn.Conv2d(inter, C, 1), nn.GroupNorm(32, C))
    tok_conv = nn.Conv2d(C, C, 3, padding=1)
    tok_fc = nn.Linear(C * P * P, C)
    layer = nn.TransformerEncoderLayer(
        d_model=C, nhead=HEADS, dim_feedforward=C * 4, dropout=0.0)
    encoder = nn.TransformerEncoder(layer, num_layers=2)
    weight_head = [nn.Linear(C, 512), nn.Linear(512, C)]
    bias_head = [nn.Linear(C, 512), nn.Linear(512, 1)]
    for m in ([fusion, local_att, global_att, tok_conv, tok_fc, encoder]
              + weight_head + bias_head):
        for p in m.parameters():
            if p.dim() > 1:
                nn.init.normal_(p, 0, 0.05)
            else:
                nn.init.normal_(p, 0, 0.02)
    # GroupNorm/LayerNorm weights near 1
    for m in (fusion, local_att, global_att, encoder):
        for name, p in m.named_parameters():
            if "norm" in name.lower() and name.endswith("weight") \
                    and p.dim() == 1:
                nn.init.normal_(p, 1.0, 0.05)
    return (fusion, local_att, global_att, tok_conv, tok_fc, encoder,
            weight_head, bias_head)


def _state_dict(mods):
    (fusion, local_att, global_att, tok_conv, tok_fc, encoder,
     weight_head, bias_head) = mods
    sd = {}

    def put(prefix, module):
        for k, v in module.state_dict().items():
            sd[f"code_generator.{prefix}.{k}"] = v.detach().numpy()

    put("box_pooler.conv", fusion)
    put("box_pooler.context_attention_module.local_att", local_att)
    put("box_pooler.context_attention_module.global_att", global_att)
    put("tokenizer.conv1", tok_conv)
    put("tokenizer.fc1", tok_fc)
    put("transformer_encoder", encoder)
    for i, fc in enumerate(weight_head):
        put(f"weight_head.fc{i + 1}", fc)
    for i, fc in enumerate(bias_head):
        put(f"bias_head.fc{i + 1}", fc)
    return sd


def _torch_forward(mods, feats_np, boxes, shots):
    """Reference forward from FPN features (pooling via the numpy
    ROIAlign oracle + F.adaptive_avg_pool2d context)."""
    (fusion, local_att, global_att, tok_conv, tok_fc, encoder,
     weight_head, bias_head) = mods
    s = len(boxes)
    pooled = []
    for bi in range(s):
        x1, y1, x2, y2 = boxes[bi]
        area = max((x2 - x1) * (y2 - y1), 1e-6)
        lvl = int(np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)),
                          3, 7)) - 3
        pooled.append(np_roi_align(
            feats_np[lvl][bi], boxes[bi:bi + 1], 1.0 / STRIDES[lvl], P, 0)[0])
    x = torch.from_numpy(np.stack(pooled).transpose(0, 3, 1, 2))

    with torch.no_grad():
        x = fusion(x)
        ctx = torch.stack([
            F.adaptive_avg_pool2d(
                torch.from_numpy(f.transpose(0, 3, 1, 2)), (P, P))
            for f in feats_np]).mean(0)
        x = x * torch.sigmoid(local_att(ctx) + global_att(ctx))
        x = F.relu(tok_conv(x))
        x = F.relu(tok_fc(x.flatten(1)))
        tokens = x.view(-1, shots, C)
        # NOTE reference quirk: roi_encoder.py:247-256 builds the torch
        # encoder seq-first (no batch_first) but feeds (bs, shots, C),
        # so attention runs across the *class batch* — degenerating to
        # per-shot identity attention at eval where bs=1. Our model
        # implements the paper-intended per-class attention over shots;
        # the oracle transposes to match that semantics.
        tokens = encoder(tokens.transpose(0, 1)).transpose(0, 1)
        cls_tok = tokens.mean(1)
        w = cls_tok
        for i, fc in enumerate(weight_head):
            w = fc(w) if i == len(weight_head) - 1 else F.relu(fc(w))
        b = cls_tok
        for i, fc in enumerate(bias_head):
            b = fc(b) if i == len(bias_head) - 1 else F.relu(fc(b))
    prior = -math.log((1 - 0.01) / 0.01)
    return w.numpy(), prior + b.numpy().reshape(-1)


@pytest.mark.slow
def test_roi_encoder_conversion_matches_torch():
    rng = np.random.RandomState(5)
    mods = _torch_roi_encoder_modules(rng)
    sd = _state_dict(mods)
    converted = convert_detectron2_checkpoint(sd)

    shots, n_cls = 2, 2
    hw = (128, 128)
    feats_np = [rng.randn(shots * n_cls, hw[0] // st, hw[1] // st, C)
                .astype(np.float32) * 0.5 for st in STRIDES]
    boxes = np.array([[10.0, 12.0, 90.0, 100.0],
                      [20.0, 8.0, 110.0, 90.0],
                      [5.0, 5.0, 70.0, 80.0],
                      [30.0, 25.0, 120.0, 118.0]], np.float32)

    t_w, t_b = _torch_forward(mods, feats_np, boxes, shots)

    model = ROIEncoder(tokenizer_num_conv=1, tokenizer_norm="",
                       tokenizer_num_fc=1, tokenizer_fc_dim=C,
                       transformer_layers=2, transformer_heads=HEADS,
                       transformer_dropout=0.0, head_num_fc=2,
                       head_fc_dim=512, head_output_dim=C,
                       compute_dtype=jnp.float32)
    feats = [jnp.asarray(f) for f in feats_np]
    init = model.init(jax.random.PRNGKey(0), feats, jnp.asarray(boxes),
                      jnp.ones((len(boxes),), bool), shots, False)["params"]
    params = merge_params({"code_generator": init},
                          converted)["code_generator"]
    # every converted leaf must land (name-mapping completeness)
    flat_c = jax.tree.leaves(converted["code_generator"])
    flat_i = jax.tree.leaves(init)
    assert len(flat_c) == len(flat_i), (len(flat_c), len(flat_i))

    out = model.apply({"params": params}, feats, jnp.asarray(boxes),
                      jnp.ones((len(boxes),), bool), shots, False)
    np.testing.assert_allclose(np.asarray(out["cls_conv"]), t_w,
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["cls_bias"]), t_b,
                               rtol=1e-3, atol=2e-3)
