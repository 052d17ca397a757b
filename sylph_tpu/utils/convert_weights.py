"""detectron2/torch checkpoint → flax params conversion.

The reference trains with detectron2; its checkpoints (``.pth`` torch
state dicts, or the MSRA ``R-50.pkl`` ImageNet backbone) are the source
for golden parity tests and for serving converted models (SURVEY.md
§7.3 "Checkpoint conversion"). This module maps:

  * detectron2 FCOS backbone names (``backbone.bottom_up.stem.conv1`` /
    ``res{2-5}.{i}.conv{1-3}`` / ``fpn_lateral{3-5}`` / ``fpn_output`` /
    ``top_block.p6/p7``) → models/resnet.py + models/fpn.py names;
  * ``proposal_generator.fcos_head.*`` (towers are [conv,GN,relu]
    triples, so torch indices 0,3,6,9 are convs — fcos.py:382-442) →
    models/fcos_head.py names;
  * ``code_generator.code_generator_head.*`` → models/code_generator.py;
  * FrozenBatchNorm running stats folded to (scale, bias) constants:
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale;
  * conv kernels OIHW → HWIO, linear (out,in) → (in,out).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

BN_EPS = 1e-5


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _fold_bn(prefix: str, sd: Dict[str, np.ndarray], take=None):
    """take: optional getter that also marks the key as matched (for the
    conversion report); falls back to plain dict access."""
    get = take if take is not None else (lambda k: sd[k])
    gamma = np.asarray(get(f"{prefix}.weight"), np.float64)
    beta = np.asarray(get(f"{prefix}.bias"), np.float64)
    mean = (np.asarray(get(f"{prefix}.running_mean"), np.float64)
            if f"{prefix}.running_mean" in sd else np.zeros_like(gamma))
    var = (np.asarray(get(f"{prefix}.running_var"), np.float64)
           if f"{prefix}.running_var" in sd else np.ones_like(gamma))
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _set(tree: Dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth (state dict / {'model': sd}) or pickle .pkl."""
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items()
                if isinstance(v, np.ndarray)}
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data) if isinstance(data, dict) else data
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_detectron2_checkpoint(sd: Dict[str, np.ndarray],
                                  num_tower_convs: int = 4,
                                  num_attention_heads: int = 8,
                                  report: Dict = None,
                                  roi_box_channels: int = 256) -> Dict:
    """Full-model conversion; returns a nested flax param dict with the
    subtrees found in the state dict (backbone / fpn / fcos_head /
    code_generator / rpn_head / box_head).

    ``report``: pass a dict to receive a per-module-family audit —
    {"matched": [...], "unmatched": [...], "ignored": [...],
    "by_family": {family: {"matched": n, "unmatched": [keys]}}}. A
    nonempty "unmatched" means the checkpoint spells something this
    converter does not recognize (reference module registration,
    fcos.py:382-531) and those weights would silently stay at random
    init — tools/convert_checkpoint.py exits nonzero on it."""
    params: Dict = {}
    matched = set()

    # The MSRA/detectron2 ImageNet R-50.pkl names its backbone without the
    # detector's "backbone.bottom_up." prefix ("stem.conv1.weight",
    # "res2.0.conv1.weight", ...). Normalize to the detector scheme so one
    # matcher handles both.
    if not any(k.startswith("backbone.bottom_up.") for k in sd) and \
            any(re.match(r"(stem|res\d)\.", k) for k in sd):
        sd = {("backbone.bottom_up." + k
               if re.match(r"(stem|res\d)\.", k) else k): v
              for k, v in sd.items()}

    def take(key):
        matched.add(key)
        return sd[key]

    # ------------------------------------------------------------- backbone
    for key in list(sd):
        m = re.match(r"backbone\.bottom_up\.stem\.conv1\.weight$", key)
        if m:
            _set(params, "backbone/stem_conv1/kernel", _conv_w(take(key)))
            s, b = _fold_bn("backbone.bottom_up.stem.conv1.norm", sd, take)
            _set(params, "backbone/stem_bn1/scale", s)
            _set(params, "backbone/stem_bn1/bias", b)
        m = re.match(
            r"backbone\.bottom_up\.(res\d)\.(\d+)\.conv(\d)\.weight$", key)
        if m:
            stage, blk, ci = m.group(1), int(m.group(2)), m.group(3)
            base = f"backbone/{stage}_block{blk}"
            _set(params, f"{base}/conv{ci}/kernel", _conv_w(take(key)))
            s, b = _fold_bn(key[:-len(".weight")] + ".norm", sd, take)
            _set(params, f"{base}/bn{ci}/scale", s)
            _set(params, f"{base}/bn{ci}/bias", b)
        m = re.match(
            r"backbone\.bottom_up\.(res\d)\.(\d+)\.shortcut\.weight$", key)
        if m:
            stage, blk = m.group(1), int(m.group(2))
            base = f"backbone/{stage}_block{blk}"
            _set(params, f"{base}/shortcut/kernel", _conv_w(take(key)))
            s, b = _fold_bn(key[:-len(".weight")] + ".norm", sd, take)
            _set(params, f"{base}/shortcut_bn/scale", s)
            _set(params, f"{base}/shortcut_bn/bias", b)

    # ------------------------------------------------------------------ FPN
    for lvl, feat in ((3, "res3"), (4, "res4"), (5, "res5")):
        for d2, ours in ((f"backbone.fpn_lateral{lvl}", f"lateral_{feat}"),
                         (f"backbone.fpn_output{lvl}", f"output_{feat}")):
            if f"{d2}.weight" in sd:
                _set(params, f"fpn/{ours}/kernel",
                     _conv_w(take(f"{d2}.weight")))
                _set(params, f"fpn/{ours}/bias", take(f"{d2}.bias"))
    for p in (6, 7):
        if f"backbone.top_block.p{p}.weight" in sd:
            _set(params, f"fpn/top_block_p{p}/kernel",
                 _conv_w(take(f"backbone.top_block.p{p}.weight")))
            _set(params, f"fpn/top_block_p{p}/bias",
                 take(f"backbone.top_block.p{p}.bias"))

    # ------------------------------------------------------------ FCOS head
    head = "proposal_generator.fcos_head"
    for tower in ("cls_tower", "bbox_tower", "share_tower"):
        for i in range(num_tower_convs):
            conv_key = f"{head}.{tower}.{3 * i}.weight"
            if conv_key not in sd:
                continue
            base = f"fcos_head/{tower}"
            _set(params, f"{base}/conv{i}/kernel", _conv_w(take(conv_key)))
            _set(params, f"{base}/conv{i}/bias",
                 take(f"{head}.{tower}.{3 * i}.bias"))
            gn_key = f"{head}.{tower}.{3 * i + 1}.weight"
            if gn_key in sd:
                _set(params, f"{base}/gn{i}/scale", take(gn_key))
                _set(params, f"{base}/gn{i}/bias",
                     take(f"{head}.{tower}.{3 * i + 1}.bias"))
    for mod in ("cls_logits", "bbox_pred", "ctrness", "iou_overlap"):
        if f"{head}.{mod}.weight" in sd:
            _set(params, f"fcos_head/{mod}/kernel",
                 _conv_w(take(f"{head}.{mod}.weight")))
            _set(params, f"fcos_head/{mod}/bias",
                 take(f"{head}.{mod}.bias"))
    for i in range(5):
        k = f"{head}.scales.{i}.scale"
        if k in sd:
            _set(params, f"fcos_head/scale_l{i}/scale",
                 np.asarray(take(k)).reshape(()))

    # -------------------------------------------------------- code generator
    cg = "code_generator.code_generator_head"
    for key in list(sd):
        m = re.match(
            rf"{re.escape(cg)}\.support_set_shared_tower\.(\d+)\.(weight|bias)$",
            key)
        if m:
            idx, kind = int(m.group(1)), m.group(2)
            # layout per layer: [conv, (gn), relu] — conv indices are
            # produced by the tower builder; GN follows its conv.
            # Identify by parameter rank: conv weight is 4-D.
            v = take(key)
            layer, is_gn = _tower_slot(sd, cg, idx)
            if is_gn:
                name = f"code_generator/tower_conv{layer}_gn/" + \
                    ("scale" if kind == "weight" else "bias")
                _set(params, name, v)
            else:
                name = f"code_generator/tower_conv{layer}/" + \
                    ("kernel" if kind == "weight" else "bias")
                _set(params, name, _conv_w(v) if kind == "weight" else v)
    for d2, ours in (("support_set_cls_conv", "cls_conv_head"),
                     ("support_set_cls_bias", "cls_bias_head"),
                     ("support_set_cls_weight", "cls_weight_head"),
                     ("support_set_cls_scale", "cls_scale_head")):
        k = f"{cg}.{d2}.0.weight"
        if k in sd:
            _set(params, f"code_generator/{ours}/kernel", _conv_w(take(k)))
            _set(params, f"code_generator/{ours}/bias",
                 take(f"{cg}.{d2}.0.bias"))
    if f"{cg}.post_norm.weight" in sd:
        _set(params, "code_generator/post_norm/scale",
             take(f"{cg}.post_norm.weight"))
        _set(params, "code_generator/post_norm/bias",
             take(f"{cg}.post_norm.bias"))
    for d2, ours in (("conv_scale", "conv_scale"), ("bias_scale",
                                                    "bias_scale")):
        k = f"{cg}.{d2}.scale"
        if k in sd:
            _set(params, f"code_generator/{ours}/scale",
                 np.asarray(take(k)).reshape(()))
    # ------------------------------------------------------- ROIEncoder
    # The ROIEncoder variant registers directly (no CodeGenerator
    # wrapper), so its keys live under plain "code_generator."
    # (reference roi_encoder.py:118-281 attrs: box_pooler [a
    # FeatureFusionModuleV2 with MS_CAM], tokenizer, transformer_encoder,
    # weight_head, bias_head).
    re_ = "code_generator"
    if f"{re_}.tokenizer.fc1.weight" in sd:
        _convert_roi_encoder(sd, params, take, re_, num_attention_heads)

    # ---------------------------------------------- RCNN family (two-stage)
    # reference MetaFasterRCNN / TFA-RCNN checkpoints (detectron2
    # StandardRPNHead + FastRCNNConvFCHead + box_predictor names).
    rpn = "proposal_generator.rpn_head"
    for d2, ours in (("conv", "conv"), ("objectness_logits", "objectness"),
                     ("anchor_deltas", "anchor_deltas")):
        if f"{rpn}.{d2}.weight" in sd:
            _set(params, f"rpn_head/{ours}/kernel",
                 _conv_w(take(f"{rpn}.{d2}.weight")))
            _set(params, f"rpn_head/{ours}/bias", take(f"{rpn}.{d2}.bias"))
    bh = "roi_heads.box_head"
    k = 1
    while f"{bh}.fc{k}.weight" in sd:
        w = np.asarray(take(f"{bh}.fc{k}.weight"))
        if k == 1:
            # d2 flattens NCHW ROI features; flax flattens NHWC — permute
            # fc1's input dims CHW -> HWC (C = FPN width, 256 in every
            # reference config; pooler P inferred from in_features)
            out_dim, in_dim = w.shape
            c = roi_box_channels
            p = int(round((in_dim / c) ** 0.5))
            w = (w.reshape(out_dim, c, p, p).transpose(0, 2, 3, 1)
                 .reshape(out_dim, in_dim))
        _set(params, f"box_head/fc{k}/kernel",
             np.ascontiguousarray(w.T))
        _set(params, f"box_head/fc{k}/bias", take(f"{bh}.fc{k}.bias"))
        k += 1
    bp = "roi_heads.box_predictor"
    if f"{bp}.cls_score.weight" in sd:
        w = np.asarray(take(f"{bp}.cls_score.weight"))
        if f"{bp}.cls_score.bias" in sd:
            _set(params, "box_head/cls_score/kernel",
                 np.ascontiguousarray(w.T))
            _set(params, "box_head/cls_score/bias",
                 take(f"{bp}.cls_score.bias"))
        else:
            # TFA CosineSimOutputLayers: bias-free prototype rows,
            # same (C+1, fc_dim) orientation as our cosine_weight
            _set(params, "box_head/cosine_weight", w)
    if f"{bp}.scale" in sd:  # learnable cosine scale
        _set(params, "box_head/cosine_scale_param",
             np.asarray(take(f"{bp}.scale")).reshape(()))
    if f"{bp}.bbox_pred.weight" in sd:
        _set(params, "box_head/bbox_pred/kernel", np.ascontiguousarray(
            np.asarray(take(f"{bp}.bbox_pred.weight")).T))
        _set(params, "box_head/bbox_pred/bias",
             take(f"{bp}.bbox_pred.bias"))

    # Fail loud on a name-scheme mismatch: a state dict that clearly
    # carries a ResNet backbone but matched zero backbone keys would
    # otherwise silently leave the random init in place.
    has_backbone_keys = any(
        re.search(r"(^|\.)(stem|res\d)\.", k) for k in sd)
    if has_backbone_keys and "backbone" not in params:
        raise ValueError(
            "convert_detectron2_checkpoint: state dict contains backbone-"
            "like keys but none matched the known name schemes "
            f"(sample: {sorted(sd)[:5]})")
    if report is not None:
        report.update(conversion_report(sd, matched))
    return params


# Keys that carry no model weights: training bookkeeping, buffers the
# conversion legitimately drops (anchor caches, input normalization
# constants baked into our preprocessing, EMA/optimizer state).
_IGNORABLE = re.compile(
    r"(num_batches_tracked$|momentum|^pixel_mean$|^pixel_std$|"
    r"anchor_generator|^iteration$|ema_state|optimizer)")

_FAMILIES = (
    ("backbone", re.compile(r"^backbone\.bottom_up\.|^(stem|res\d)\.")),
    ("fpn", re.compile(r"^backbone\.(fpn_|top_block)")),
    ("fcos_head", re.compile(r"^proposal_generator\.fcos_head\.")),
    ("code_generator", re.compile(r"^code_generator\.")),
    ("rcnn", re.compile(r"^proposal_generator\.rpn_head\.|^roi_heads\.")),
)


def conversion_report(sd: Dict[str, np.ndarray], matched: set) -> Dict:
    """Per-family matched/unmatched audit of a conversion pass."""
    by_family = {f: {"matched": 0, "unmatched": []} for f, _ in _FAMILIES}
    by_family["other"] = {"matched": 0, "unmatched": []}
    ignored, unmatched_all = [], []
    for key in sd:
        fam = next((f for f, pat in _FAMILIES if pat.search(key)), "other")
        if key in matched:
            by_family[fam]["matched"] += 1
        elif _IGNORABLE.search(key):
            ignored.append(key)
        else:
            by_family[fam]["unmatched"].append(key)
            unmatched_all.append(key)
    return {"matched": sorted(matched), "unmatched": sorted(unmatched_all),
            "ignored": sorted(ignored), "by_family": by_family}


def _convert_roi_encoder(sd, params, take, pfx, heads):
    """Map reference ROIEncoder names → models/roi_encoder.py names."""
    def set_(name, v):
        _set(params, f"code_generator/{name}", v)

    def conv(src, dst):
        if f"{src}.weight" in sd:
            set_(f"{dst}/kernel", _conv_w(take(f"{src}.weight")))
            if f"{src}.bias" in sd:
                set_(f"{dst}/bias", take(f"{src}.bias"))

    def affine(src, dst):
        if f"{src}.weight" in sd:
            set_(f"{dst}/scale", take(f"{src}.weight"))
            set_(f"{dst}/bias", take(f"{src}.bias"))

    def dense(src, dst):
        if f"{src}.weight" in sd:
            set_(f"{dst}/kernel",
                 np.ascontiguousarray(np.asarray(take(f"{src}.weight")).T))
            set_(f"{dst}/bias", take(f"{src}.bias"))

    # FeatureFusionModuleV2: conv = Sequential(Conv2d, GN, ReLU)
    # (utils.py:135-141); MS_CAM local/global att Sequentials
    # (utils.py:79-96 — global_att index 0 is the AdaptiveAvgPool).
    conv(f"{pfx}.box_pooler.conv.0", "fusion_conv")
    affine(f"{pfx}.box_pooler.conv.1", "fusion_gn")
    cam = f"{pfx}.box_pooler.context_attention_module"
    for branch, base in (("local_att", 0), ("global_att", 1)):
        g = "local" if branch == "local_att" else "global"
        conv(f"{cam}.{branch}.{base}", f"ms_cam/{g}_conv1")
        affine(f"{cam}.{branch}.{base + 1}", f"ms_cam/{g}_gn1")
        conv(f"{cam}.{branch}.{base + 3}", f"ms_cam/{g}_conv2")
        affine(f"{cam}.{branch}.{base + 4}", f"ms_cam/{g}_gn2")

    # Tokenizer: detectron2 Conv2d "conv{k}" (norm as .norm) + "fc{k}"
    # (roi_encoder.py:26-79, 1-indexed). fc1 follows nn.Flatten of an
    # NCHW map; the flax model flattens NHWC, so fc1's input dims are
    # permuted CHW -> HWC (inferring P from in_features / conv_dim).
    k = 1
    conv_dim = None
    while f"{pfx}.tokenizer.conv{k}.weight" in sd:
        conv_dim = np.asarray(sd[f"{pfx}.tokenizer.conv{k}.weight"]).shape[0]
        conv(f"{pfx}.tokenizer.conv{k}", f"tok_conv{k - 1}")
        affine(f"{pfx}.tokenizer.conv{k}.norm", f"tok_gn{k - 1}")
        k += 1
    k = 1
    while f"{pfx}.tokenizer.fc{k}.weight" in sd:
        if k == 1 and conv_dim is not None:
            w = np.asarray(take(f"{pfx}.tokenizer.fc{k}.weight"))
            out_dim, in_dim = w.shape
            p = int(round((in_dim / conv_dim) ** 0.5))
            w = w.reshape(out_dim, conv_dim, p, p).transpose(0, 2, 3, 1)
            set_("tok_fc0/kernel",
                 np.ascontiguousarray(w.reshape(out_dim, in_dim).T))
            set_("tok_fc0/bias", take(f"{pfx}.tokenizer.fc{k}.bias"))
        else:
            dense(f"{pfx}.tokenizer.fc{k}", f"tok_fc{k - 1}")
        k += 1

    # nn.TransformerEncoder layers: packed qkv in_proj split into flax
    # query/key/value DenseGeneral kernels (in, heads, head_dim).
    li = 0
    while f"{pfx}.transformer_encoder.layers.{li}.self_attn.in_proj_weight" in sd:
        base = f"{pfx}.transformer_encoder.layers.{li}"
        dst = f"encoder_layer{li}"
        w = np.asarray(take(f"{base}.self_attn.in_proj_weight"))  # (3d, d)
        b = np.asarray(take(f"{base}.self_attn.in_proj_bias"))
        d = w.shape[1]
        hd = d // heads
        for i, name in enumerate(("query", "key", "value")):
            wi = w[i * d:(i + 1) * d]          # (d_out, d_in)
            set_(f"{dst}/self_attn/{name}/kernel",
                 np.ascontiguousarray(wi.T).reshape(d, heads, hd))
            set_(f"{dst}/self_attn/{name}/bias",
                 b[i * d:(i + 1) * d].reshape(heads, hd))
        ow = np.asarray(take(f"{base}.self_attn.out_proj.weight"))  # (d, d)
        set_(f"{dst}/self_attn/out/kernel",
             np.ascontiguousarray(ow.T).reshape(heads, hd, d))
        set_(f"{dst}/self_attn/out/bias",
             take(f"{base}.self_attn.out_proj.bias"))
        dense(f"{base}.linear1", f"{dst}/ff1")
        dense(f"{base}.linear2", f"{dst}/ff2")
        affine(f"{base}.norm1", f"{dst}/norm1")
        affine(f"{base}.norm2", f"{dst}/norm2")
        li += 1

    for head, ours in (("weight_head", "weight"), ("bias_head", "bias")):
        k = 1
        while f"{pfx}.{head}.fc{k}.weight" in sd:
            dense(f"{pfx}.{head}.fc{k}", f"{ours}_fc{k - 1}")
            k += 1


def _tower_slot(sd, cg, idx) -> Tuple[int, bool]:
    """Map a sequential index in support_set_shared_tower to (layer#,
    is_gn) by scanning parameter ranks up to idx."""
    layer = 0
    for i in range(idx):
        k = f"{cg}.support_set_shared_tower.{i}.weight"
        if k in sd and np.asarray(sd[k]).ndim == 4:
            layer += 1
    k = f"{cg}.support_set_shared_tower.{idx}.weight"
    is_gn = k in sd and np.asarray(sd[k]).ndim == 1
    if is_gn:
        layer -= 1  # GN belongs to the conv just before it
    return layer, is_gn
