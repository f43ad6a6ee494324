"""PyTorch reference checkpoint -> Flax params conversion.

The reference saves ``I{iter}_E{epoch}_gen.pth`` state dicts of the
GaussianDiffusion wrapper (model/model.py:126-146), whose denoiser keys are
prefixed ``denoise_fn.``. Our Flax UNet mirrors the torch module tree
index-for-index, so conversion is a key rewrite plus layout transposes:

- Conv2d weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
- Linear weight (O, I)          -> kernel (I, O)
- 1x1 Conv used as channel MLP (CLAM fc1/fc2) -> Dense kernel (I, O)
- GroupNorm weight/bias         -> scale/bias

Dead parameters in the reference (ResnetBlocWithAttn.conv — defined but
unused, unet.py:212; SelfAttention modules never constructed for fastdiffsr)
are skipped.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv_w(w) -> np.ndarray:
    w = np.asarray(w, dtype=np.float32)
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w) -> np.ndarray:
    w = np.asarray(w, dtype=np.float32)
    if w.ndim == 4:  # 1x1 conv used as dense
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_unet_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert a torch FastDiffSR UNet state_dict (keys relative to the UNet,
    i.e. without the ``denoise_fn.`` prefix) to a Flax params dict."""
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def has(prefix: str) -> bool:
        return any(k.startswith(prefix) for k in sd)

    for key, val in sd.items():
        # fastdiffsr names the time MLP 'noise_level_mlp'; ddpm/tesr 'time_mlp'
        m = re.match(r"(?:noise_level_mlp|time_mlp)\.(\d)\.(weight|bias)",
                     key)
        if m:
            layer = {"1": "mlp_dense1", "3": "mlp_dense2"}[m.group(1)]
            if m.group(2) == "weight":
                _set(params, (layer, "kernel"), _dense_w(val))
            else:
                _set(params, (layer, "bias"), val.astype(np.float32))
            continue

        m = re.match(r"(downs|ups|mid)\.(\d+)\.(.*)", key)
        if m:
            lst, i, rest = m.group(1), m.group(2), m.group(3)
            base = f"{lst}_{i}"
            _convert_block_entry(params, sd, base, f"{lst}.{i}.", rest, val,
                                 has)
            continue

        m = re.match(r"final_conv\.block\.(\d)\.(weight|bias)", key)
        if m:
            idx, kind = m.group(1), m.group(2)
            if idx == "0":
                name = "scale" if kind == "weight" else "bias"
                _set(params, ("final_block", "norm", name),
                     val.astype(np.float32))
            else:  # conv at index 3
                if kind == "weight":
                    _set(params, ("final_block", "conv", "kernel"),
                         _conv_w(val))
                else:
                    _set(params, ("final_block", "conv", "bias"),
                         val.astype(np.float32))
            continue
        # anything else (e.g. diffusion buffers) is ignored by callers that
        # pass a full GaussianDiffusion state_dict through strip_diffusion().
    return params


def _convert_block_entry(params, sd, base, torch_prefix, rest, val, has):
    f32 = lambda v: np.asarray(v, dtype=np.float32)

    # stem conv: downs.0.weight / downs.0.bias
    if rest in ("weight", "bias"):
        if rest == "weight":
            _set(params, (base, "kernel"), _conv_w(val))
        else:
            _set(params, (base, "bias"), f32(val))
        return

    # Down/Upsample conv vs the dead 1x1 inside ResnetBlocWithAttn:
    # a Res block has sibling res_block.* keys; a resize module does not.
    m = re.match(r"conv\.(weight|bias)$", rest)
    if m:
        if has(torch_prefix + "res_block."):
            return  # dead ResnetBlocWithAttn.conv (unet.py:212) — skip
        if m.group(1) == "weight":
            _set(params, (base, "conv", "kernel"), _conv_w(val))
        else:
            _set(params, (base, "conv", "bias"), f32(val))
        return

    m = re.match(r"res_block\.noise_func\.noise_func\.0\.(weight|bias)", rest)
    if m:
        if m.group(1) == "weight":
            _set(params, (base, "res_block", "noise_dense", "kernel"),
                 _dense_w(val))
        else:
            _set(params, (base, "res_block", "noise_dense", "bias"), f32(val))
        return

    # SR3 (ddpm/tesr) time MLP inside ResnetBlock: Sequential(Swish, Linear)
    m = re.match(r"res_block\.mlp\.1\.(weight|bias)", rest)
    if m:
        if m.group(1) == "weight":
            _set(params, (base, "res_block", "mlp_dense", "kernel"),
                 _dense_w(val))
        else:
            _set(params, (base, "res_block", "mlp_dense", "bias"), f32(val))
        return

    # SR3 SelfAttention: norm (GN) + qkv (1x1, no bias) + out (1x1)
    m = re.match(r"attn\.(norm|qkv|out)\.(weight|bias)", rest)
    if m:
        which, kind = m.groups()
        if which == "norm":
            name = "scale" if kind == "weight" else "bias"
            _set(params, (base, "attn", "norm", name), f32(val))
        else:
            if kind == "weight":
                _set(params, (base, "attn", which, "kernel"), _conv_w(val))
            else:
                _set(params, (base, "attn", which, "bias"), f32(val))
        return

    m = re.match(r"res_block\.(block1|block2)\.block\.(\d)\.(weight|bias)",
                 rest)
    if m:
        blk, idx, kind = m.groups()
        if idx == "0":
            name = "scale" if kind == "weight" else "bias"
            _set(params, (base, "res_block", blk, "norm", name), f32(val))
        else:
            if kind == "weight":
                _set(params, (base, "res_block", blk, "conv", "kernel"),
                     _conv_w(val))
            else:
                _set(params, (base, "res_block", blk, "conv", "bias"),
                     f32(val))
        return

    m = re.match(r"res_block\.res_conv\.(weight|bias)", rest)
    if m:
        if m.group(1) == "weight":
            _set(params, (base, "res_block", "res_conv", "kernel"),
                 _conv_w(val))
        else:
            _set(params, (base, "res_block", "res_conv", "bias"), f32(val))
        return

    m = re.match(r"ca\.(fc1|fc2)\.weight", rest)
    if m:
        _set(params, (base, "ca", m.group(1), "kernel"), _dense_w(val))
        return

    if rest == "sa.conv1.weight":
        _set(params, (base, "sa", "conv", "kernel"), _conv_w(val))
        return
    # silently ignore unknown dead keys


def torch_guided_unet_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert an OpenAI guided-diffusion UNet state_dict (gdp variant,
    reference model/gdp_modules/unet.py:530-771) to GuidedUNet params.

    torch tree -> flax names:
      time_embed.{0,2}                  -> time_dense{1,2}
      input_blocks.i.j.*                -> input_{i}_{j}
      middle_block.j.*                  -> middle_{j}
      output_blocks.i.j.*               -> output_{i}_{j}
      out.{0,2}                         -> out_norm / out_conv
    ResBlock leaves: in_layers.0->in_norm, in_layers.2->in_conv,
    emb_layers.1->emb_dense, out_layers.0->out_norm, out_layers.3->out_conv,
    skip_connection->skip. Attention leaves: norm, qkv (conv1d), proj_out.
    """
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def put(path, key, kind, val):
        f32 = np.asarray(val, dtype=np.float32)
        if kind == "norm":
            name = "scale" if key == "weight" else "bias"
            _set(params, path + (name,), f32)
        elif kind == "dense":
            _set(params, path + ("kernel" if key == "weight" else "bias",),
                 _dense_w(val) if key == "weight" else f32)
        elif kind == "conv1d":  # (O, I, 1) -> dense (I, O)
            if key == "weight":
                _set(params, path + ("kernel",),
                     np.transpose(val[:, :, 0], (1, 0)).astype(np.float32))
            else:
                _set(params, path + ("bias",), f32)
        else:  # conv2d
            _set(params, path + ("kernel" if key == "weight" else "bias",),
                 _conv_w(val) if key == "weight" else f32)

    res_map = {
        "in_layers.0": ("in_norm", "norm"),
        "in_layers.2": ("in_conv", "conv"),
        "emb_layers.1": ("emb_dense", "dense"),
        "out_layers.0": ("out_norm", "norm"),
        "out_layers.3": ("out_conv", "conv"),
        "skip_connection": ("skip", "conv"),
    }
    attn_map = {
        "norm": ("norm", "norm"),
        "qkv": ("qkv", "conv1d"),
        "proj_out": ("proj_out", "conv1d"),
    }

    for key, val in sd.items():
        m = re.match(r"time_embed\.(0|2)\.(weight|bias)", key)
        if m:
            name = "time_dense1" if m.group(1) == "0" else "time_dense2"
            put((name,), m.group(2), "dense", val)
            continue

        m = re.match(r"out\.(0|2)\.(weight|bias)", key)
        if m:
            if m.group(1) == "0":
                put(("out_norm",), m.group(2), "norm", val)
            else:
                put(("out_conv",), m.group(2), "conv", val)
            continue

        m = re.match(r"input_blocks\.0\.0\.(weight|bias)$", key)
        if m:  # stem conv
            put(("input_0_0",), m.group(1), "conv", val)
            continue

        m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)\.(weight|bias)$",
                     key)
        if m:
            i, j, inner, kind = m.groups()
            sub = res_map.get(inner) or attn_map.get(inner)
            if sub:
                put((f"input_{i}_{j}", sub[0]), kind, sub[1], val)
            continue

        m = re.match(r"middle_block\.(\d+)\.(.+)\.(weight|bias)$", key)
        if m:
            j, inner, kind = m.groups()
            sub = res_map.get(inner) or attn_map.get(inner)
            if sub:
                put((f"middle_{j}", sub[0]), kind, sub[1], val)
            continue

        m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)\.(weight|bias)$",
                     key)
        if m:
            i, j, inner, kind = m.groups()
            sub = res_map.get(inner) or attn_map.get(inner)
            if sub:
                put((f"output_{i}_{j}", sub[0]), kind, sub[1], val)
            continue
    return params


def torch_nafnet_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert an EDiffSR ConditionalNAFNet state_dict
    (DenoisingNAFNet_arch.py:165-264) to Flax params.

    Per-NAFBlock leaves: mlp.1->time_dense, conv1..5->conv1..5 (conv2 is
    depthwise: same HWIO transpose), sca.1->sca_conv, norm{1,2}.g (1,C,1,1)
    -> norm{1,2}_g (C,), beta/gamma (1,C,1,1) -> (C,).
    """
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else
             np.asarray(val, np.float32))

    def dense(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _dense_w(val) if key == "weight" else
             np.asarray(val, np.float32))

    def naf_leaf(base, rest, key, val):
        if rest == "mlp.1":
            dense(base + ("time_dense",), key, val)
        elif rest in ("conv1", "conv2", "conv3", "conv4", "conv5"):
            conv(base + (rest,), key, val)
        elif rest == "sca.1":
            conv(base + ("sca_conv",), key, val)
        elif rest in ("norm1", "norm2"):  # key == 'g'
            _set(params, base + (f"{rest}_g",),
                 np.asarray(val, np.float32).reshape(-1))

    block_lists = {"encoders": "enc", "decoders": "dec"}

    for key, val in sd.items():
        m = re.match(r"time_mlp\.(1|3)\.(weight|bias)", key)
        if m:
            dense(("time_dense1" if m.group(1) == "1" else "time_dense2",),
                  m.group(2), val)
            continue
        m = re.match(r"(intro|ending)\.(weight|bias)", key)
        if m:
            conv((m.group(1),), m.group(2), val)
            continue
        m = re.match(r"enhance\.rcab\.(0|2)\.(weight|bias)", key)
        if m:
            conv(("enhance", "conv1" if m.group(1) == "0" else "conv2"),
                 m.group(2), val)
            continue
        m = re.match(r"enhance\.rcab\.3\.attention\.(1|3)\.(weight|bias)",
                     key)
        if m:
            conv(("enhance", "ca_fc1" if m.group(1) == "1" else "ca_fc2"),
                 m.group(2), val)
            continue
        m = re.match(r"downs\.(\d+)\.(weight|bias)", key)
        if m:
            conv((f"down_{m.group(1)}",), m.group(2), val)
            continue
        m = re.match(r"ups\.(\d+)\.0\.(weight|bias)", key)
        if m:
            conv((f"up_{m.group(1)}",), m.group(2), val)
            continue
        m = re.match(r"middle_blks\.(\d+)\.(.+?)\.(weight|bias|g)$", key)
        if m:
            naf_leaf((f"middle_{m.group(1)}",), m.group(2), m.group(3), val)
            continue
        m = re.match(r"middle_blks\.(\d+)\.(beta|gamma)$", key)
        if m:
            _set(params, (f"middle_{m.group(1)}", m.group(2)),
                 np.asarray(val, np.float32).reshape(-1))
            continue
        m = re.match(r"(encoders|decoders)\.(\d+)\.(\d+)\.(.+?)"
                     r"\.(weight|bias|g)$", key)
        if m:
            lst, i, j, rest, kind = m.groups()
            naf_leaf((f"{block_lists[lst]}_{i}_{j}",), rest, kind, val)
            continue
        m = re.match(r"(encoders|decoders)\.(\d+)\.(\d+)\.(beta|gamma)$",
                     key)
        if m:
            lst, i, j, which = m.groups()
            _set(params, (f"{block_lists[lst]}_{i}_{j}", which),
                 np.asarray(val, np.float32).reshape(-1))
            continue
    return params


def torch_swinir_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert the reference SwinIR GeneratorResNet state_dict
    (MSI_SR_model/model/swinir.py:548-753) to Flax SwinIR params.

    Buffers (mean, relative_position_index, attn_mask) are dropped; LN
    weight->scale; Linear (O,I)->(I,O); Conv (O,I,kh,kw)->(kh,kw,I,O).
    """
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else np.asarray(val, np.float32))

    def dense(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _dense_w(val) if key == "weight" else np.asarray(val, np.float32))

    def ln(path, key, val):
        _set(params, path + ("scale" if key == "weight" else "bias",),
             np.asarray(val, np.float32))

    for key, val in sd.items():
        if key.endswith(("relative_position_index", "attn_mask")) or \
                key == "mean":
            continue
        m = re.match(r"(conv_first|conv_after_body|conv_last)"
                     r"\.(weight|bias)$", key)
        if m:
            conv((m.group(1),), m.group(2), val)
            continue
        m = re.match(r"conv_before_upsample\.0\.(weight|bias)$", key)
        if m:
            conv(("conv_before_upsample",), m.group(1), val)
            continue
        m = re.match(r"upsample\.(\d+)\.(weight|bias)$", key)
        if m:  # Sequential indices 0,2,... -> chain index 0,1,...
            conv((f"upsample_conv_{int(m.group(1)) // 2}",), m.group(2), val)
            continue
        m = re.match(r"patch_embed\.norm\.(weight|bias)$", key)
        if m:
            ln(("patch_norm",), m.group(1), val)
            continue
        m = re.match(r"norm\.(weight|bias)$", key)
        if m:
            ln(("norm",), m.group(1), val)
            continue
        m = re.match(r"layers\.(\d+)\.conv\.(weight|bias)$", key)
        if m:
            conv((f"layer_{m.group(1)}", "conv"), m.group(2), val)
            continue
        m = re.match(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)$",
                     key)
        if m:
            i, j, rest = m.groups()
            base = (f"layer_{i}", f"block_{j}")
            mm = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
            if mm:
                ln(base + (mm.group(1),), mm.group(2), val)
                continue
            if rest == "attn.relative_position_bias_table":
                _set(params, base + ("attn",
                                     "relative_position_bias_table"),
                     np.asarray(val, np.float32))
                continue
            mm = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", rest)
            if mm:
                dense(base + ("attn", mm.group(1)), mm.group(2), val)
                continue
            mm = re.match(r"mlp\.fc(1|2)\.(weight|bias)$", rest)
            if mm:
                dense(base + (f"mlp_fc{mm.group(1)}",), mm.group(2), val)
                continue
    return params




def _ssem_map(params, base, torch_rest, val, conv):
    """Map one SSEM-relative torch key (MSI_SR_model/model/hsenet.py:323-364)
    onto the Flax SSEM tree (msi/hsenet.py:100-114)."""
    import re
    mm = re.match(r"head\.0\.0\.(weight|bias)$", torch_rest)
    if mm:
        conv(base + ("head", "conv"), mm.group(1), val); return True
    mm = re.match(r"MB\.([01])\.0\.(weight|bias)$", torch_rest)
    if mm:
        conv(base + (f"mb{int(mm.group(1)) + 1}", "conv"), mm.group(2), val)
        return True
    mm = re.match(r"AB\.0\.(g|theta|phi|W)\.(weight|bias)$", torch_rest)
    if mm:
        conv(base + ("ab_nl", mm.group(1)), mm.group(2), val); return True
    mm = re.match(r"AB\.1\.(weight|bias)$", torch_rest)
    if mm:
        conv(base + ("ab_conv",), mm.group(1), val); return True
    mm = re.match(r"tail\.0\.0\.(weight|bias)$", torch_rest)
    if mm:
        conv(base + ("tail", "conv"), mm.group(1), val); return True
    return False


def torch_hsenet_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert the reference HSENET state_dict
    (MSI_SR_model/model/hsenet.py:401-441) to Flax HSENet params
    (msi/hsenet.py). MeanShift sub_mean/add_mean are fixed eye/mean convs
    (hsenet.py:107-115) baked into the Flax forward — dropped here."""
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else np.asarray(val, np.float32))

    for key, val in sd.items():
        if key.startswith(("sub_mean.", "add_mean.")):
            continue
        m = re.match(r"head\.0\.(weight|bias)$", key)
        if m:
            conv(("head",), m.group(1), val)
            continue
        m = re.match(r"tail\.0\.(\d+)\.(weight|bias)$", key)
        if m:  # Upsampler convs at Sequential indices 0,2,...
            conv((f"up_conv_{int(m.group(1)) // 2}",), m.group(2), val)
            continue
        m = re.match(r"tail\.1\.(weight|bias)$", key)
        if m:
            conv(("tail",), m.group(1), val)
            continue
        m = re.match(r"body_modulist\.(\d+)\.(.+)$", key)
        if not m:
            continue
        i, rest = m.groups()
        base = (f"bm_{i}",)
        mm = re.match(r"head\.([01])\.0\.(weight|bias)$", rest)
        if mm:
            conv(base + (f"head{int(mm.group(1)) + 1}", "conv"),
                 mm.group(2), val)
            continue
        mm = re.match(r"tail\.([01])\.0\.(weight|bias)$", rest)
        if mm:
            conv(base + (f"tail{int(mm.group(1)) + 1}", "conv"),
                 mm.group(2), val)
            continue
        mm = re.match(r"body\.0\.(.+)$", rest)  # HSEM
        if not mm:
            continue
        hrest = mm.group(1)
        hbase = base + ("hsem",)
        mm = re.match(r"(base_scale|down_scale)\.0\.(.+)$", hrest)
        if mm and _ssem_map(params, hbase + (mm.group(1),), mm.group(2),
                            val, conv):
            continue
        mm = re.match(r"NonLocal_base\.(g|theta|phi|W)\.(weight|bias)$",
                      hrest)
        if mm:
            conv(hbase + ("nonlocal_base", mm.group(1)), mm.group(2), val)
            continue
        mm = re.match(r"tail\.0\.0\.(weight|bias)$", hrest)
        if mm:
            conv(hbase + ("tail", "conv"), mm.group(1), val)
            continue
    return params


def _vit_encoder_map(params, base, rest, conv, dense, ln):
    """TransformerEncoder layer keys (MSI_SR_model/model/transformer.py:
    158-173) -> Flax Encoder names (msi/transenet.py:112-129)."""
    m = re.match(r"layers\.(\d+)\.0\.fn\.norm\.(weight|bias)$", rest)
    if m:
        ln(base + (f"ln_attn_{m.group(1)}",), m.group(2)); return m
    m = re.match(r"layers\.(\d+)\.0\.fn\.fn\.to_qkv\.weight$", rest)
    if m:
        dense(base + (f"attn_{m.group(1)}", "to_qkv"), "weight"); return m
    m = re.match(r"layers\.(\d+)\.0\.fn\.fn\.to_out\.0\."
                 r"(weight|bias)$", rest)
    if m:
        dense(base + (f"attn_{m.group(1)}", "to_out"), m.group(2)); return m
    m = re.match(r"layers\.(\d+)\.1\.fn\.norm\.(weight|bias)$", rest)
    if m:
        ln(base + (f"ln_mlp_{m.group(1)}",), m.group(2)); return m
    m = re.match(r"layers\.(\d+)\.1\.fn\.fn\.net\.([03])\."
                 r"(weight|bias)$", rest)
    if m:
        fc = "fc1" if m.group(2) == "0" else "fc2"
        dense(base + (f"mlp_{m.group(1)}", fc), m.group(3)); return m
    return None


def torch_transenet_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert the reference TransENet state_dict
    (MSI_SR_model/model/transenet.py:288-433 + model/transformer.py)
    to Flax TransENet params (msi/transenet.py)."""
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else np.asarray(val, np.float32))

    def dense_v(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _dense_w(val) if key == "weight" else np.asarray(val, np.float32))

    simple = {"head.0": ("head",), "tail": ("tail",),
              "stage1_conv1x1": ("red1",), "stage2_conv1x1": ("red2",),
              "stage3_conv1x1": ("red3",), "up_conv1x1": ("red_up",),
              "span_conv1x1": ("span",)}
    emb = {"patch_to_embedding_low1": ("emb1",),
           "patch_to_embedding_low2": ("emb2",),
           "patch_to_embedding_low3": ("emb3",),
           "patch_to_embedding_high": ("emb_up",),
           "embedding_to_patch": ("to_patch",)}
    enc = {"encoder_stage1": "enc1", "encoder_stage2": "enc2",
           "encoder_stage3": "enc3", "encoder_up": "enc_up"}
    dec = {"decoder1": "dec1", "decoder2": "dec2", "decoder3": "dec3"}

    for key, val in sd.items():
        if key.startswith(("sub_mean.", "add_mean.")):
            continue
        pre, _, rest = key.partition(".")
        pre2 = key.rsplit(".", 1)[0]
        leaf = key.rsplit(".", 1)[1]
        if pre2 in simple:
            conv(simple[pre2], leaf, val)
            continue
        if pre2 in emb:
            dense_v(emb[pre2], leaf, val)
            continue
        m = re.match(r"upsampler\.(\d+)\.(weight|bias)$", key)
        if m:
            conv((f"up_conv_{int(m.group(1)) // 2}",), m.group(2), val)
            continue
        m = re.match(r"feat_extrat_stage([123])\.body\.(\d+)\.body\."
                     r"([02])\.(weight|bias)$", key)
        if m:
            s, i, ci, leaf = m.groups()
            conv((f"stage{s}", f"rb_{i}",
                  "conv1" if ci == "0" else "conv2"), leaf, val)
            continue
        if pre in enc:
            base = (enc[pre],)

            def ln(path, k, _v=val):
                _set(params, path + ("scale" if k == "weight" else "bias",),
                     np.asarray(_v, np.float32))

            def dn(path, k, _v=val):
                dense_v(path, k, _v)

            if _vit_encoder_map(params, base, rest, conv, dn, ln):
                continue
        if pre in dec:
            base = (dec[pre],)
            mm = re.match(r"layers\.(\d+)\.(\d)\.fn\.(.+)$", rest)
            if not mm:
                continue
            i, slot, drest = mm.groups()
            names = {"0": ("ln_self_", "self_"), "1": ("ln_cross_", "cross_"),
                     "2": ("ln_mlp_", "mlp_")}
            ln_name, fn_name = names[slot]
            m2 = re.match(r"norm\.(weight|bias)$", drest)
            if m2:
                _set(params, base + (f"{ln_name}{i}",
                                     "scale" if m2.group(1) == "weight"
                                     else "bias"),
                     np.asarray(val, np.float32))
                continue
            m2 = re.match(r"fn\.(to_qkv|to_q|to_k|to_v)\.weight$", drest)
            if m2:
                dense_v(base + (f"{fn_name}{i}", m2.group(1)), "weight", val)
                continue
            m2 = re.match(r"fn\.to_out\.0\.(weight|bias)$", drest)
            if m2:
                dense_v(base + (f"{fn_name}{i}", "to_out"), m2.group(1), val)
                continue
            m2 = re.match(r"fn\.net\.([03])\.(weight|bias)$", drest)
            if m2:
                fc = "fc1" if m2.group(1) == "0" else "fc2"
                dense_v(base + (f"{fn_name}{i}", fc), m2.group(2), val)
                continue
    return params


def torch_hat_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert the reference HAT GeneratorResNet state_dict
    (MSI_SR_model/model/hat.py:615-877) to Flax HAT params (msi/hat.py).

    Buffers (relative_position_index_SA/OCA, attn_mask) are dropped; note
    the reference Upsample appends the SAME conv module per stage
    (hat.py:597-607), so upsample.upsampling.0 and .2 carry identical
    tensors — both Flax convs receive them."""
    params: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else np.asarray(val, np.float32))

    def dense(path, key, val):
        _set(params, path + ("kernel" if key == "weight" else "bias",),
             _dense_w(val) if key == "weight" else np.asarray(val, np.float32))

    def ln(path, key, val):
        _set(params, path + ("scale" if key == "weight" else "bias",),
             np.asarray(val, np.float32))

    def attn_block(base, rest, val):
        mm = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
        if mm:
            ln(base + (mm.group(1),), mm.group(2), val); return True
        if rest == "relative_position_bias_table":
            _set(params, base + ("relative_position_bias_table",),
                 np.asarray(val, np.float32))
            return True
        mm = re.match(r"(qkv|proj)\.(weight|bias)$", rest)
        if mm:
            dense(base + (mm.group(1),), mm.group(2), val); return True
        mm = re.match(r"mlp\.fc([12])\.(weight|bias)$", rest)
        if mm:
            dense(base + (f"mlp_fc{mm.group(1)}",), mm.group(2), val)
            return True
        return False

    for key, val in sd.items():
        if ("relative_position_index" in key
                or key.endswith("attn_mask") or key == "mean"):
            continue
        m = re.match(r"(conv_first|conv_after_body|conv_last)"
                     r"\.(weight|bias)$", key)
        if m:
            conv((m.group(1),), m.group(2), val)
            continue
        m = re.match(r"conv_before_upsample\.0\.(weight|bias)$", key)
        if m:
            conv(("conv_before_upsample",), m.group(1), val)
            continue
        m = re.match(r"upsample\.upsampling\.(\d+)\.(weight|bias)$", key)
        if m:
            conv((f"upsample_conv_{int(m.group(1)) // 2}",), m.group(2), val)
            continue
        m = re.match(r"patch_embed\.norm\.(weight|bias)$", key)
        if m:
            ln(("patch_norm",), m.group(1), val)
            continue
        m = re.match(r"norm\.(weight|bias)$", key)
        if m:
            ln(("norm",), m.group(1), val)
            continue
        m = re.match(r"layers\.(\d+)\.conv\.(weight|bias)$", key)
        if m:
            conv((f"layer_{m.group(1)}", "conv"), m.group(2), val)
            continue
        m = re.match(r"layers\.(\d+)\.residual_group\.overlap_attn\."
                     r"(.+)$", key)
        if m:
            i, rest = m.groups()
            rest = (rest.replace("attn.", "")
                    if rest.startswith("attn.") else rest)
            attn_block((f"layer_{i}", "overlap_attn"), rest, val)
            continue
        m = re.match(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\."
                     r"(.+)$", key)
        if m:
            i, j, rest = m.groups()
            base = (f"layer_{i}", f"block_{j}")
            if rest.startswith("attn."):
                arest = rest[len("attn."):]
                if attn_block(base + ("attn",), arest, val):
                    continue
            mm = re.match(r"conv_block\.cab\.0\.(weight|bias)$", rest)
            if mm:
                conv(base + ("conv_block", "conv1"), mm.group(1), val)
                continue
            mm = re.match(r"conv_block\.cab\.2\.(weight|bias)$", rest)
            if mm:
                conv(base + ("conv_block", "conv2"), mm.group(1), val)
                continue
            mm = re.match(r"conv_block\.cab\.3\.attention\.([13])\."
                          r"(weight|bias)$", rest)
            if mm:
                fc = "ca_fc1" if mm.group(1) == "1" else "ca_fc2"
                conv(base + ("conv_block", fc), mm.group(2), val)
                continue
            attn_block(base, rest, val)
    return params


def torch_ndsrgan_to_flax(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Convert a reference NDSRGAN ``GeneratorResNet`` state_dict
    (MSI_SR_model/model/ndsrgan.py:160-211) to Flax ``DRRDBNet`` params.

    Torch module tree -> Flax names:
      conv1.0                            -> conv1
      DCRDB_block.DRRDB{n}.RDB{j}.CL_blocks.{i}.0 -> dcrdb_{n-1}.rdb{j}.cl_{i}
      DCRDB_block.DRRDB{n}.RDB{j}.conv   -> dcrdb_{n-1}.rdb{j}.fuse
      DCRDB_block.DRRDB{n}.conv          -> dcrdb_{n-1}.conv
      conv2                              -> conv2
      upsampling.{3m+1}                  -> up_conv_{m}
      conv3.{0,2}                        -> head_conv{1,2}

    Note the reference builds its ``upsampling`` Sequential from one shared
    module list (ndsrgan.py:180-199: ``upsampling += upsampling_two``), so
    for scale 4 the two stages share one Conv2d; its weights appear under
    both Sequential indices and land in our two distinct up convs —
    functionally identical.
    """
    params: dict = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        kind = parts[-1]
        if kind not in ("weight", "bias"):
            raise KeyError(f"unmapped ndsrgan key: {key}")
        leaf = "kernel" if kind == "weight" else "bias"
        v = _conv_w(val) if kind == "weight" else np.asarray(
            val, dtype=np.float32)
        if key.startswith("conv1.0."):
            _set(params, ("conv1", leaf), v)
        elif key.startswith("DCRDB_block.DRRDB"):
            n = int(parts[1][len("DRRDB"):]) - 1
            if parts[2].startswith("RDB"):
                rdb = "rdb" + parts[2][len("RDB"):]
                if parts[3] == "CL_blocks":
                    _set(params,
                         (f"dcrdb_{n}", rdb, f"cl_{parts[4]}", leaf), v)
                else:
                    _set(params, (f"dcrdb_{n}", rdb, "fuse", leaf), v)
            else:
                _set(params, (f"dcrdb_{n}", "conv", leaf), v)
        elif key.startswith("conv2."):
            _set(params, ("conv2", leaf), v)
        elif key.startswith("upsampling."):
            _set(params, (f"up_conv_{(int(parts[1]) - 1) // 3}", leaf), v)
        elif key.startswith("conv3.0."):
            _set(params, ("head_conv1", leaf), v)
        elif key.startswith("conv3.2."):
            _set(params, ("head_conv2", leaf), v)
        else:
            raise KeyError(f"unmapped ndsrgan key: {key}")
    return params


def strip_diffusion_prefix(state_dict: Dict[str, "np.ndarray"],
                           prefix: str = "denoise_fn.") -> dict:
    """Extract the UNet sub-dict from a full GaussianDiffusion state_dict
    (drops schedule buffers like betas/alphas_cumprod)."""
    return {k[len(prefix):]: v for k, v in state_dict.items()
            if k.startswith(prefix)}


def main(argv=None):  # pragma: no cover - thin CLI
    """Convert a reference checkpoint to a Flax params pickle.

    Usage:
      python -m fastdiffsr_tpu.models.convert --arch fastdiffsr \
          I896896_E196_gen.pth out_dir
    """
    import argparse
    import os
    import pickle

    import torch

    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="reference .pth checkpoint")
    p.add_argument("out", help="output checkpoint dir")
    p.add_argument("--arch", default="fastdiffsr",
                   choices=["fastdiffsr", "ddpm", "tesr", "gdp", "swinir",
                            "nafnet", "hsenet", "transenet", "hat",
                            "ndsrgan"])
    args = p.parse_args(argv)

    sd = torch.load(args.ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if any(k.startswith("denoise_fn.") for k in sd):
        sd = strip_diffusion_prefix(sd)

    if args.arch in ("fastdiffsr", "ddpm", "tesr"):
        params = torch_unet_to_flax(sd)
    elif args.arch == "gdp":
        params = torch_guided_unet_to_flax(sd)
    elif args.arch == "swinir":
        params = torch_swinir_to_flax(sd)
    elif args.arch == "hsenet":
        params = torch_hsenet_to_flax(sd)
    elif args.arch == "transenet":
        params = torch_transenet_to_flax(sd)
    elif args.arch == "hat":
        params = torch_hat_to_flax(sd)
    elif args.arch == "ndsrgan":
        params = torch_ndsrgan_to_flax(sd)
    else:
        params = torch_nafnet_to_flax(sd)

    os.makedirs(args.out, exist_ok=True)
    payload = {"step": 0, "epoch": 0, "params": params,
               "ema_params": params, "opt_state": None}
    with open(os.path.join(args.out, "state.pkl"), "wb") as f:
        pickle.dump(payload, f, protocol=4)
    n = len([1 for _ in _iter_leaves(params)])
    print(f"wrote {args.out}/state.pkl ({n} tensors)")


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":  # pragma: no cover
    main()
