"""ConditionalUNet (EDiffSR's second arch): golden parity vs the torch
reference with converted weights."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiffsr_tpu.models.cond_unet import ConditionalUNet
from tests.conftest import requires_reference, REFERENCE_ROOT

EDIFF = REFERENCE_ROOT / "EDiffSR" / "codes" / "config" / "sisr"


def _load_ref():
    import torch  # noqa: F401
    ns = {}
    mu = EDIFF / "models" / "modules" / "module_util.py"
    exec(compile(mu.read_text(), str(mu), "exec"), ns)
    arch = EDIFF / "models" / "modules" / "DenoisingUNet_arch.py"
    src = arch.read_text()
    src = re.sub(r"from \.module_util import \([^)]*\)", "", src)
    exec(compile(src, str(arch), "exec"), ns)
    return ns["ConditionalUNet"]


def _convert(sd, depth=2):
    """torch ConditionalUNet state_dict -> flax params."""
    from fastdiffsr_tpu.models.convert import _conv_w, _dense_w, _set
    p = {}

    def conv(path, key, val):
        _set(p, path + ("kernel" if key == "weight" else "bias",),
             _conv_w(val) if key == "weight" else
             np.asarray(val, np.float32))

    def dense(path, key, val):
        _set(p, path + ("kernel" if key == "weight" else "bias",),
             _dense_w(val) if key == "weight" else
             np.asarray(val, np.float32))

    def resblock(base, rest, key, val):
        m = re.match(r"mlp\.1\.(weight|bias)", rest)
        if m:
            dense(base + ("time_dense",), m.group(1), val)
            return
        m = re.match(r"block(1|2)\.proj\.(weight|bias)", rest)
        if m:
            conv(base + (f"conv{m.group(1)}",), m.group(2), val)
            return
        m = re.match(r"res_conv\.(weight|bias)", rest)
        if m:
            conv(base + ("res_conv",), m.group(1), val)

    def attn(base, rest, key, val):
        # Residual(PreNorm(dim, LinearAttention)): keys are fn.norm.g and
        # fn.fn.to_qkv/...; strip the Residual wrapper's leading 'fn.'
        if rest.startswith("fn."):
            rest = rest[3:]
        if rest == "norm.g":
            _set(p, base + ("norm_g",),
                 np.asarray(val, np.float32).reshape(-1))
        elif rest == "fn.to_qkv.weight":
            conv(base + ("to_qkv",), "weight", val)
        elif rest == "fn.to_out.0.weight":
            conv(base + ("to_out",), "weight", val)
        elif rest == "fn.to_out.0.bias":
            conv(base + ("to_out",), "bias", val)
        elif rest == "fn.to_out.1.g":
            _set(p, base + ("out_norm_g",),
                 np.asarray(val, np.float32).reshape(-1))

    for key, val in sd.items():
        m = re.match(r"init_conv\.(weight|bias)", key)
        if m:
            conv(("init_conv",), m.group(1), val)
            continue
        m = re.match(r"time_mlp\.(1|3)\.(weight|bias)", key)
        if m:
            dense((f"time_dense{1 if m.group(1) == '1' else 2}",),
                  m.group(2), val)
            continue
        m = re.match(r"(downs|ups)\.(\d+)\.(\d)\.(.+)$", key)
        if m:
            lst, i, j, rest = m.groups()
            i = int(i)
            # torch `ups` was built with insert(0): index i holds level
            # depth-1-i; `downs` indexes levels directly
            lvl = i if lst == "downs" else depth - 1 - i
            base_name = f"down_{lvl}" if lst == "downs" else f"up_{lvl}"
            if j in ("0", "1"):
                resblock((f"{base_name}_b{int(j) + 1}",), rest,
                         None, val)
            elif j == "2":
                attn((f"{base_name}_attn",), rest, None, val)
            else:
                mm = re.match(r"(?:0\.)?(weight|bias)", rest)
                if mm:
                    conv((f"{base_name}_{'down' if lst == 'downs' else 'up'}",),
                         mm.group(1), val)
                elif rest.startswith("1."):
                    conv((f"{base_name}_{'down' if lst == 'downs' else 'up'}",),
                         rest.split(".")[1], val)
            continue
        m = re.match(r"mid_block(1|2)\.(.+)$", key)
        if m:
            resblock((f"mid_b{m.group(1)}",), m.group(2), None, val)
            continue
        m = re.match(r"mid_attn\.(.+)$", key)
        if m:
            attn(("mid_attn",), m.group(1), None, val)
            continue
        m = re.match(r"final_res_block\.(.+)$", key)
        if m:
            resblock(("final_res",), m.group(1), None, val)
            continue
        m = re.match(r"final_conv\.(weight|bias)", key)
        if m:
            conv(("final_conv",), m.group(1), val)
    return p


@requires_reference
def test_cond_unet_matches_torch():
    import torch

    torch.manual_seed(0)
    Ref = _load_ref()
    tnet = Ref(in_nc=3, out_nc=3, nf=8, depth=2).eval()
    fnet = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = _convert(sd)

    rng = np.random.default_rng(1)
    B, H, W = 2, 10, 10  # exercises the reflect padder (depth 2 -> mult 4)
    xt = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    t = np.array([3.0, 77.0], np.float32)

    with torch.no_grad():
        out_t = tnet(torch.from_numpy(xt.transpose(0, 3, 1, 2)),
                     torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    out_f = np.asarray(fnet.apply({"params": params}, jnp.asarray(xt),
                                  jnp.asarray(cond), jnp.asarray(t),
                                  deterministic=True))
    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, atol=3e-4, rtol=1e-3)


def test_cond_unet_upsample_mode_parity():
    """upsample_mode='tconv' (exact stride-2 transposed-conv Upsample)
    must match the literal nearest-x2+conv3 graph with shared params."""
    rng = np.random.default_rng(2)
    xt = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    t = np.array([3.0, 50.0], np.float32)

    import jax
    dense = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(xt),
                        jnp.asarray(cond), jnp.asarray(t))
    want = dense.apply(params, jnp.asarray(xt), jnp.asarray(cond),
                       jnp.asarray(t), deterministic=True)
    tconv = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2,
                            upsample_mode="tconv")
    got = tconv.apply(params, jnp.asarray(xt), jnp.asarray(cond),
                      jnp.asarray(t), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    p2 = tconv.init(jax.random.PRNGKey(0), jnp.asarray(xt),
                    jnp.asarray(cond), jnp.asarray(t))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
