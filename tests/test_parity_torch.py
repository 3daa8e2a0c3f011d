"""Numerical parity vs hand-built torch replicas of the published
architectures (BERT layer, CLIP resblock, Conv+BN). These pin the converter
layout conventions (kernel transposes, packed qkv order, norm order,
activation choices) so real-checkpoint conversion in later rounds is a pure
name-mapping exercise."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rtvc_tpu.models import convert
from rtvc_tpu.models.clip_vit import ResidualAttentionBlock
from rtvc_tpu.models.git_teacher import BertLayer
from rtvc_tpu.models.tinyvit import ConvBN


def _t2n(t):
    return t.detach().numpy()


def test_bert_layer_parity():
    """Our BertLayer == torch replica of HF BertLayer (post-norm, erf-GELU,
    eps 1e-12) under the joint prefix-causal mask."""
    H, HEADS, FFN = 32, 4, 64
    torch.manual_seed(0)
    q_l = torch.nn.Linear(H, H)
    k_l = torch.nn.Linear(H, H)
    v_l = torch.nn.Linear(H, H)
    attn_out = torch.nn.Linear(H, H)
    attn_ln = torch.nn.LayerNorm(H, eps=1e-12)
    inter = torch.nn.Linear(H, FFN)
    out_l = torch.nn.Linear(FFN, H)
    out_ln = torch.nn.LayerNorm(H, eps=1e-12)

    b, p, t = 2, 5, 4
    rng = np.random.default_rng(0)
    x = torch.tensor(rng.normal(size=(b, p + t, H)).astype(np.float32))

    def torch_forward(x):
        def heads(z):
            return z.view(b, p + t, HEADS, H // HEADS).transpose(1, 2)
        qh, kh, vh = heads(q_l(x)), heads(k_l(x)), heads(v_l(x))
        scores = qh @ kh.transpose(-1, -2) / (H // HEADS) ** 0.5
        # prefix-causal mask
        qi = torch.arange(p + t)[:, None]
        ki = torch.arange(p + t)[None, :]
        allowed = (ki < p) | (ki <= qi)
        scores = scores.masked_fill(~allowed, float("-inf"))
        probs = torch.softmax(scores, -1)
        ctx = (probs @ vh).transpose(1, 2).reshape(b, p + t, H)
        h = attn_ln(x + attn_out(ctx))
        f = out_l(torch.nn.functional.gelu(inter(h)))
        return out_ln(h + f)

    with torch.no_grad():
        want = torch_forward(x).numpy()

    sd = {}
    for name, mod in (("attention.self.query", q_l),
                      ("attention.self.key", k_l),
                      ("attention.self.value", v_l),
                      ("attention.output.dense", attn_out),
                      ("attention.output.LayerNorm", attn_ln),
                      ("intermediate.dense", inter),
                      ("output.dense", out_l),
                      ("output.LayerNorm", out_ln)):
        for pname, tensor in mod.state_dict().items():
            sd[f"textual.transformer.encoder.layer.0.{name}.{pname}"] = tensor

    used = set()
    params = {
        "qkv": convert._packed_qkv(
            sd, tuple(f"textual.transformer.encoder.layer.0.attention.self.{n}"
                      for n in ("query", "key", "value")), used),
        "attn_out": convert._linear(sd, "textual.transformer.encoder.layer.0.attention.output.dense", used),
        "attn_norm": convert._norm(sd, "textual.transformer.encoder.layer.0.attention.output.LayerNorm", used),
        "inter": convert._linear(sd, "textual.transformer.encoder.layer.0.intermediate.dense", used),
        "out": convert._linear(sd, "textual.transformer.encoder.layer.0.output.dense", used),
        "out_norm": convert._norm(sd, "textual.transformer.encoder.layer.0.output.LayerNorm", used),
    }
    layer = BertLayer(H, HEADS, FFN, dropout=0.0)
    with jax.default_matmul_precision("highest"):
        got = layer.apply({"params": params}, jnp.asarray(_t2n(x)),
                          prefix_len=p)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_clip_resblock_parity():
    """Our ResidualAttentionBlock == torch replica of CLIP's resblock
    (pre-LN, packed-qkv MHA, QuickGELU)."""
    W, HEADS = 32, 4
    torch.manual_seed(1)
    ln_1 = torch.nn.LayerNorm(W)
    attn = torch.nn.MultiheadAttention(W, HEADS, batch_first=True)
    ln_2 = torch.nn.LayerNorm(W)
    c_fc = torch.nn.Linear(W, 4 * W)
    c_proj = torch.nn.Linear(4 * W, W)

    b, l = 2, 6
    rng = np.random.default_rng(1)
    x = torch.tensor(rng.normal(size=(b, l, W)).astype(np.float32))

    with torch.no_grad():
        h = ln_1(x)
        a, _ = attn(h, h, h, need_weights=False)
        y = x + a
        h2 = ln_2(y)
        m = c_fc(h2)
        m = m * torch.sigmoid(1.702 * m)  # QuickGELU
        want = (y + c_proj(m)).numpy()

    base = "image_encoder.transformer.resblocks.0"
    sd = {
        f"{base}.attn.in_proj_weight": attn.in_proj_weight,
        f"{base}.attn.in_proj_bias": attn.in_proj_bias,
        f"{base}.attn.out_proj.weight": attn.out_proj.weight,
        f"{base}.attn.out_proj.bias": attn.out_proj.bias,
    }
    for name, mod in ((f"{base}.ln_1", ln_1), (f"{base}.ln_2", ln_2),
                      (f"{base}.mlp.c_fc", c_fc), (f"{base}.mlp.c_proj", c_proj)):
        for pname, tensor in mod.state_dict().items():
            sd[f"{name}.{pname}"] = tensor
    sd["image_encoder.conv1.weight"] = torch.zeros(W, 3, 4, 4)
    sd["image_encoder.class_embedding"] = torch.zeros(W)
    sd["image_encoder.positional_embedding"] = torch.zeros(5, W)
    for n in ("ln_pre", "ln_post"):
        sd[f"image_encoder.{n}.weight"] = torch.ones(W)
        sd[f"image_encoder.{n}.bias"] = torch.zeros(W)

    params, unused = convert.clip_params_from_torch(
        sd, prefix="image_encoder.", layers=1)
    assert unused == []
    block = ResidualAttentionBlock(W, HEADS)
    with jax.default_matmul_precision("highest"):
        got = block.apply({"params": {
            "ln_1": params["resblock_0"]["ln_1"],
            "ln_2": params["resblock_0"]["ln_2"],
            "attn": params["resblock_0"]["attn"],
            "mlp_fc": params["resblock_0"]["mlp_fc"],
            "mlp_proj": params["resblock_0"]["mlp_proj"],
        }}, jnp.asarray(_t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_convbn_parity():
    """Our ConvBN (NHWC) == torch Conv2d + BatchNorm2d (NCHW) in eval mode,
    incl. depthwise grouping — pins the (2,3,1,0) kernel transpose and
    running-stat mapping."""
    torch.manual_seed(2)
    for cin, cout, k, stride, groups in ((3, 8, 3, 2, 1), (8, 8, 3, 1, 8),
                                         (8, 16, 1, 1, 1)):
        conv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                               groups=groups, bias=False)
        bn = torch.nn.BatchNorm2d(cout)
        bn.eval()
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.normal_(0, 0.1)

        x = torch.randn(2, cin, 12, 12)
        with torch.no_grad():
            want = bn(conv(x)).numpy().transpose(0, 2, 3, 1)

        sd = {"m.conv.weight": conv.weight, "m.bn.weight": bn.weight,
              "m.bn.bias": bn.bias, "m.bn.running_mean": bn.running_mean,
              "m.bn.running_var": bn.running_var}
        used = set()
        p, s = convert._convbn(sd, "m", used)
        module = ConvBN(cout, k, stride, groups)
        with jax.default_matmul_precision("highest"):
            got = module.apply(
                {"params": p, "batch_stats": s},
                jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   rtol=1e-4)
