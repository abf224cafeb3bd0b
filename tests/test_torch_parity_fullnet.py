"""Full-network torch parity: forward equality + loss-curve agreement.

Round-1 parity was block-level (MHA, transformer block, conv stacks, fusion,
AdamW). These tests COMPOSE it: torch replicas of the three headline nets are
built from their documented specs —

- ``EnhancedTriModalFusionNetV4``  (``crossmodal_v4_enhancements.py:278-394``)
- ``fMRIFusionNet``                (``fMRI_CODE/run_fmri_v11.py:372-424``)
- ``EEGfMRIBridgeFusionNet``       (``bridge_utils.py:22-114``)

— loaded with the SAME weights as the flax nets, and asserted equal on the
forward pass (≤1e-4). Then both frameworks train the flagship net 10 steps
with identical weights/batches/optimizer (dropout off) and the loss curves
must agree: the BASELINE.json "parity on loss curves" claim.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402


# ---------------------------------------------------------------------------
# weight-mapping helpers (flax pytree → torch modules)
# ---------------------------------------------------------------------------

def t(x):
    return torch.tensor(np.asarray(x))


def map_dense(lin: nn.Linear, p):
    lin.weight.copy_(t(p["kernel"]).T)
    lin.bias.copy_(t(p["bias"]))


def map_bn(bn, p, s):
    bn.weight.copy_(t(p["scale"]))
    bn.bias.copy_(t(p["bias"]))
    bn.running_mean.copy_(t(s["mean"]))
    bn.running_var.copy_(t(s["var"]))


def map_ln(ln: nn.LayerNorm, p):
    ln.weight.copy_(t(p["scale"]))
    ln.bias.copy_(t(p["bias"]))


def map_conv(conv: nn.Conv1d, p):
    # flax conv kernel (K, Cin, Cout) → torch (Cout, Cin, K)
    conv.weight.copy_(t(np.asarray(p["kernel"]).transpose(2, 1, 0)))
    conv.bias.copy_(t(p["bias"]))


def map_mha(mha: nn.MultiheadAttention, p, d_model):
    def flat(name):
        k = np.asarray(p[name]["kernel"]).reshape(d_model, d_model)
        b = np.asarray(p[name]["bias"]).reshape(d_model)
        return k.T, b

    qk, qb = flat("q_proj")
    kk, kb = flat("k_proj")
    vk, vb = flat("v_proj")
    mha.in_proj_weight.copy_(t(np.concatenate([qk, kk, vk])))
    mha.in_proj_bias.copy_(t(np.concatenate([qb, kb, vb])))
    ok = np.asarray(p["out_proj"]["kernel"]).reshape(d_model, d_model)
    mha.out_proj.weight.copy_(t(ok.T))
    mha.out_proj.bias.copy_(t(p["out_proj"]["bias"]))


def map_transformer_layer(layer: nn.TransformerEncoderLayer, p, d_model):
    map_mha(layer.self_attn, p["attn"], d_model)
    map_dense(layer.linear1, p["ffn1"])
    map_dense(layer.linear2, p["ffn2"])
    map_ln(layer.norm1, p["norm1"])
    map_ln(layer.norm2, p["norm2"])


# ---------------------------------------------------------------------------
# torch replicas, built from the documented reference specs (NOT imported)
# ---------------------------------------------------------------------------

class TorchPositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len=5000):
        super().__init__()
        pos = torch.arange(max_len).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe = torch.zeros(max_len, d_model)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    def forward(self, x):  # (B, T, D)
        return x + self.pe[: x.size(1)].unsqueeze(0)


class TorchERPEncoder(nn.Module):
    """Spec: conv(7)→BN→GELU→Drop; conv(5)→BN→GELU→pool→Drop;
    conv(3)→BN→GELU→Drop; PE; N pre-norm transformer layers; time-mean →
    Linear → GELU → Drop."""

    def __init__(self, cin, hidden, layers, heads):
        super().__init__()
        self.c1 = nn.Conv1d(cin, 64, 7, padding=3)
        self.b1 = nn.BatchNorm1d(64)
        self.c2 = nn.Conv1d(64, 128, 5, padding=2)
        self.b2 = nn.BatchNorm1d(128)
        self.c3 = nn.Conv1d(128, hidden, 3, padding=1)
        self.b3 = nn.BatchNorm1d(hidden)
        self.pos = TorchPositionalEncoding(hidden)
        self.blocks = nn.ModuleList([
            nn.TransformerEncoderLayer(hidden, heads, 4 * hidden, 0.0,
                                       activation="gelu", batch_first=True,
                                       norm_first=True)
            for _ in range(layers)])
        self.proj = nn.Linear(hidden, hidden)

    def forward(self, x):  # (B, C, T)
        x = F.gelu(self.b1(self.c1(x)))
        x = F.max_pool1d(F.gelu(self.b2(self.c2(x))), 2)
        x = F.gelu(self.b3(self.c3(x)))
        x = self.pos(x.transpose(1, 2))
        for blk in self.blocks:
            x = blk(x)
        return F.gelu(self.proj(x.mean(1)))


class TorchPowerEncoder(nn.Module):
    """Spec: three parallel convs (k=3/5/7, 64ch each, BN+GELU) → concat →
    1×1 fuse conv (BN+GELU) → PE → transformers → time-mean → Linear+GELU."""

    def __init__(self, cin, hidden, layers, heads):
        super().__init__()
        self.s1 = nn.Conv1d(cin, 64, 3, padding=1)
        self.n1 = nn.BatchNorm1d(64)
        self.s2 = nn.Conv1d(cin, 64, 5, padding=2)
        self.n2 = nn.BatchNorm1d(64)
        self.s3 = nn.Conv1d(cin, 64, 7, padding=3)
        self.n3 = nn.BatchNorm1d(64)
        self.fuse = nn.Conv1d(192, hidden, 1)
        self.nf = nn.BatchNorm1d(hidden)
        self.pos = TorchPositionalEncoding(hidden)
        self.blocks = nn.ModuleList([
            nn.TransformerEncoderLayer(hidden, heads, 4 * hidden, 0.0,
                                       activation="gelu", batch_first=True,
                                       norm_first=True)
            for _ in range(layers)])
        self.proj = nn.Linear(hidden, hidden)

    def forward(self, x):
        y = torch.cat([F.gelu(self.n1(self.s1(x))),
                       F.gelu(self.n2(self.s2(x))),
                       F.gelu(self.n3(self.s3(x)))], dim=1)
        y = F.gelu(self.nf(self.fuse(y)))
        y = self.pos(y.transpose(1, 2))
        for blk in self.blocks:
            y = blk(y)
        return F.gelu(self.proj(y.mean(1)))


class TorchLearnedFusion(nn.Module):
    """Spec: 0.5·softmax(logits/T) + 0.5·softmax(gate(concat)/T)."""

    def __init__(self, m, d):
        super().__init__()
        self.logits = nn.Parameter(torch.ones(m))
        self.temperature = nn.Parameter(torch.tensor(1.0))
        self.g1 = nn.Linear(d * m, d)
        self.g2 = nn.Linear(d, m)

    def forward(self, feats):
        static = F.softmax(self.logits / self.temperature, dim=0)
        gate = self.g2(F.gelu(self.g1(torch.cat(feats, 1))))
        dyn = F.softmax(gate / self.temperature, dim=1)
        w = 0.5 * static.unsqueeze(0) + 0.5 * dyn
        return (torch.stack(feats, 1) * w.unsqueeze(2)).sum(1), w


class TorchTriModalV4(nn.Module):
    def __init__(self, ce, cp, fc, hidden, layers, heads, classes=2):
        super().__init__()
        self.erp = TorchERPEncoder(ce, hidden, layers, heads)
        self.pw = TorchPowerEncoder(cp, hidden, layers, heads)
        self.conn = nn.Sequential(
            nn.Linear(fc, 256), nn.BatchNorm1d(256), nn.GELU(),
            nn.Linear(256, hidden), nn.BatchNorm1d(hidden), nn.GELU())
        self.cross = nn.MultiheadAttention(hidden, heads, batch_first=True)
        self.fusion = TorchLearnedFusion(3, hidden)
        self.h1 = nn.Linear(hidden, hidden)
        self.hb1 = nn.BatchNorm1d(hidden)
        self.h2 = nn.Linear(hidden, hidden // 2)
        self.hb2 = nn.BatchNorm1d(hidden // 2)
        self.out = nn.Linear(hidden // 2, classes)

    def forward(self, erp, pw, conn):  # channels-first (B, C, T)
        e = self.erp(erp)
        p = self.pw(pw)
        c = self.conn(conn)
        stack = torch.stack([e, p, c], 1)
        enh, _ = self.cross(e.unsqueeze(1), stack, stack)
        fused, w = self.fusion([enh.squeeze(1), p, c])
        x = F.gelu(self.hb1(self.h1(fused)))
        x = F.gelu(self.hb2(self.h2(x)))
        return self.out(x), fused, w


def map_mlp(p, s, denses, bns):
    """Map an MLP pytree (dense_i/bn_i) onto torch Linear/BN lists."""
    for i, (lin, bn) in enumerate(zip(denses, bns)):
        map_dense(lin, p[f"dense_{i}"])
        if bn is not None:
            map_bn(bn, p[f"bn_{i}"], s[f"bn_{i}"])


def load_trimodal_weights(tm: TorchTriModalV4, variables, hidden):
    p, s = variables["params"], variables["batch_stats"]

    def load_erp_like(enc, pp, ss):
        map_conv(enc.c1, pp["conv1"]["conv"])
        map_bn(enc.b1, pp["conv1"]["bn"], ss["conv1"]["bn"])
        map_conv(enc.c2, pp["conv2"]["conv"])
        map_bn(enc.b2, pp["conv2"]["bn"], ss["conv2"]["bn"])
        map_conv(enc.c3, pp["conv3"]["conv"])
        map_bn(enc.b3, pp["conv3"]["bn"], ss["conv3"]["bn"])
        for i, blk in enumerate(enc.blocks):
            map_transformer_layer(blk, pp[f"transformer_{i}"], hidden)
        map_dense(enc.proj, pp["proj"])

    with torch.no_grad():
        load_erp_like(tm.erp, p["erp_encoder"], s["erp_encoder"])

        # PowerEncoder: the flax net runs ONE structurally-masked k=7 conv
        # holding all three branches; slice it back into the three torch
        # convs (branch0 taps 2:5 → k=3, branch1 taps 1:6 → k=5, branch2 all)
        pp, ss = p["pw_encoder"], s["pw_encoder"]
        kern = np.asarray(pp["multiscale"]["kernel"])  # (7, Cin, 192)
        bias = np.asarray(pp["multiscale"]["bias"])
        for conv, bn, sl, taps in (
            (tm.pw.s1, tm.pw.n1, slice(0, 64), slice(2, 5)),
            (tm.pw.s2, tm.pw.n2, slice(64, 128), slice(1, 6)),
            (tm.pw.s3, tm.pw.n3, slice(128, 192), slice(0, 7)),
        ):
            conv.weight.copy_(t(kern[taps, :, sl].transpose(2, 1, 0)))
            conv.bias.copy_(t(bias[sl]))
            bnp = pp["multiscale"]["bn"]
            bns_ = ss["multiscale"]["bn"]
            bn.weight.copy_(t(np.asarray(bnp["scale"])[sl]))
            bn.bias.copy_(t(np.asarray(bnp["bias"])[sl]))
            bn.running_mean.copy_(t(np.asarray(bns_["mean"])[sl]))
            bn.running_var.copy_(t(np.asarray(bns_["var"])[sl]))
        map_conv(tm.pw.fuse, pp["fuse"]["conv"])
        map_bn(tm.pw.nf, pp["fuse"]["bn"], ss["fuse"]["bn"])
        for i, blk in enumerate(tm.pw.blocks):
            map_transformer_layer(blk, pp[f"transformer_{i}"], hidden)
        map_dense(tm.pw.proj, pp["proj"])

        map_mlp(p["conn_encoder"]["mlp"], s["conn_encoder"]["mlp"],
                [tm.conn[0], tm.conn[3]], [tm.conn[1], tm.conn[4]])
        map_mha(tm.cross, p["cross_attn"], hidden)
        tm.fusion.logits.copy_(t(p["fusion"]["fusion_logits"]))
        tm.fusion.temperature.copy_(t(p["fusion"]["temperature"]))
        map_dense(tm.fusion.g1, p["fusion"]["gate1"])
        map_dense(tm.fusion.g2, p["fusion"]["gate2"])
        map_mlp(p["classifier"]["hidden"], s["classifier"]["hidden"],
                [tm.h1, tm.h2], [tm.hb1, tm.hb2])
        map_dense(tm.out, p["classifier"]["out"])


HIDDEN, LAYERS, HEADS = 16, 1, 2
CE, CP, FC, T_, B = 5, 7, 30, 16, 6


def make_trimodal_pair(seed=0):
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4

    model = TriModalFusionNetV4(hidden_dim=HIDDEN, dropout=0.0,
                                num_transformer_layers=LAYERS,
                                num_heads=HEADS)
    r = np.random.default_rng(seed)
    erp = r.standard_normal((B, T_, CE)).astype(np.float32)
    pw = r.standard_normal((B, T_, CP)).astype(np.float32)
    conn = r.standard_normal((B, FC)).astype(np.float32)
    variables = model.init({"params": jax.random.key(seed)},
                           erp=jnp.asarray(erp), pw=jnp.asarray(pw),
                           conn=jnp.asarray(conn), train=False)
    tm = TorchTriModalV4(CE, CP, FC, HIDDEN, LAYERS, HEADS)
    load_trimodal_weights(tm, variables, HIDDEN)
    tm.eval()  # flax side runs train=False; BN must use running stats
    return model, variables, tm, (erp, pw, conn)


def test_trimodal_v4_fullnet_forward_matches_torch():
    model, variables, tm, (erp, pw, conn) = make_trimodal_pair()
    out = model.apply(variables, erp=jnp.asarray(erp), pw=jnp.asarray(pw),
                      conn=jnp.asarray(conn), train=False)
    tm.eval()
    with torch.no_grad():
        logits_t, fused_t, w_t = tm(t(erp.transpose(0, 2, 1)),
                                    t(pw.transpose(0, 2, 1)), t(conn))
    np.testing.assert_allclose(np.asarray(out.logits), logits_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.fused), fused_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.fusion_weights), w_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_fmri_fusion_fullnet_forward_matches_torch():
    from multimodal_eeg_fmri_tpu.models import FMRIFusionNet

    A, C, H = 12, 9, 16
    model = FMRIFusionNet(hidden_dim=H, dropout=0.0)
    r = np.random.default_rng(1)
    act = r.standard_normal((B, A)).astype(np.float32)
    conn = r.standard_normal((B, C)).astype(np.float32)
    variables = model.init(jax.random.key(1), activation=jnp.asarray(act),
                           connectivity=jnp.asarray(conn), train=False)
    p, s = variables["params"], variables["batch_stats"]

    class TorchFMRIFusion(nn.Module):
        def __init__(self):
            super().__init__()
            enc = lambda cin: nn.ModuleList([
                nn.Linear(cin, 2 * H), nn.BatchNorm1d(2 * H),
                nn.Linear(2 * H, H), nn.BatchNorm1d(H)])
            self.ae, self.ce = enc(A), enc(C)
            self.aw = nn.Parameter(torch.tensor([0.5]))
            self.cw = nn.Parameter(torch.tensor([0.5]))
            self.fd = nn.Linear(2 * H, H)
            self.fb = nn.BatchNorm1d(H)
            self.h1 = nn.Linear(H, H // 2)
            self.h2 = nn.Linear(H // 2, 2)

        def run_enc(self, e, x):
            x = F.relu(e[1](e[0](x)))
            return F.relu(e[3](e[2](x)))

        def forward(self, a, c):
            af, cf = self.run_enc(self.ae, a), self.run_enc(self.ce, c)
            w = F.softmax(torch.cat([self.aw, self.cw]), dim=0)
            fused = F.relu(self.fb(self.fd(
                torch.cat([af * w[0], cf * w[1]], 1))))
            return self.h2(F.relu(self.h1(fused))), fused

    tmf = TorchFMRIFusion()
    with torch.no_grad():
        for enc, name in ((tmf.ae, "activation_encoder"),
                          (tmf.ce, "connectivity_encoder")):
            map_mlp(p[name]["mlp"], s[name]["mlp"],
                    [enc[0], enc[2]], [enc[1], enc[3]])
        tmf.aw.copy_(t(p["activation_weight"]))
        tmf.cw.copy_(t(p["connectivity_weight"]))
        map_mlp(p["fusion"], s["fusion"], [tmf.fd], [tmf.fb])
        map_dense(tmf.h1, p["head"]["dense"])
        map_dense(tmf.h2, p["head"]["out"])
    tmf.eval()

    out = model.apply(variables, activation=jnp.asarray(act),
                      connectivity=jnp.asarray(conn), train=False)
    with torch.no_grad():
        logits_t, fused_t = tmf(t(act), t(conn))
    np.testing.assert_allclose(np.asarray(out.logits), logits_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.fused), fused_t.numpy(),
                               rtol=1e-4, atol=1e-4)


BRIDGE_E, BRIDGE_F, BRIDGE_D = 20, 10, 16


class TorchBridge(nn.Module):
    def __init__(self):
        super().__init__()
        E, FD, D = BRIDGE_E, BRIDGE_F, BRIDGE_D
        self.ed = nn.Linear(E, D)
        self.el = nn.LayerNorm(D)
        self.fd = nn.Linear(FD, D)
        self.fl = nn.LayerNorm(D)
        self.cross = nn.MultiheadAttention(D, HEADS, batch_first=True)
        self.fusion = TorchLearnedFusion(2, D)
        self.c1 = nn.Linear(D, D // 2)
        self.cl = nn.LayerNorm(D // 2)
        self.c2 = nn.Linear(D // 2, 2)

    def forward(self, eeg, fmri):
        e = F.gelu(self.el(self.ed(eeg)))
        f = F.gelu(self.fl(self.fd(fmri)))
        seq = torch.stack([e, f], 1)
        enh, aw = self.cross(e.unsqueeze(1), seq, seq)
        fused, w = self.fusion([enh.squeeze(1), f])
        x = F.relu(self.cl(self.c1(fused)))
        return self.c2(x), fused, w, aw


def make_bridge_pair(seed=2):
    from multimodal_eeg_fmri_tpu.models import BridgeFusionNet

    E, FD, D = BRIDGE_E, BRIDGE_F, BRIDGE_D
    model = BridgeFusionNet(eeg_dim=E, fmri_dim=FD, bridge_dim=D,
                            num_heads=HEADS, dropout=0.0)
    r = np.random.default_rng(seed)
    eeg = r.standard_normal((B, E)).astype(np.float32)
    fmri = r.standard_normal((B, FD)).astype(np.float32)
    variables = model.init(jax.random.key(seed), eeg=jnp.asarray(eeg),
                           fmri=jnp.asarray(fmri), train=False)
    p = variables["params"]

    tb = TorchBridge()
    with torch.no_grad():
        map_dense(tb.ed, p["eeg_proj"]["dense"])
        map_ln(tb.el, p["eeg_proj"]["ln"])
        map_dense(tb.fd, p["fmri_proj"]["dense"])
        map_ln(tb.fl, p["fmri_proj"]["ln"])
        map_mha(tb.cross, p["cross_attn"], BRIDGE_D)
        tb.fusion.logits.copy_(t(p["fusion"]["fusion_logits"]))
        tb.fusion.temperature.copy_(t(p["fusion"]["temperature"]))
        map_dense(tb.fusion.g1, p["fusion"]["gate1"])
        map_dense(tb.fusion.g2, p["fusion"]["gate2"])
        map_dense(tb.c1, p["cls_dense"])
        map_ln(tb.cl, p["cls_ln"])
        map_dense(tb.c2, p["cls_out"])
    tb.eval()
    return model, variables, tb, (eeg, fmri)


def test_bridge_fullnet_forward_matches_torch():
    model, variables, tb, (eeg, fmri) = make_bridge_pair()

    out = model.apply(variables, eeg=jnp.asarray(eeg),
                      fmri=jnp.asarray(fmri), train=False)
    with torch.no_grad():
        logits_t, fused_t, w_t, aw_t = tb(t(eeg), t(fmri))
    np.testing.assert_allclose(np.asarray(out.logits), logits_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.fused), fused_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.fusion_weights), w_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.attn_weights),
                               aw_t.numpy(), rtol=1e-4, atol=1e-4)


def test_trimodal_v4_loss_curves_match_torch():
    """Train BOTH frameworks 10 steps from identical weights on identical
    batches (plain CE, AdamW) — the per-step loss curves must agree. This is
    end-to-end fwd+bwd+optimizer parity across every parameter of the net.

    Both sides run the forward in inference-mode normalization (frozen BN
    running stats, dropout off): the fusion gate hardcodes Dropout(0.2) in
    train mode (reference spec ``crossmodal_v4_enhancements.py:237``), and
    cross-framework dropout RNG cannot be aligned. Gradients still flow
    through every parameter including BN scale/bias."""
    import optax

    model, variables, tm, (erp, pw, conn) = make_trimodal_pair(seed=3)
    r = np.random.default_rng(4)
    labels = (r.uniform(size=B) > 0.5).astype(np.int64)
    lr, wd = 1e-3, 1e-2

    # jax side
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    opt_state = tx.init(params)
    yj = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats},
                erp=jnp.asarray(erp), pw=jnp.asarray(pw),
                conn=jnp.asarray(conn), train=False)
            logp = jax.nn.log_softmax(out.logits.astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(logp, yj[:, None], 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    # torch side: eval-mode normalization, training-mode gradients
    tm.eval()
    opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd,
                            betas=(0.9, 0.999), eps=1e-8)
    erp_t, pw_t, conn_t = (t(erp.transpose(0, 2, 1)),
                           t(pw.transpose(0, 2, 1)), t(conn))
    y_t = torch.tensor(labels)

    losses_j, losses_t = [], []
    for _ in range(10):
        params, opt_state, lj = step(params, opt_state)
        losses_j.append(float(lj))

        opt.zero_grad()
        logits, _, _ = tm(erp_t, pw_t, conn_t)
        lt = F.cross_entropy(logits, y_t)
        lt.backward()
        opt.step()
        losses_t.append(float(lt.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)
    # and the curve actually moves (guards against a trivially-flat match)
    assert losses_j[-1] != losses_j[0]


# ---------------------------------------------------------------------------
# attribution parity: framework xai vs the reference's exact estimators,
# run on the weight-identical torch replicas
# ---------------------------------------------------------------------------

def _torch_one_hot_backward(logits, targets):
    one_hot = torch.zeros_like(logits)
    one_hot.scatter_(1, targets.view(-1, 1), 1)
    logits.backward(gradient=one_hot)


def _torch_saliency_trimodal(tm, erp_t, pw_t, conn_t, targets):
    """The reference estimator verbatim in behavior: one forward, one-hot
    backward, abs gradients (``eeg_xai_analysis.py:97-135``)."""
    erp_t = erp_t.clone().detach().requires_grad_(True)
    pw_t = pw_t.clone().detach().requires_grad_(True)
    conn_t = conn_t.clone().detach().requires_grad_(True)
    logits, _, _ = tm(erp_t, pw_t, conn_t)
    tm.zero_grad()
    _torch_one_hot_backward(logits, targets)
    return {k: v.grad.abs().numpy()
            for k, v in {"erp": erp_t, "pw": pw_t, "conn": conn_t}.items()}


def _torch_ig_trimodal(tm, erp_t, pw_t, conn_t, targets, n_steps=50):
    """The reference IG estimator: 50-step zero-baseline Riemann mean over
    ``np.linspace(0, 1, 50)``, with conn held at FULL value each step but
    still multiplied into the attribution
    (``eeg_xai_analysis.py:168-236``)."""
    erp_b, pw_b = torch.zeros_like(erp_t), torch.zeros_like(pw_t)
    erp_d, pw_d = erp_t - erp_b, pw_t - pw_b
    grads = {"erp": [], "pw": [], "conn": []}
    for alpha in np.linspace(0, 1, n_steps):
        erp_i = (erp_b + alpha * erp_d).detach().requires_grad_(True)
        pw_i = (pw_b + alpha * pw_d).detach().requires_grad_(True)
        conn_i = conn_t.clone().detach().requires_grad_(True)
        logits, _, _ = tm(erp_i, pw_i, conn_i)
        tm.zero_grad()
        _torch_one_hot_backward(logits, targets)
        grads["erp"].append(erp_i.grad.numpy())
        grads["pw"].append(pw_i.grad.numpy())
        grads["conn"].append(conn_i.grad.numpy())
    return {
        "erp": np.abs(erp_d.numpy() * np.mean(grads["erp"], axis=0)),
        "pw": np.abs(pw_d.numpy() * np.mean(grads["pw"], axis=0)),
        "conn": np.abs(conn_t.numpy() * np.mean(grads["conn"], axis=0)),
    }


def test_trimodal_attribution_parity_torch():
    """Saliency, gradient×input and 50-step IG from ``xai/attribution.py``
    must VALUE-match the reference's exact estimators
    (``eeg_xai_analysis.py:97-236``) run on the weight-identical torch
    replica — all three modalities, ≤1e-4. Closes the round-2 gap where
    attributions were only self-consistency-tested."""
    from multimodal_eeg_fmri_tpu.xai.attribution import (
        gradient_saliency,
        gradient_x_input,
        integrated_gradients,
        make_apply_fn,
    )

    model, variables, tm, (erp, pw, conn) = make_trimodal_pair(seed=7)
    apply_fn = make_apply_fn(model, variables["params"],
                             variables["batch_stats"])
    inputs = {"erp": jnp.asarray(erp), "pw": jnp.asarray(pw),
              "conn": jnp.asarray(conn)}
    # fix the target class explicitly on both sides (the reference defaults
    # to argmax-at-first-evaluation, which for its IG is argmax at α=0 — a
    # baseline-input quirk; explicit targets compare the estimators proper)
    targets = np.argmax(np.asarray(apply_fn(inputs)), axis=-1)
    targets_t = torch.tensor(targets)
    erp_t, pw_t, conn_t = t(erp.transpose(0, 2, 1)), t(pw.transpose(0, 2, 1)), t(conn)

    def chlast(ref):  # torch replica is channels-first; framework last
        return {"erp": ref["erp"].transpose(0, 2, 1),
                "pw": ref["pw"].transpose(0, 2, 1), "conn": ref["conn"]}

    sal = gradient_saliency(apply_fn, inputs, jnp.asarray(targets))
    ref_sal = chlast(_torch_saliency_trimodal(tm, erp_t, pw_t, conn_t,
                                              targets_t))
    for k in ("erp", "pw", "conn"):
        np.testing.assert_allclose(np.asarray(sal[k]), ref_sal[k],
                                   rtol=1e-3, atol=1e-4, err_msg=f"sal {k}")

    gxi = gradient_x_input(apply_fn, inputs, jnp.asarray(targets))
    for k in ("erp", "pw", "conn"):
        # reference gradient_x_input = |grad| * |x| (:144-150) == |grad*x|
        np.testing.assert_allclose(
            np.asarray(gxi[k]),
            ref_sal[k] * np.abs(np.asarray(inputs[k])),
            rtol=1e-3, atol=1e-4, err_msg=f"gxi {k}")

    ig = integrated_gradients(apply_fn, inputs, jnp.asarray(targets),
                              n_steps=50, frozen_keys=("conn",))
    ref_ig = chlast(_torch_ig_trimodal(tm, erp_t, pw_t, conn_t, targets_t))
    for k in ("erp", "pw", "conn"):
        np.testing.assert_allclose(np.asarray(ig[k]), ref_ig[k],
                                   rtol=1e-3, atol=1e-4, err_msg=f"ig {k}")


def test_bridge_attribution_parity_torch():
    """Bridge saliency + IG vs the reference bridge estimators
    (``bridge_utils.py:158-229``) on the weight-identical replica."""
    from multimodal_eeg_fmri_tpu.xai.attribution import (
        gradient_saliency,
        integrated_gradients,
        make_apply_fn,
    )

    model, variables, tb, (eeg, fmri) = make_bridge_pair(seed=8)
    apply_fn = make_apply_fn(model, variables["params"])
    inputs = {"eeg": jnp.asarray(eeg), "fmri": jnp.asarray(fmri)}
    targets = np.argmax(np.asarray(apply_fn(inputs)), axis=-1)
    targets_t = torch.tensor(targets)
    eeg_t, fmri_t = t(eeg), t(fmri)

    # saliency (BridgeGradientSaliency.compute, :164-182)
    e_r = eeg_t.clone().detach().requires_grad_(True)
    f_r = fmri_t.clone().detach().requires_grad_(True)
    logits, _, _, _ = tb(e_r, f_r)
    tb.zero_grad()
    _torch_one_hot_backward(logits, targets_t)
    ref_sal = {"eeg": e_r.grad.abs().numpy(), "fmri": f_r.grad.abs().numpy()}

    sal = gradient_saliency(apply_fn, inputs, jnp.asarray(targets))
    for k in ("eeg", "fmri"):
        np.testing.assert_allclose(np.asarray(sal[k]), ref_sal[k],
                                   rtol=1e-3, atol=1e-4, err_msg=f"sal {k}")

    # IG (BridgeIntegratedGradients.compute, :196-229 — BOTH modalities
    # interpolated; the framework's default form)
    grads = {"eeg": [], "fmri": []}
    for alpha in np.linspace(0, 1, 50):
        e_i = (alpha * eeg_t).detach().requires_grad_(True)
        f_i = (alpha * fmri_t).detach().requires_grad_(True)
        logits, _, _, _ = tb(e_i, f_i)
        tb.zero_grad()
        _torch_one_hot_backward(logits, targets_t)
        grads["eeg"].append(e_i.grad.numpy())
        grads["fmri"].append(f_i.grad.numpy())
    ref_ig = {k: np.abs(x.numpy() * np.mean(grads[k], axis=0))
              for k, x in (("eeg", eeg_t), ("fmri", fmri_t))}

    ig = integrated_gradients(apply_fn, inputs, jnp.asarray(targets),
                              n_steps=50)
    for k in ("eeg", "fmri"):
        np.testing.assert_allclose(np.asarray(ig[k]), ref_ig[k],
                                   rtol=1e-3, atol=1e-4, err_msg=f"ig {k}")
