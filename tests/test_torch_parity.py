"""Torch-oracle parity for representative blocks.

The reference is torch; these tests build torch implementations FROM THE
SPEC (the documented math of each block — not the reference's code), load
identical weights into both frameworks, and assert the forwards agree.
This pins down subtle semantics: softmax temperature mixing in the learned
fusion, torch-MultiheadAttention head averaging, AdamW update math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_learned_fusion_matches_torch_spec():
    """fused = Σ_m [0.5·softmax(logits/T) + 0.5·softmax(gate(x)/T)]_m · x_m"""
    from multimodal_eeg_fmri_tpu.models.fusion import LearnedFusion

    B, D, M = 5, 16, 3
    r = np.random.default_rng(0)
    feats = [r.standard_normal((B, D)).astype(np.float32) for _ in range(M)]

    mod = LearnedFusion(M, D)
    variables = mod.init({"params": jax.random.key(0)},
                         [jnp.asarray(f) for f in feats], train=False)
    p = variables["params"]

    # torch spec implementation with the SAME weights
    import torch.nn.functional as F

    logits = torch.tensor(np.asarray(p["fusion_logits"]))
    temp = torch.tensor(np.asarray(p["temperature"]))
    w1 = torch.tensor(np.asarray(p["gate1"]["kernel"]))  # (in, hidden)
    b1 = torch.tensor(np.asarray(p["gate1"]["bias"]))
    w2 = torch.tensor(np.asarray(p["gate2"]["kernel"]))
    b2 = torch.tensor(np.asarray(p["gate2"]["bias"]))

    x = [torch.tensor(f) for f in feats]
    static_w = F.softmax(logits / temp, dim=0)
    concat = torch.cat(x, dim=1)
    gate = F.gelu(concat @ w1 + b1) @ w2 + b2
    dyn_w = F.softmax(gate / temp, dim=1)
    comb = 0.5 * static_w.unsqueeze(0) + 0.5 * dyn_w
    fused_t = (torch.stack(x, 1) * comb.unsqueeze(2)).sum(1)

    fused_j, weights_j = mod.apply(variables,
                                   [jnp.asarray(f) for f in feats],
                                   train=False)
    np.testing.assert_allclose(np.asarray(fused_j), fused_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights_j), comb.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_multihead_attention_matches_torch():
    """Our MHA must agree with torch.nn.MultiheadAttention given the same
    projection weights (incl. the head-averaged attention output)."""
    from multimodal_eeg_fmri_tpu.models.layers import MultiHeadAttention

    B, T, D, H = 2, 6, 16, 4
    r = np.random.default_rng(1)
    x = r.standard_normal((B, T, D)).astype(np.float32)

    mod = MultiHeadAttention(num_heads=H, dropout=0.0)
    variables = mod.init({"params": jax.random.key(0)},
                         jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                         train=False)
    p = variables["params"]

    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    with torch.no_grad():
        # flax DenseGeneral q/k/v kernels: (D, H, hd) → torch packed (3D, D)
        def packed(name):
            k = np.asarray(p[name]["kernel"]).reshape(D, D)
            b = np.asarray(p[name]["bias"]).reshape(D)
            return k.T, b  # torch stores (out, in)

        qk, qb = packed("q_proj")
        kk, kb = packed("k_proj")
        vk, vb = packed("v_proj")
        mha.in_proj_weight.copy_(torch.tensor(np.concatenate([qk, kk, vk])))
        mha.in_proj_bias.copy_(torch.tensor(np.concatenate([qb, kb, vb])))
        # out_proj kernel: (H, hd, D) → (D, D); torch (out, in)
        ok = np.asarray(p["out_proj"]["kernel"]).reshape(D, D)
        mha.out_proj.weight.copy_(torch.tensor(ok.T))
        mha.out_proj.bias.copy_(torch.tensor(np.asarray(p["out_proj"]["bias"])))

        xt = torch.tensor(x)
        out_t, attn_t = mha(xt, xt, xt)

    out_j, attn_j = mod.apply(variables, jnp.asarray(x), jnp.asarray(x),
                              jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn_j), attn_t.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_transformer_block_matches_torch():
    """TransformerBlock == torch TransformerEncoderLayer(norm_first=True,
    gelu) with the same weights — the core temporal-modeling op."""
    from multimodal_eeg_fmri_tpu.models.layers import TransformerBlock

    B, T, D, H = 2, 7, 16, 4
    r = np.random.default_rng(3)
    x = r.standard_normal((B, T, D)).astype(np.float32)

    mod = TransformerBlock(d_model=D, num_heads=H, dropout=0.0)
    variables = mod.init({"params": jax.random.key(0)}, jnp.asarray(x),
                         train=False)
    p = variables["params"]

    layer = torch.nn.TransformerEncoderLayer(
        D, H, dim_feedforward=4 * D, dropout=0.0, activation="gelu",
        batch_first=True, norm_first=True)
    with torch.no_grad():
        ap = p["attn"]

        def dense_to_torch(sub):
            k = np.asarray(sub["kernel"]).reshape(D, -1)
            return k.T, np.asarray(sub["bias"]).reshape(-1)

        qk, qb = dense_to_torch(ap["q_proj"])
        kk, kb = dense_to_torch(ap["k_proj"])
        vk, vb = dense_to_torch(ap["v_proj"])
        layer.self_attn.in_proj_weight.copy_(
            torch.tensor(np.concatenate([qk, kk, vk])))
        layer.self_attn.in_proj_bias.copy_(
            torch.tensor(np.concatenate([qb, kb, vb])))
        ok = np.asarray(ap["out_proj"]["kernel"]).reshape(D, D)
        layer.self_attn.out_proj.weight.copy_(torch.tensor(ok.T))
        layer.self_attn.out_proj.bias.copy_(
            torch.tensor(np.asarray(ap["out_proj"]["bias"])))
        layer.linear1.weight.copy_(
            torch.tensor(np.asarray(p["ffn1"]["kernel"]).T))
        layer.linear1.bias.copy_(torch.tensor(np.asarray(p["ffn1"]["bias"])))
        layer.linear2.weight.copy_(
            torch.tensor(np.asarray(p["ffn2"]["kernel"]).T))
        layer.linear2.bias.copy_(torch.tensor(np.asarray(p["ffn2"]["bias"])))
        layer.norm1.weight.copy_(torch.tensor(np.asarray(p["norm1"]["scale"])))
        layer.norm1.bias.copy_(torch.tensor(np.asarray(p["norm1"]["bias"])))
        layer.norm2.weight.copy_(torch.tensor(np.asarray(p["norm2"]["scale"])))
        layer.norm2.bias.copy_(torch.tensor(np.asarray(p["norm2"]["bias"])))
        out_t = layer(torch.tensor(x))

    out_j = mod.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_fused_adamw_matches_torch():
    """The fused flat-vector AdamW (the compiled fit's optimizer) must equal
    torch.optim.AdamW over multiple steps, including the pytree round-trip."""
    from multimodal_eeg_fmri_tpu.ops.optim import (
        fused_adamw_step,
        init_fused_adamw,
    )

    r = np.random.default_rng(2)
    w0 = {"a": r.standard_normal((4, 3)).astype(np.float32),
          "b": {"c": r.standard_normal(7).astype(np.float32)}}
    lr, wd = 1e-3, 1e-2

    params = jax.tree_util.tree_map(jnp.asarray, w0)
    state = init_fused_adamw(params)

    ta = torch.nn.Parameter(torch.tensor(w0["a"].copy()))
    tc = torch.nn.Parameter(torch.tensor(w0["b"]["c"].copy()))
    opt = torch.optim.AdamW([ta, tc], lr=lr, weight_decay=wd,
                            betas=(0.9, 0.999), eps=1e-8)

    for step in range(3):
        ga = r.standard_normal((4, 3)).astype(np.float32) * 0.1
        gc = r.standard_normal(7).astype(np.float32) * 0.1
        grads = {"a": jnp.asarray(ga), "b": {"c": jnp.asarray(gc)}}
        params, state = fused_adamw_step(params, grads, state, lr, wd)
        opt.zero_grad()
        ta.grad = torch.tensor(ga)
        tc.grad = torch.tensor(gc)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["a"]),
                               ta.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]["c"]),
                               tc.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_conv_bn_block_matches_torch():
    """ConvBNBlock == torch Conv1d + BatchNorm1d(eval) + exact GELU with the
    same weights (channels-last ↔ channels-first transposed)."""
    from multimodal_eeg_fmri_tpu.models.encoders import ConvBNBlock

    B, T, Cin, Cout, K = 3, 20, 5, 8, 7
    r = np.random.default_rng(4)
    x = r.standard_normal((B, T, Cin)).astype(np.float32)

    mod = ConvBNBlock(features=Cout, kernel_size=K, dropout=0.0)
    variables = mod.init({"params": jax.random.key(0)}, jnp.asarray(x),
                         train=False)
    p = variables["params"]
    bs = variables["batch_stats"]

    conv = torch.nn.Conv1d(Cin, Cout, K, padding=K // 2)
    bn = torch.nn.BatchNorm1d(Cout).eval()
    with torch.no_grad():
        # flax conv kernel (K, Cin, Cout) → torch (Cout, Cin, K)
        kern = np.asarray(p["conv"]["kernel"]).transpose(2, 1, 0)
        conv.weight.copy_(torch.tensor(kern))
        conv.bias.copy_(torch.tensor(np.asarray(p["conv"]["bias"])))
        bn.weight.copy_(torch.tensor(np.asarray(p["bn"]["scale"])))
        bn.bias.copy_(torch.tensor(np.asarray(p["bn"]["bias"])))
        bn.running_mean.copy_(torch.tensor(np.asarray(bs["bn"]["mean"])))
        bn.running_var.copy_(torch.tensor(np.asarray(bs["bn"]["var"])))
        xt = torch.tensor(x.transpose(0, 2, 1))  # (B, Cin, T)
        out_t = torch.nn.functional.gelu(bn(conv(xt)))  # exact gelu

    out_j = mod.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 1),
                               rtol=2e-5, atol=2e-5)


def test_erp_encoder_v3_conv_stack_matches_torch():
    """A full V3 conv stack (conv+BN+GELU ×3 with max pools) matches the
    torch composition — validates pooling alignment and layout end-to-end."""
    from multimodal_eeg_fmri_tpu.models.encoders import ERPEncoderV3

    B, T, Cin = 2, 32, 6
    r = np.random.default_rng(5)
    x = r.standard_normal((B, T, Cin)).astype(np.float32)
    mod = ERPEncoderV3(hidden_dim=12, dropout=0.0)
    variables = mod.init({"params": jax.random.key(1)}, jnp.asarray(x),
                         train=False)
    p, bs = variables["params"], variables["batch_stats"]

    def torch_block(name, cin, cout, k):
        conv = torch.nn.Conv1d(cin, cout, k, padding=k // 2)
        bn = torch.nn.BatchNorm1d(cout).eval()
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(
                np.asarray(p[name]["conv"]["kernel"]).transpose(2, 1, 0)))
            conv.bias.copy_(torch.tensor(
                np.asarray(p[name]["conv"]["bias"])))
            bn.weight.copy_(torch.tensor(np.asarray(p[name]["bn"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(p[name]["bn"]["bias"])))
            bn.running_mean.copy_(torch.tensor(
                np.asarray(bs[name]["bn"]["mean"])))
            bn.running_var.copy_(torch.tensor(
                np.asarray(bs[name]["bn"]["var"])))
        return lambda t: torch.nn.functional.gelu(bn(conv(t)))

    b1 = torch_block("conv1", Cin, 64, 7)
    b2 = torch_block("conv2", 64, 128, 5)
    b3 = torch_block("conv3", 128, 12, 3)
    with torch.no_grad():
        t = torch.tensor(x.transpose(0, 2, 1))
        t = torch.nn.functional.max_pool1d(b1(t), 2)
        t = torch.nn.functional.max_pool1d(b2(t), 2)
        t = b3(t)
        out_t = t.mean(-1)  # mean over time

    out_j = mod.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-5, atol=2e-5)
