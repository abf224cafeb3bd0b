"""GNN connectivity path tests.

The reference builds a sparse ``edge_index`` from connectivity > 0.5 and
runs GATv2 per sample in a Python loop
(``enhanced_models_v4.py:292-413``). ``GraphConnEncoder`` claims the same
computation as batched dense masked attention; these tests prove it:

1. a per-sample, per-edge numpy oracle (explicit sparse neighbor loops)
   must match the batched dense encoder bit-for-bit (f32 tolerance);
2. ``TriModalFusionNetGNN`` must train above chance on the separable
   synthetic task (the reference's smoke test,
   ``enhanced_models_v4.py:844-890``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.models.encoders import GraphConnEncoder


def numpy_gat_oracle(params, conn, hidden_dim, num_heads, threshold):
    """Sparse per-sample GAT, mirroring the reference's per-sample loop.

    For each sample: build the neighbor list from any-metric > threshold
    (+ self loops), then for each layer compute
    score(i,j) = leaky_relu(a_src·Wh_i + a_dst·Wh_j) per head, softmax over
    each node's NEIGHBORS ONLY, aggregate messages, ELU. Mean-pool, project,
    exact erf GELU.
    """
    B, N, _, M = conn.shape
    dh = hidden_dim // num_heads

    def leaky(x, s=0.2):
        return np.where(x >= 0, x, s * x)

    outs = []
    for b in range(B):  # per-sample, like the reference
        adj = (conn[b] > threshold).any(-1) | np.eye(N, dtype=bool)
        h = conn[b].transpose(0, 2, 1).reshape(N, M * N)
        h = h @ np.asarray(params["embed"]["kernel"]) + np.asarray(
            params["embed"]["bias"])
        for layer in range(2):
            hw = h @ np.asarray(params[f"W_{layer}"]["kernel"])
            a_src = hw @ np.asarray(params[f"a_src_{layer}"]["kernel"])
            a_dst = hw @ np.asarray(params[f"a_dst_{layer}"]["kernel"])
            hd = hw.reshape(N, num_heads, dh)
            new_h = np.zeros((N, num_heads, dh), np.float64)
            for i in range(N):
                nbrs = np.where(adj[i])[0]  # sparse neighbor set
                for hqd in range(num_heads):
                    s = leaky(a_src[i, hqd] + a_dst[nbrs, hqd])
                    alpha = np.exp(s - s.max())
                    alpha /= alpha.sum()
                    new_h[i, hqd] = alpha @ hd[nbrs, hqd]
            z = new_h.reshape(N, hidden_dim)
            h = np.where(z > 0, z, np.expm1(np.minimum(z, 0.0)))  # ELU
        g = h.mean(0)
        g = g @ np.asarray(params["proj"]["kernel"]) + np.asarray(
            params["proj"]["bias"])
        from scipy.special import erf

        g = 0.5 * g * (1.0 + erf(g / np.sqrt(2.0)))  # exact GELU
        outs.append(g)
    return np.stack(outs)


def test_graph_conn_encoder_matches_sparse_oracle():
    hidden, heads, thr = 32, 4, 0.5
    enc = GraphConnEncoder(hidden_dim=hidden, num_heads=heads, threshold=thr,
                           dropout=0.0)
    rng = np.random.default_rng(0)
    B, N, M = 5, 18, 3
    conn = rng.uniform(0, 1, (B, N, N, M)).astype(np.float32)
    conn = ((conn + conn.transpose(0, 2, 1, 3)) / 2).astype(np.float32)

    variables = enc.init(jax.random.key(0), jnp.asarray(conn), train=False)
    got = np.asarray(enc.apply(variables, jnp.asarray(conn), train=False))
    want = numpy_gat_oracle(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        conn.astype(np.float64), hidden, heads, thr)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_graph_conn_encoder_threshold_masks_edges():
    """Below-threshold edges must not leak messages: with threshold > max
    value, every node only sees itself, so permuting OTHER rows of a node's
    non-self connectivity must not change that via attention (features still
    change, but an all-self-loop graph equals per-node independent
    computation)."""
    enc = GraphConnEncoder(hidden_dim=16, num_heads=2, threshold=2.0,
                           dropout=0.0)
    rng = np.random.default_rng(1)
    conn = rng.uniform(0, 1, (2, 6, 6, 1)).astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(conn), train=False)

    # with only self-loops, attention weights are exactly 1 on self —
    # the oracle reduces to per-node MLP; compare against it
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    got = np.asarray(enc.apply(variables, jnp.asarray(conn), train=False))
    want = numpy_gat_oracle(params, conn.astype(np.float64), 16, 2, 2.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_trimodal_gnn_trains_above_chance():
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetGNN
    from multimodal_eeg_fmri_tpu.train import evaluate_dataset, make_fit_fn

    data = synthetic_eeg_trimodal(
        n_subjects=48, time_steps=16, separation=1.5, seed=3,
        conn_as_matrix=True, n_nodes=8, n_metrics=2)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(36)), 36)
    test = pad_rows(subset(data, np.arange(36, 48)), 12)

    cfg = TrainConfig(batch_size=12, num_epochs=25, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    model = TriModalFusionNetGNN(hidden_dim=16, num_transformer_layers=1,
                                 num_heads=2, dropout=0.1)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    res = fit(jax.random.key(0), to_dev(train), {}, None)

    losses = np.asarray(res.history["train_loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it learns

    metrics, _ = evaluate_dataset(model, res.params, res.batch_stats,
                                  to_dev(test))
    assert float(metrics["accuracy"]) > 0.6  # above chance on separable task
