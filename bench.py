"""Headline benchmark: fused EEG+fMRI training step, ms/batch.

BASELINE.json north star: "full EEG+fMRI fusion training step < 10 ms/batch
on v5e-8 with preprocessing on-device". This measures exactly that step on
the available chip(s): one jitted step containing

  on-device preprocessing (z-score + EEG augmentation)
  → EEG tri-modal V4 encoder stack (conv + transformer + cross-attention)
  → fMRI bi-modal fusion encoder
  → bridge cross-modal fusion head
  → loss → backward → global-norm clip → AdamW update

on production shapes (batch 8, ERP (8,250,18), PW (8,250,75), CONN (8,459),
fMRI activation (8,90) + connectivity (8,64) — SURVEY §0/§6 dims).

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_step, "unit": "ms/batch", "vs_baseline": x}
where vs_baseline = 10 ms / measured ms (>1 = faster than the target).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_step():
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_eeg_fmri_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_eeg_fmri_tpu.models import MultimodalEndToEnd
    from multimodal_eeg_fmri_tpu.ops.augment import augment_temporal
    from multimodal_eeg_fmri_tpu.ops.losses import cross_entropy

    B, T = 8, 250
    model = MultimodalEndToEnd()

    r = np.random.default_rng(0)
    batch = {
        "erp": jnp.asarray(r.standard_normal((B, T, 18)), jnp.float32),
        "pw": jnp.asarray(r.standard_normal((B, T, 75)), jnp.float32),
        "conn": jnp.asarray(r.standard_normal((B, 459)), jnp.float32),
        "activation": jnp.asarray(r.standard_normal((B, 90)), jnp.float32),
        "connectivity": jnp.asarray(r.standard_normal((B, 64)), jnp.float32),
        "label": jnp.asarray(r.integers(0, 2, B), jnp.int32),
    }

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **{k: v for k, v in batch.items() if k != "label"}, train=True,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-5, weight_decay=1e-5))
    opt_state = tx.init(params)

    import os

    # measured on v5e: bf16 is ~5% SLOWER at these tiny shapes (batch 8,
    # d=128 — the step is latency/VPU-bound, not MXU-bound), so f32 is the
    # default; flip for larger production shapes.
    bf16 = os.environ.get("BENCH_BF16", "0") == "1"

    def zscore(x):
        mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
        sd = jnp.std(x, axis=(-2, -1), keepdims=True)
        return (x - mu) / (sd + 1e-8)

    def cast(tree):
        if not bf16:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def loss_fn(params, batch_stats, batch, rng):
        k_aug, k_drop = jax.random.split(rng)
        inputs = {k: v for k, v in batch.items() if k != "label"}
        # on-device preprocessing fused into the step
        inputs["erp"] = augment_temporal(k_aug, zscore(inputs["erp"]))
        inputs["pw"] = augment_temporal(
            jax.random.fold_in(k_aug, 1), zscore(inputs["pw"]))
        # bf16 compute, f32 master params (mirrors train/fit.py)
        out, mut = model.apply(
            {"params": cast(params), "batch_stats": batch_stats},
            **cast(inputs),
            train=True, rngs={"dropout": k_drop}, mutable=["batch_stats"],
        )
        new_bs = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), mut["batch_stats"], batch_stats)
        return cross_entropy(out.logits, batch["label"]), new_bs

    def step(carry, rng):
        params, batch_stats, opt_state = carry
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, bs, opt_state), loss

    @jax.jit
    def run_steps(params, batch_stats, opt_state, rngs):
        (p, bs, os_), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), rngs)
        return p, bs, os_, losses

    return run_steps, (params, batch_stats, opt_state)


def main():
    import jax

    run_steps, (params, batch_stats, opt_state) = build_step()
    rng = jax.random.key(0)
    K = 100  # steps per device call — the framework trains via this same
    #          on-device scan (train/fit.py), so this is the deployed shape.

    def rngs(i):
        return jax.random.split(jax.random.fold_in(rng, i), K)

    # warmup / compile
    p, bs, os_, losses = run_steps(params, batch_stats, opt_state, rngs(0))
    jax.block_until_ready(losses)

    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        p, bs, os_, losses = run_steps(p, bs, os_, rngs(rep))
        jax.block_until_ready(losses)
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000.0

    print(json.dumps({
        "metric": "fused_eeg_fmri_train_step",
        "value": round(ms, 4),
        "unit": "ms/batch",
        "vs_baseline": round(10.0 / ms, 3),
    }))


if __name__ == "__main__":
    main()
