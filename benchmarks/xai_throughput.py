"""XAI throughput: the reference's inner hot loop, measured.

The reference bridge LOOCV runs per-subject XAI inside the fold loop
(`/root/reference/_test_bridge.py:912-953`): gradient saliency (1 fwd+bwd)
plus 50-step integrated gradients (50 separate fwd+bwd calls) for each of
32 held-out subjects — 32 × 51 sequential autograd passes per experiment.

This framework computes the SAME estimator as one compiled program:
`xai/attribution.integrated_gradients` vmaps the α axis, and the batch
axis carries all 32 subjects, so the whole sweep is a single device call
(32 × 50 fwd+bwd fused by XLA).

Three timed paths on the bridge net (eeg 128-d / fmri 64-d, 32 subjects):
1. framework: one call, all subjects × all α steps;
2. "translated" TPU loop: jitted 50-step IG per subject, 32 dispatches —
   what a mechanical port of the reference loop would do;
3. torch CPU loop: the reference's literal estimator (50 separate
   backward passes per subject) on an equivalent-size torch net.

Timing on TPU uses the tunnel-safe protocol (docs/DESIGN.md "Benchmarking
gotcha"): host scalar fetch as the sync, inputs perturbed ≥1e-3 per rep so
the tunnel cannot memoize, best-of-N with the ~25-30 ms link floor
reported alongside.

Run: ``python benchmarks/xai_throughput.py`` (single v5e chip or CPU).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SUBJECTS, EEG_D, FMRI_D, N_STEPS = 32, 128, 64, 50
REPS = 6


def _best(fn, reps=REPS):
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        fn(i)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_framework():
    import jax
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.models.bridge import BridgeFusionNet
    from multimodal_eeg_fmri_tpu.xai.attribution import (
        gradient_saliency,
        integrated_gradients,
    )

    model = BridgeFusionNet(eeg_dim=EEG_D, fmri_dim=FMRI_D, dropout=0.0)
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((N_SUBJECTS, EEG_D)).astype(np.float32)
    fmri = rng.standard_normal((N_SUBJECTS, FMRI_D)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        eeg=jnp.asarray(eeg), fmri=jnp.asarray(fmri), train=False)

    def apply_fn(inputs):
        return model.apply(variables, **inputs, train=False).logits

    @jax.jit
    def full_sweep(inputs):
        sal = gradient_saliency(apply_fn, inputs)
        ig = integrated_gradients(apply_fn, inputs, n_steps=N_STEPS)
        # host fetch of one scalar = the sync
        return ig["eeg"].sum() + sal["eeg"].sum()

    @jax.jit
    def one_subject(inputs):
        sal = gradient_saliency(apply_fn, inputs)
        ig = integrated_gradients(apply_fn, inputs, n_steps=N_STEPS)
        return ig["eeg"].sum() + sal["eeg"].sum()

    def run_batched(i):
        inp = {"eeg": jnp.asarray(eeg + 1e-3 * (i + 1)),
               "fmri": jnp.asarray(fmri + 1e-3 * (i + 1))}
        return float(full_sweep(inp))

    def run_loop(i):
        tot = 0.0
        for s in range(N_SUBJECTS):
            inp = {"eeg": jnp.asarray(eeg[s:s + 1] + 1e-3 * (i + 1)),
                   "fmri": jnp.asarray(fmri[s:s + 1] + 1e-3 * (i + 1))}
            tot += float(one_subject(inp))
        return tot

    run_batched(0)  # compile
    run_loop(-0.5)  # compile (distinct perturbation so nothing memoizes)
    return _best(run_batched), _best(run_loop)


def bench_torch_cpu():
    import torch
    import torch.nn as nn

    # equivalent-parameter-count stand-in for the bridge net (projections +
    # MHA + head), driven by the reference's literal IG loop
    # (`bridge_utils.py:189-229`: 50 separate backward passes per subject)
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.pe = nn.Linear(EEG_D, 128)
            self.pf = nn.Linear(FMRI_D, 128)
            self.attn = nn.MultiheadAttention(128, 4, batch_first=True)
            self.head = nn.Sequential(nn.Linear(256, 64), nn.GELU(),
                                      nn.Linear(64, 2))

        def forward(self, eeg, fmri):
            e, f = self.pe(eeg), self.pf(fmri)
            kv = torch.stack([e, f], 1)
            a, _ = self.attn(e[:, None], kv, kv)
            return self.head(torch.cat([a[:, 0], f], -1))

    net = Net().eval()
    rng = np.random.default_rng(0)
    eeg = torch.tensor(rng.standard_normal((N_SUBJECTS, EEG_D)),
                       dtype=torch.float32)
    fmri = torch.tensor(rng.standard_normal((N_SUBJECTS, FMRI_D)),
                        dtype=torch.float32)

    def run(i):
        tot = 0.0
        for s in range(N_SUBJECTS):
            e0, f0 = eeg[s:s + 1] + 1e-3 * i, fmri[s:s + 1] + 1e-3 * i
            # saliency: 1 fwd+bwd
            e = e0.clone().requires_grad_(True)
            f = f0.clone().requires_grad_(True)
            out = net(e, f)
            out[0, out.argmax().item()].backward()
            tot += float(e.grad.abs().sum())
            # IG: 50 separate fwd+bwd (reference loop)
            grads = torch.zeros_like(e0)
            for k in range(N_STEPS):
                alpha = k / N_STEPS
                e = (alpha * e0).clone().requires_grad_(True)
                f = (alpha * f0).clone().requires_grad_(True)
                out = net(e, f)
                out[0, out.argmax().item()].backward()
                grads += e.grad
            tot += float((e0 * grads / N_STEPS).abs().sum())
        return tot

    run(0)  # warm
    return _best(run, reps=3)


def main():
    import json

    batched_s, loop_s = bench_framework()
    torch_s = bench_torch_cpu()
    import jax

    result = {
        "metric": "xai_throughput",
        "backend": jax.default_backend(),
        "framework_batched_ms": round(batched_s * 1e3, 2),
        "tpu_per_subject_loop_ms": round(loop_s * 1e3, 2),
        "torch_cpu_reference_loop_ms": round(torch_s * 1e3, 2),
        "speedup_vs_tpu_loop": round(loop_s / batched_s, 1),
        "speedup_vs_torch_cpu": round(torch_s / batched_s, 1),
        "subjects": N_SUBJECTS,
        "ig_steps": N_STEPS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
