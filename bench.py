"""Headline benchmark suite — all three BASELINE.json metric-line numbers.

BASELINE.json metric line: "EEG epochs/sec + fMRI volumes/sec preprocessed;
fused train step ms/batch". This measures:

1. ``fused_eeg_fmri_train_step`` (headline): one jitted step with on-device
   preprocessing (z-score + EEG augmentation) → EEG tri-modal V4 stack →
   fMRI fusion encoder → bridge head → loss → backward → clip → AdamW, on
   production shapes (batch 8, ERP (8,250,18), PW (8,250,75), CONN (8,459)).
2. ``eeg_epochs_per_sec``: the full raw featurizer (``data/raw.py``:
   SOS-cascade zero-phase band-pass + STFT band power + Hilbert
   PLV/COH/WPLI connectivity) — the FieldTrip-equivalent stage implied by
   ``EEG_CODE/eeg_data_utils.py:86-119``.
3. ``fmri_volumes_per_sec``: ``volumes_to_roi_features`` (normalize → ROI
   one-hot matmul → mean/std aggregate), reference
   ``fMRI_CODE/run_fmri_v11.py:99-104``.
4. ``raw_in_step_train_ms``: the north-star variant — the SAME train step
   but taking RAW continuous EEG and running band-pass/STFT/Hilbert
   featurization INSIDE the compiled step ("host NumPy/SciPy work
   disappears").

Prints ONE JSON line:
  {"metric": "fused_eeg_fmri_train_step", "value": ms, "unit": "ms/batch",
   "vs_baseline": 10/ms, "extra": {…metrics 2-4…}}
"""

from __future__ import annotations

import json
import time

import numpy as np

B, T = 8, 250


def _time_best(fn, reps=3):
    import jax

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def build_step(
    raw_eeg: bool = False,
    *,
    dropout: float = 0.3,
    num_transformer_layers: int = 2,
    augment: bool = True,
    forward_only: bool = False,
):
    """The fused train step. ``raw_eeg=True`` feeds raw continuous EEG and
    featurizes (band-pass + spectrogram band power + Hilbert connectivity)
    inside the step; otherwise inputs are precomputed features.

    The keyword knobs exist for ``benchmarks/step_ablation.py`` (cost
    attribution of the step, docs/DESIGN.md table); defaults reproduce the
    headline metric exactly.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_eeg_fmri_tpu.models import MultimodalEndToEnd
    from multimodal_eeg_fmri_tpu.ops.augment import augment_temporal
    from multimodal_eeg_fmri_tpu.ops.losses import cross_entropy

    model = MultimodalEndToEnd(dropout=dropout,
                               num_transformer_layers=num_transformer_layers)
    r = np.random.default_rng(0)
    if not augment:
        augment_temporal = lambda k, x: x  # noqa: E731 — ablation knob

    def zscore(x):
        mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
        sd = jnp.std(x, axis=(-2, -1), keepdims=True)
        return (x - mu) / (sd + 1e-8)

    if raw_eeg:
        from multimodal_eeg_fmri_tpu.data.raw import make_raw_eeg_featurizer

        featurize = make_raw_eeg_featurizer(fs=250.0, epoch_len=T)
        batch = {
            "raw": jnp.asarray(r.standard_normal((B, T, 18)), jnp.float32),
            "activation": jnp.asarray(r.standard_normal((B, 90)), jnp.float32),
            "connectivity": jnp.asarray(r.standard_normal((B, 64)), jnp.float32),
            "label": jnp.asarray(r.integers(0, 2, B), jnp.int32),
        }

        def derive_inputs(batch, k_aug):
            feats = featurize(batch["raw"])  # erp/pw/conn on device
            return {
                "erp": augment_temporal(k_aug, zscore(feats["erp"])),
                "pw": augment_temporal(jax.random.fold_in(k_aug, 1),
                                       zscore(feats["pw"])),
                "conn": feats["conn"],
                "activation": batch["activation"],
                "connectivity": batch["connectivity"],
            }
    else:
        batch = {
            "erp": jnp.asarray(r.standard_normal((B, T, 18)), jnp.float32),
            "pw": jnp.asarray(r.standard_normal((B, T, 75)), jnp.float32),
            "conn": jnp.asarray(r.standard_normal((B, 459)), jnp.float32),
            "activation": jnp.asarray(r.standard_normal((B, 90)), jnp.float32),
            "connectivity": jnp.asarray(r.standard_normal((B, 64)), jnp.float32),
            "label": jnp.asarray(r.integers(0, 2, B), jnp.int32),
        }

        def derive_inputs(batch, k_aug):
            inputs = {k: v for k, v in batch.items() if k != "label"}
            inputs["erp"] = augment_temporal(k_aug, zscore(inputs["erp"]))
            inputs["pw"] = augment_temporal(
                jax.random.fold_in(k_aug, 1), zscore(inputs["pw"]))
            return inputs

    example = derive_inputs(
        jax.tree_util.tree_map(jnp.asarray, batch), jax.random.key(9))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        **example, train=True,
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

    def cast(tree):
        if not bf16:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def loss_fn(params, batch_stats, batch, rng):
        k_aug, k_drop = jax.random.split(rng)
        # on-device preprocessing fused into the step
        inputs = derive_inputs(batch, k_aug)
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
        if forward_only:
            loss, bs = loss_fn(params, batch_stats, batch, rng)
            return (params, bs, opt_state), loss
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


def bench_train_step(raw_eeg: bool = False, rng_impl: str = "rbg",
                     **variant) -> float:
    """ms per fused train step (the framework trains via this same
    on-device scan — train/fit.py — so this is the deployed shape)."""
    import jax

    from multimodal_eeg_fmri_tpu.core.rng import training_key

    run_steps, (params, batch_stats, opt_state) = build_step(raw_eeg,
                                                             **variant)
    # rbg PRNG for dropout/augment: threefry mask generation was measured
    # at 0.74 ms of the 1.86 ms step (core/rng.training_key docstring)
    rng = (training_key(0) if rng_impl == "rbg"
           else jax.random.key(0))  # threefry: the ablation comparator
    K = 100  # steps per device call

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
    return best / K * 1000.0


def bench_eeg_featurizer() -> float:
    """EEG epochs/sec through the full raw featurizer."""
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.data.raw import make_raw_eeg_featurizer

    N, T_raw, C, epoch_len = 16, 2500, 18, 250  # 10 epochs per recording
    n_epochs = N * (T_raw // epoch_len)
    featurize = make_raw_eeg_featurizer(fs=250.0, epoch_len=epoch_len)
    raw = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, T_raw, C)), jnp.float32)
    featurize(raw)  # compile
    best = _time_best(lambda: featurize(raw))
    return n_epochs / best


def bench_fmri_volumes() -> dict:
    """fMRI volumes/sec through normalize → ROI timeseries → aggregate.

    Two numbers: end-to-end from host memory (includes the 315 MB BOLD
    host→device transfer — under the axon tunnel this measures mostly
    link bandwidth), and device-resident (the pipeline's actual rate once
    the run is uploaded, i.e. production steady-state on a real host)."""
    import jax
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.data.nifti import (
        _roi_pipeline, volumes_to_roi_features)

    r = np.random.default_rng(2)
    X, Y, Z, T_vol, R = 64, 64, 40, 120, 90
    bold = r.standard_normal((X, Y, Z, T_vol)).astype(np.float32)
    atlas = r.integers(0, R + 1, (X, Y, Z)).astype(np.int32)
    volumes_to_roi_features(bold, atlas, n_rois=R)  # compile
    best = _time_best(lambda: volumes_to_roi_features(bold, atlas, n_rois=R))

    # device-resident: perturb the input each rep (the tunnel memoizes
    # repeated identical executions — CLAUDE.md benchmarking gotcha) and
    # sync via a host scalar fetch
    flat = jnp.asarray(np.moveaxis(bold, -1, 0).reshape(T_vol, -1))
    labels = jnp.asarray(atlas.reshape(-1).astype(np.int32))
    pipe = _roi_pipeline("both")
    jax.block_until_ready(pipe(flat, labels, R))
    best_dev = float("inf")
    for i in range(1, 4):
        t0 = time.perf_counter()
        float(pipe(flat + 1e-3 * i, labels, R).ravel()[0])
        best_dev = min(best_dev, time.perf_counter() - t0)
    return {"host": T_vol / best, "device": T_vol / best_dev}


def _probe_backend(timeout_s: int = 240) -> str:
    """Check (in a SUBPROCESS — a wedged tunnel hangs backend init
    uninterruptibly in C, so an in-process timeout cannot fire) whether
    the default backend comes up AND answers a real computation: a
    half-recovered tunnel has been observed to register the platform,
    list devices, and then hang on the first executed op — probing
    ``jax.devices()`` alone would green-light a bench run that wedges.
    Returns the platform to use."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "assert float(jnp.ones(3).sum()) == 3.0; "
             "print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return "cpu"


def main():
    # The remote-TPU tunnel has had multi-hour outages where backend init
    # HANGS (not errors). Probe first; if the TPU is unreachable, pin the
    # CPU backend so the run still produces a parseable metric line, with
    # the platform recorded (a CPU number is not comparable to the
    # baseline — the "platform" field flags it).
    platform = _probe_backend()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from multimodal_eeg_fmri_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    # the remote-TPU tunnel occasionally drops a run with a transient
    # backend error (observed: FAILED_PRECONDITION mid-fetch); never lose
    # the headline metric to one hiccup
    last_err = None
    for _ in range(3):
        try:
            ms = bench_train_step(raw_eeg=False)
            break
        except Exception as e:
            last_err = e
            time.sleep(10)
    else:
        raise last_err

    extra = {}
    for key, fn in (
        ("eeg_epochs_per_sec", bench_eeg_featurizer),
        ("fmri_volumes_per_sec", bench_fmri_volumes),
        ("raw_in_step_train_ms", lambda: bench_train_step(raw_eeg=True)),
    ):
        try:
            out = fn()
            if isinstance(out, dict):  # host + device-resident variants
                extra[key] = round(float(out["host"]), 4)
                extra[key + "_device"] = round(float(out["device"]), 4)
            else:
                extra[key] = round(float(out), 4)
        except Exception as e:  # never lose the headline number
            extra[key] = f"error: {type(e).__name__}: {e}"

    print(json.dumps(result_line(ms, extra, platform)))


def result_line(ms: float, extra: dict, platform: str) -> dict:
    """The one-line JSON payload. The 10 ms baseline is a TPU number; a
    CPU-fallback run (tunnel outage) must not be misread as a 100x
    regression — the comparison is nulled instead of computed."""
    extra = dict(extra)
    extra["platform"] = platform
    return {
        "metric": "fused_eeg_fmri_train_step",
        "value": round(ms, 4),
        "unit": "ms/batch",
        "vs_baseline": None if platform == "cpu" else round(10.0 / ms, 3),
        "extra": extra,
    }


if __name__ == "__main__":
    main()
