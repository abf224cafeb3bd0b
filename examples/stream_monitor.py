"""Continuous-monitoring demo: raw EEG chunks → online features → served
per-epoch predictions.

The deployment story the offline pipelines can't tell: a bedside stream
arrives in 200 ms chunks; the causal featurizer (`data/streaming.py`)
carries filter state across chunks and emits the tri-modal feature set at
every completed 1 s epoch, which a compiled `serving.Predictor` scores
immediately. Runs in ~1-2 min on CPU (`--cpu`) or on a TPU chip as-is.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from multimodal_eeg_fmri_tpu.data import (
        make_streaming_featurizer,
        stream_session,
    )
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.serving import Predictor

    FS, EPOCH, CHUNK, C = 250.0, 250, 50, 18

    # --- a model to serve (random init here; in production load a fold
    # checkpoint via Predictor.from_checkpoint / .from_quantized) ---
    model = TriModalFusionNetV4Lite()
    r = np.random.default_rng(0)
    init, step = make_streaming_featurizer(fs=FS, epoch_len=EPOCH,
                                           chunk_len=CHUNK)

    # synth a "live" recording: alpha-band burst in the second half
    t = np.arange(args.seconds * int(FS)) / FS
    raw = r.standard_normal((len(t), C)).astype(np.float32)
    burst = (t > args.seconds / 2).astype(np.float32)
    raw += 2.0 * (burst * np.sin(2 * np.pi * 10.0 * t))[:, None]

    # --- one compiled scan replays the stream; in live use the same
    # `step` is called once per arriving chunk ---
    outs = stream_session(jnp.asarray(raw), CHUNK, init, step)
    ready = np.asarray(outs["ready"])
    erp = np.asarray(outs["erp"])[ready]
    pw = np.asarray(outs["pw"])[ready]
    conn = np.asarray(outs["conn"])[ready]
    print(f"{len(t)} samples → {ready.sum()} epochs "
          f"(erp {erp.shape}, pw {pw.shape}, conn {conn.shape})")

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        erp=jnp.asarray(erp[:1]), pw=jnp.asarray(pw[:1]),
        conn=jnp.asarray(conn[:1]), train=False)
    served = Predictor(model, variables["params"],
                       variables.get("batch_stats"), batch_size=4)
    probs = served(erp=erp, pw=pw, conn=conn)
    for e, p in enumerate(probs):
        marker = "*" if p[1] > 0.5 else " "
        print(f"epoch {e:2d}  p(poor outcome) = {p[1]:.3f} {marker}")


if __name__ == "__main__":
    main()
