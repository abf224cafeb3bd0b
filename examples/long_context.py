"""Long-context headroom: the three mechanisms that carry attention past the
reference's ≤250-timestep regime, composed on an 8-device mesh.

The reference caps sequences at 5000 steps and truncates beyond
(`EEG_CODE/CrossModal_EEG_scr.ipynb §41`); attention is full quadratic, so
T=8192 would need a 17 GB logits tensor and OOMs. This framework's ladder:

1. **Flash kernel** (ops/attention.py): blockwise online-softmax Pallas
   kernel, O(block) VMEM — one chip runs T=8192 fwd in ~8.6 ms (B=4,
   block 1024) where einsum cannot run at all (docs/DESIGN.md table).
2. **Ring attention** (ops/ring_attention.py): shard the TIME axis over a
   mesh axis; K/V chunks rotate by ppermute while each device folds chunks
   into the same online-softmax merge — per-device logits memory ÷ n²;
   ``impl="flash"`` runs each hop through the Pallas kernel too
   (ring × flash: O(block) VMEM at both levels).
3. **Tensor parallelism** (parallel/tensor.py): at wider d_model, attention
   heads + FFN hidden shard over a `model` axis via GSPMD annotations.

This example runs (2) against full attention for equality, shows (3)'s
sharding on the same mesh, then TRAINS the config-reachable long-context
model end-to-end: ``LongContextClassifier(attn_impl="ring", mesh=...)``
under the standard compiled ``make_fit_fn`` with the time axis sharded
over all 8 devices (T=2048 here; tests push it to 4096). CPU-friendly
shapes; the mechanisms are shape-agnostic.
`python examples/long_context.py`
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_eeg_fmri_tpu.ops.attention import reference_attention
from multimodal_eeg_fmri_tpu.ops.ring_attention import (
    ring_attention, shard_sequence)
from multimodal_eeg_fmri_tpu.parallel.tensor import (
    build_tp_mesh, shard_params_tp, tp_param_specs)


def main():
    # --- ring attention: T sharded 8 ways, exact vs full attention ---
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    B, H, T, D = 2, 4, 512, 32
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(B, H, T, D)), jnp.float32)
               for _ in range(3))

    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    ring = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(qs, ks, vs)
    err = float(jnp.max(jnp.abs(ring - ref)))
    print(f"ring attention: T={T} sharded over 8 devices, "
          f"per-device chunk T_local={T // 8}, max|Δ| vs full = {err:.2e}")
    assert err < 1e-4

    # --- tensor parallelism: the param layout at a glance ---
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4

    plan = build_tp_mesh(jax.devices()[:8], data=2, model=4)
    model = TriModalFusionNetV4(hidden_dim=64, num_transformer_layers=1,
                                num_heads=4)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        erp=jnp.ones((2, 64, 18)), pw=jnp.ones((2, 64, 75)),
        conn=jnp.ones((2, 459)), train=False)
    tp = shard_params_tp(variables["params"], plan)

    from flax import traverse_util
    from jax.sharding import PartitionSpec as P

    specs = traverse_util.flatten_dict(
        tp_param_specs(variables["params"], plan.n_model))
    n_sharded = sum(1 for s in specs.values() if s != P())
    print(f"tensor parallel: mesh data={plan.n_data} x model={plan.n_model}, "
          f"{n_sharded}/{len(specs)} params sharded (attention heads + FFN)")
    example = next(v for p, v in traverse_util.flatten_dict(tp).items()
                   if "ffn1" in p and p[-1] == "kernel")
    print("  e.g. ffn1 kernel sharding:", example.sharding.spec)

    # --- trainable long-context: ring attention inside the compiled fit ---
    from jax.sharding import NamedSharding
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.models import LongContextClassifier
    from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

    T_long, C = 2048, 4
    rr = np.random.default_rng(1)
    y = (np.arange(8) % 2).astype(np.int64)
    x = rr.standard_normal((8, T_long, C)).astype(np.float32)
    x += 0.4 * (y * 2 - 1)[:, None, None] * np.sin(
        np.linspace(0, 6 * np.pi, T_long))[None, :, None]
    data = {"erp": x, "label": y, "weight": np.ones(8, np.float32)}

    cfg = TrainConfig(batch_size=4, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    lc = LongContextClassifier(hidden_dim=32, num_layers=1, num_heads=4,
                               dropout=0.0, patch=4, attn_impl="ring",
                               mesh=mesh, seq_axis="data")
    fit = jax.jit(make_fit_fn(lc, cfg, eval_names=()))
    from jax.sharding import PartitionSpec as P2
    dev = {k2: jax.device_put(
        jnp.asarray(v2), NamedSharding(
            mesh, P2(None, "data", None) if np.ndim(v2) == 3 else P2()))
        for k2, v2 in data.items()}
    res = fit(jax.random.key(0), dev, {}, None)
    losses = np.asarray(res.history["train_loss"]).ravel()
    print(f"long-context training: T={T_long} sharded over 8 devices, "
          f"3-epoch loss {np.round(losses, 4)}")
    assert losses[-1] < losses[0]

    # --- ring × pipeline: depth AND time sharded on ONE 2D mesh ---
    # 4 pipelined transformer stages × seq 2: activations hop stages by
    # ppermute while each stage's attention runs the per-device ring body
    # over the seq axis (attn_impl="ring_local" — shard_map cannot nest)
    from multimodal_eeg_fmri_tpu.models import PipelinedLongContextClassifier

    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                  ("stage", "seq"))
    pl = PipelinedLongContextClassifier(
        hidden_dim=32, num_heads=4, patch=4, num_layers=4,
        mesh=mesh2d, seq_axis="seq")
    fit2 = jax.jit(make_fit_fn(pl, cfg, eval_names=()))
    res2 = fit2(jax.random.key(0),
                {k2: jnp.asarray(v2) for k2, v2 in data.items()}, {}, None)
    losses2 = np.asarray(res2.history["train_loss"]).ravel()
    print(f"ring x pipeline: 4 stages x seq 2, T={T_long}, depth 4, "
          f"3-epoch loss {np.round(losses2, 4)}")
    assert losses2[-1] < losses2[0]

    # --- expert parallelism: MoE FFN, experts sharded over the mesh ---
    # the sixth axis: E experts hold E× the FFN parameters while each
    # token pays one expert's FLOPs; GShard dispatch/combine einsums, XLA
    # inserts the token all-to-alls (ops/moe.py + parallel/expert.py)
    from multimodal_eeg_fmri_tpu.parallel.expert import (
        build_ep_mesh,
        ep_param_constraint,
    )

    ep = build_ep_mesh(jax.devices()[:8], data=2, expert=4)
    moe = LongContextClassifier(hidden_dim=32, num_layers=1, num_heads=4,
                                dropout=0.0, patch=4, num_experts=4,
                                mesh=ep.mesh, expert_axis="expert",
                                attn_impl="einsum")  # Pallas needs a TPU
    fit3 = jax.jit(make_fit_fn(moe, cfg, eval_names=(),
                               param_sharding=ep_param_constraint(ep)))
    from jax.sharding import PartitionSpec as P3
    dev3 = {k2: jax.device_put(
        jnp.asarray(v2), NamedSharding(
            ep.mesh, P3("data", *([None] * (np.ndim(v2) - 1)))))
        for k2, v2 in data.items()}
    res3 = fit3(jax.random.key(0), dev3, {}, None)
    losses3 = np.asarray(res3.history["train_loss"]).ravel()
    print(f"expert parallelism: 4 experts sharded over a 2x4 (data x "
          f"expert) mesh, 3-epoch loss {np.round(losses3, 4)}")
    assert losses3[-1] < losses3[0]


if __name__ == "__main__":
    main()
