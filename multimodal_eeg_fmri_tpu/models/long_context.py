"""Long-context sequence classifier — the trainable sequence-parallel path.

No reference analogue: the reference caps sequences at 5000 steps and
truncates (``CrossModal_EEG_scr.ipynb §41``, SURVEY §5 long-context). This
model is the framework's headroom surface made config-reachable: a raw long
recording ``(B, T, C)`` trains end-to-end under ``train.fit.make_fit_fn``
with the TIME axis sharded over a mesh axis — each transformer block runs
ring attention (``ops/ring_attention.py``: ppermute K/V rotation +
online-softmax merge), optionally composed with tensor-parallel head
sharding via ``head_axis``.

Design notes (TPU-first):
- patchify: non-overlapping ``patch`` frames → one token (a strided
  reshape + Dense — MXU-friendly, shrinks T by ``patch`` before attention).
- LayerNorm everywhere (no BatchNorm): batch stats don't interact with the
  sequence sharding and LOOCV batch=1 serving.
- mean-pool over (sharded) time → psum via GSPMD when sharded — then an
  ordinary classifier head.

``attn_impl``: "ring" (mesh required) for T beyond one chip, "auto" for the
single-device flash/einsum routing — the same config trains both ways, which
the parity test exploits (ring loss history == single-device history).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.eeg import ModelOutput
from multimodal_eeg_fmri_tpu.models.layers import (
    ClassifierHead,
    TransformerBlock,
    gelu,
    sinusoidal_position_encoding,
)


class LongContextClassifier(nn.Module):
    """Transformer classifier over one long raw sequence (key ``erp``)."""

    hidden_dim: int = 64
    num_classes: int = 2
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.0
    patch: int = 1              # frames per token (1 = per-frame tokens)
    attn_impl: str = "auto"     # "auto" | "einsum" | "flash" | "ring"
    mesh: Optional[jax.sharding.Mesh] = None
    seq_axis: str = "seq"
    head_axis: Optional[str] = None
    # MoE FFN (ops/moe.py): >0 experts per block, optionally sharded over
    # ``expert_axis`` of the mesh (expert parallelism)
    num_experts: int = 0
    moe_top_k: int = 1
    expert_axis: Optional[str] = None
    # MXU input dtype for the flash/ring kernels (f32 accumulation
    # regardless); bfloat16 doubles per-tile matmul throughput on v5e at
    # long T
    flash_compute_dtype: jnp.dtype = jnp.float32
    # Per-hop chunk attention inside the ring paths ("einsum" | "flash")
    ring_chunk_impl: str = "einsum"
    # Rematerialize each block's activations in the backward pass
    # (jax.checkpoint via nn.remat): live activation memory drops from
    # O(num_layers · T · d) to O(T · d) + per-block recompute — the
    # standard FLOPs-for-HBM trade that buys depth at long T on TPU.
    # Gradients match the non-remat run to float reassociation (~1 ulp,
    # tested); the memory benefit is a device-scheduling property — the
    # CPU backend's memory_analysis does NOT reflect it, so don't "verify"
    # the saving off-TPU.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,   # (B, T, C) raw long recording
        pw: Optional[jnp.ndarray] = None,    # accepted & ignored
        conn: Optional[jnp.ndarray] = None,  # (uniform model API)
        train: bool = False,
    ) -> ModelOutput:
        B, T, C = erp.shape
        if T % self.patch:
            raise ValueError(f"T={T} not divisible by patch={self.patch}")
        x = erp.reshape(B, T // self.patch, self.patch * C)
        x = nn.Dense(self.hidden_dim, name="embed")(x)
        x = x + sinusoidal_position_encoding(
            x.shape[1], self.hidden_dim, x.dtype)[None]
        block_cls = (nn.remat(TransformerBlock, static_argnums=(2,))
                     if self.remat else TransformerBlock)
        for i in range(self.num_layers):
            x = block_cls(
                self.hidden_dim, self.num_heads, dropout=self.dropout,
                attn_impl=self.attn_impl, mesh=self.mesh,
                seq_axis=self.seq_axis, head_axis=self.head_axis,
                num_experts=self.num_experts, moe_top_k=self.moe_top_k,
                expert_axis=self.expert_axis,
                flash_compute_dtype=self.flash_compute_dtype,
                ring_chunk_impl=self.ring_chunk_impl,
                name=f"block_{i}",
            )(x, train)
        x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
        pooled = jnp.mean(x, axis=1)  # sharded-T mean → GSPMD partial-sums
        feat = gelu(nn.Dense(self.hidden_dim, name="pool_proj")(pooled))
        logits = ClassifierHead(
            (self.hidden_dim // 2,), self.num_classes, self.dropout,
            norm="layer", name="classifier",
        )(feat, train=train)
        return ModelOutput(logits, feat, None, None)


class PipelinedLongContextClassifier:
    """Long-context classifier with the transformer DEPTH pipelined over a
    ``stage`` mesh axis (``parallel/pipeline.pipeline_apply`` — GPipe as
    one shard_map'd scan; microbatches hop stages by ppermute).

    This is the config-reachable surface for pipeline parallelism: the
    stage params live stacked on a leading layer axis sharded over the
    mesh, and the same object with ``mesh=None`` applies the stack
    sequentially — the parity test trains both and requires equal loss
    histories. With ``seq_axis`` set on a 2D ``(stage, seq)`` mesh it
    composes ring attention (time) with pipelining (depth): each stage's
    attention runs the per-device ring body over ``seq_axis``
    (``attn_impl="ring_local"``) while activations hop stages over
    ``stage_axis``. Duck-typed (``init``/``apply`` like a flax module, fixed
    ``ModelOutput`` return) so it drops into ``train.fit.make_fit_fn``
    unchanged.

    Dropout: supported on the pipeline-only path — ``pipeline_apply``
    threads a per-(stage, microbatch) key through the schedule, and the
    sequential twin (``mesh=None``) derives the SAME keys over the same
    microbatch split, so stochastic training matches the unpipelined run
    exactly (tests/test_pipeline_parallel.py). On the composed
    ``(stage, seq)`` mesh, dropout masks over a TIME-sharded activation
    cannot match any unsharded twin (each seq shard would need its own
    fold), so ``dropout > 0`` with ``seq_axis`` raises at construction —
    regularize that configuration with weight decay instead.

    No reference analogue (SURVEY §2.3: the reference has no parallelism);
    this composes the framework's own headroom primitives into a trainable
    model.
    """

    def __init__(self, hidden_dim: int = 64, num_classes: int = 2,
                 num_layers: Optional[int] = None, num_heads: int = 4,
                 patch: int = 1, mesh: Optional[jax.sharding.Mesh] = None,
                 stage_axis: str = "stage", n_micro: Optional[int] = None,
                 seq_axis: Optional[str] = None, dropout: float = 0.0):
        if dropout > 0 and seq_axis is not None:
            raise ValueError(
                "PipelinedLongContextClassifier: dropout is not supported "
                "on the composed (stage, seq) mesh — masks over a "
                "time-sharded activation cannot match an unsharded twin. "
                "Use weight decay (TrainConfig.weight_decay) there, or "
                "drop seq_axis.")
        if mesh is not None:
            n_stages = mesh.shape[stage_axis]
            if num_layers is None:
                num_layers = n_stages
            if num_layers != n_stages:
                raise ValueError(
                    f"num_layers={num_layers} must equal the mesh's "
                    f"{stage_axis} axis ({n_stages}) — homogeneous pipeline")
        elif num_layers is None:
            num_layers = 2
        self.hidden_dim = hidden_dim
        self.num_classes = num_classes
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.patch = patch
        self.mesh = mesh
        self.stage_axis = stage_axis
        self.n_micro = n_micro
        self.seq_axis = seq_axis
        self.dropout = dropout
        if mesh is not None and seq_axis is not None:
            # ring (time) × pipeline (depth) on one 2D mesh: each stage's
            # attention runs the per-device ring body over the seq axis —
            # shard_map cannot nest, so the block uses "ring_local" with the
            # ring length fixed from the mesh
            self._block = TransformerBlock(
                hidden_dim, num_heads, dropout=0.0, attn_impl="ring_local",
                seq_axis=seq_axis, ring_size=mesh.shape[seq_axis])
        else:
            self._block = TransformerBlock(hidden_dim, num_heads,
                                           dropout=dropout)
        # init twin: identical param tree (q/k/v/out projections exist for
        # every attn_impl) but traceable OUTSIDE shard_map — "ring_local"
        # calls lax.axis_index, which only exists inside the mapped body
        self._init_block = TransformerBlock(hidden_dim, num_heads,
                                            dropout=dropout,
                                            attn_impl="einsum")
        self._embed = nn.Dense(hidden_dim)
        self._head = ClassifierHead((hidden_dim // 2,), num_classes, 0.0,
                                    norm="layer")
        self._ln = nn.LayerNorm(epsilon=1e-5)

    def _tokens(self, erp: jnp.ndarray) -> jnp.ndarray:
        B, T, C = erp.shape
        if T % self.patch:
            raise ValueError(f"T={T} not divisible by patch={self.patch}")
        return erp.reshape(B, T // self.patch, self.patch * C)

    def init(self, rngs, *, erp, pw=None, conn=None, train: bool = False):
        key = rngs["params"] if isinstance(rngs, dict) else rngs
        k_embed, k_blocks, k_head, k_ln = jax.random.split(key, 4)
        tok = self._tokens(erp)
        embed_p = self._embed.init(k_embed, tok)["params"]
        x = self._embed.apply({"params": embed_p}, tok)
        x = x + sinusoidal_position_encoding(
            x.shape[1], self.hidden_dim, x.dtype)[None]
        block_keys = jax.random.split(k_blocks, self.num_layers)
        blocks_p = jax.vmap(
            lambda k: self._init_block.init(k, x, train=False)["params"]
        )(block_keys)
        ln_p = self._ln.init(k_ln, x)["params"]
        pooled = jnp.mean(x, axis=1)
        kp, kh = jax.random.split(k_head)
        pool_p = nn.Dense(self.hidden_dim).init(kp, pooled)["params"]
        head_p = self._head.init(kh, pooled, train=False)["params"]
        return {"params": {"embed": embed_p, "blocks": blocks_p,
                           "final_ln": ln_p, "pool_proj": pool_p,
                           "head": head_p}}

    def apply(self, variables, *, erp, pw=None, conn=None,
              train: bool = False, rngs=None, mutable=None) -> ModelOutput:
        p = variables["params"]
        x = self._embed.apply({"params": p["embed"]}, self._tokens(erp))
        x = x + sinusoidal_position_encoding(
            x.shape[1], self.hidden_dim, x.dtype)[None]
        dropping = train and self.dropout > 0
        if dropping:
            base = rngs.get("dropout") if isinstance(rngs, dict) else rngs
            if base is None:
                raise ValueError(
                    "dropout > 0 training needs rngs={'dropout': key} "
                    "(make_fit_fn supplies it)")
        block = lambda bp, h: self._block.apply({"params": bp}, h,
                                                train=False)
        block_k = lambda bp, h, k: self._block.apply(
            {"params": bp}, h, train=True, rngs={"dropout": k})
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from multimodal_eeg_fmri_tpu.parallel.pipeline import (
                pipeline_apply,
            )

            x_spec = (P(None, None, self.seq_axis, None)
                      if self.seq_axis is not None else None)
            x = pipeline_apply(p["blocks"], x, block_k if dropping else block,
                               self.mesh, axis=self.stage_axis,
                               n_micro=self.n_micro, x_spec=x_spec,
                               key=base if dropping else None)
        elif dropping:
            # sequential twin of the pipelined schedule: the SAME microbatch
            # split and the SAME fold_in(fold_in(key, stage), microbatch)
            # keys, so dropout masks match the pipelined run exactly.
            # n_micro=None must default exactly like pipeline_apply does
            # (n_stages == num_layers — enforced equal for the mesh case),
            # or the twins silently derive different key sets (round-4
            # review finding).
            n_micro = self.n_micro or self.num_layers
            B = x.shape[0]
            if B % n_micro:
                raise ValueError(f"batch {B} not divisible by "
                                 f"n_micro={n_micro}")
            xm = x.reshape(n_micro, B // n_micro, *x.shape[1:])

            def layer(h, ibp):
                i, bp = ibp
                keys = jax.vmap(
                    lambda m: jax.random.fold_in(
                        jax.random.fold_in(base, i), m))(jnp.arange(n_micro))
                return jax.vmap(lambda hm, k: block_k(bp, hm, k))(h, keys), None

            xm = jax.lax.scan(
                layer, xm, (jnp.arange(self.num_layers), p["blocks"]))[0]
            x = xm.reshape(B, *xm.shape[2:])
        else:
            x = jax.lax.scan(
                lambda h, bp: (block(bp, h), None), x, p["blocks"])[0]
        x = self._ln.apply({"params": p["final_ln"]}, x)
        pooled = jnp.mean(x, axis=1)
        feat = gelu(nn.Dense(self.hidden_dim).apply(
            {"params": p["pool_proj"]}, pooled))
        logits = self._head.apply({"params": p["head"]}, feat, train=False)
        out = ModelOutput(logits, feat, None, None)
        if mutable:
            return out, {}
        return out
