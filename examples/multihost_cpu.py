"""A REAL multi-process (process_count == 2) fold-parallel training run.

The reference is strictly single-process (SURVEY §2.3: no torch.distributed,
no NCCL/MPI); the framework's DCN story (``parallel/distributed.py`` +
``parallel/input.py``) was previously validated only against *simulated*
process device lists. This example executes it for real on CPU:

- the driver (no args) spawns TWO worker processes that rendezvous through
  ``jax.distributed.initialize`` (localhost coordinator, gloo CPU
  collectives), each exposing 4 virtual CPU devices → one 8-device global
  mesh spanning both processes;
- each worker builds the hybrid (ensemble × data) mesh with the ensemble
  axis on the cross-process (DCN) dimension (``build_hybrid_mesh``), loads
  ONLY its own folds (``process_fold_range`` — the other process's rows are
  never materialized locally), assembles global arrays via
  ``global_ensemble_tree`` (``jax.make_array_from_process_local_data``),
  and trains all folds with the manual-SPMD fold axis
  (``parallel/mesh.ensemble_vmap`` over the compiled ``make_fit_fn`` run);
- the driver then reruns the identical folds UNSHARDED in one process and
  asserts the full per-fold metric history matches both workers' gathered
  histories exactly (same tolerance as the dryrun's sharded==unsharded
  check);
- phase 2 inverts the orientation: a flat ``(ensemble=1, data=8)`` mesh
  whose DATA axis spans both processes — each process contributes its own
  half of one global batch (``global_batch_tree``) and a single-fold
  training run executes the per-step gradient all-reduce ACROSS the
  process boundary (the DCN-DP pattern `build_hybrid_mesh` deliberately
  avoids, executed here to prove the communication path itself), again
  asserted equal to the single-process run.

Run: ``python examples/multihost_cpu.py`` (~4-8 min, CPU only — safe during
TPU tunnel outages). Exercised by ``tests/test_multiprocess.py``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:          # workers launch as examples/<file>
    sys.path.insert(0, str(REPO))

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4
ENSEMBLE, DATA = 4, 2          # global mesh: ensemble spans DCN, DP on "ICI"
T = 32                          # time steps (tiny — this validates plumbing)
RTOL, ATOL = 2e-4, 2e-5         # same as dryrun_multichip's equality check


def _pin_cpu(n_devices: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)


def _folds(n_folds: int, dp: int):
    """Deterministic per-fold (train, eval) arrays; fold f draws a DISTINCT
    row range so any cross-process fold mix-up shows up as a wrong loss."""
    import numpy as np

    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal

    B = 2 * dp
    rows = 3 * B
    raw = synthetic_eeg_trimodal(n_subjects=n_folds * rows, time_steps=T,
                                 seed=0)
    raw.pop("subject")
    out = []
    for f in range(n_folds):
        lo = f * rows
        tr = pad_rows(subset(raw, np.arange(lo, lo + 2 * B)), 2 * B)
        ev = pad_rows(subset(raw, np.arange(lo + 2 * B, lo + 3 * B)), B)
        out.append((tr, ev))
    return out, B


def _dp_fold():
    """One (train, eval) fold for the cross-process-DP phase: row counts
    divisible by the 8-wide data axis."""
    import numpy as np

    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal

    raw = synthetic_eeg_trimodal(n_subjects=24, time_steps=T, seed=11)
    raw.pop("subject")
    tr = pad_rows(subset(raw, np.arange(16)), 16)
    ev = pad_rows(subset(raw, np.arange(16, 24)), 8)
    return tr, ev


def _fit_fn(B: int):
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4
    from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

    cfg = TrainConfig(batch_size=B, num_epochs=1, learning_rate=1e-3,
                      schedule="constant", selection="val", patience=100)
    model = TriModalFusionNetV4(hidden_dim=32, num_transformer_layers=1)
    return make_fit_fn(model, cfg, eval_names=("val",))


def _stack(trees):
    import jax
    import numpy as np

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def worker(process_id: int, port: int, outdir: str) -> None:
    """One of the two cooperating processes."""
    _pin_cpu(DEVICES_PER_PROCESS)
    import jax

    from multimodal_eeg_fmri_tpu.parallel.distributed import (
        build_hybrid_mesh,
        initialize_distributed,
    )

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    n_proc = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    assert n_proc == N_PROCESSES, n_proc
    assert len(jax.devices()) == N_PROCESSES * DEVICES_PER_PROCESS

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_eeg_fmri_tpu.parallel.input import (
        global_ensemble_tree,
        process_fold_range,
    )
    from multimodal_eeg_fmri_tpu.parallel.mesh import ensemble_vmap

    plan = build_hybrid_mesh(ensemble=ENSEMBLE, data=DATA)
    # the hybrid mesh must put the process (DCN) dimension on ensemble:
    # each mesh row's devices all live on one process
    rows = np.vectorize(lambda d: d.process_index)(plan.mesh.devices)
    assert all(len(set(r)) == 1 for r in rows), rows

    n_folds = plan.n_ensemble
    folds, B = _folds(n_folds, plan.n_data)
    lo, hi = process_fold_range(n_folds, plan=plan)
    # load ONLY this process's folds — the other block never exists here
    local = folds[lo:hi]
    train_dev = global_ensemble_tree(
        plan, _stack([f[0] for f in local]), n_global_folds=n_folds)
    eval_dev = global_ensemble_tree(
        plan, _stack([f[1] for f in local]), n_global_folds=n_folds)
    # per-fold PRNG keys assemble exactly like the data: each process
    # contributes the RAW key bits for its own folds (device_put cannot
    # target non-addressable devices, and make_array_from_process_local_data
    # wants a plain dtype — wrap back to typed keys inside the mapped fn)
    local_keys = jax.vmap(
        lambda i: jax.random.key_data(
            jax.random.fold_in(jax.random.key(0), i)))(jnp.arange(lo, hi))
    key_bits = global_ensemble_tree(
        plan, np.asarray(local_keys), n_global_folds=n_folds)

    fit = _fit_fn(B)
    fit_kd = lambda kd, tr, ev, cw: fit(
        jax.random.wrap_key_data(kd), tr, ev, cw)
    res = jax.jit(ensemble_vmap(fit_kd, plan))(
        key_bits, train_dev, {"val": eval_dev}, None)
    # gather each history leaf to every process: a jit identity with a
    # REPLICATED out-sharding is the SPMD all-gather across the mesh
    gather = jax.jit(lambda x: x,
                     out_shardings=NamedSharding(plan.mesh, P()))
    history = {k: np.asarray(gather(v).addressable_data(0))
               for k, v in res.history.items()}
    np.savez(Path(outdir) / f"proc{process_id}.npz",
             lo=lo, hi=hi, **history)
    print(f"worker {process_id}: folds [{lo},{hi}) trained on mesh "
          f"{plan.n_ensemble}x{plan.n_data}, history gathered", flush=True)

    # --- phase 2: DP ACROSS the process boundary. A flat (1, 8) mesh puts
    # the data axis over both processes; each process feeds its own half
    # of one global batch (global_batch_tree) and the compiled fit's
    # per-step gradient psum crosses processes (gloo).
    from multimodal_eeg_fmri_tpu.parallel.input import global_batch_tree
    from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh

    plan_dp = build_mesh(jax.devices(), ensemble=1, data=8)
    procs_on_data = {d.process_index
                     for d in plan_dp.mesh.devices.ravel()}
    assert len(procs_on_data) == N_PROCESSES, procs_on_data

    tr0, ev0 = _dp_fold()
    n_rows = tr0["label"].shape[0]
    lo_r, hi_r = (process_id * n_rows // N_PROCESSES,
                  (process_id + 1) * n_rows // N_PROCESSES)
    tr_dev = global_batch_tree(
        plan_dp, jax.tree_util.tree_map(lambda x: x[lo_r:hi_r], tr0),
        n_global_rows=n_rows)
    ne = ev0["label"].shape[0]
    lo_e, hi_e = (process_id * ne // N_PROCESSES,
                  (process_id + 1) * ne // N_PROCESSES)
    ev_dev = global_batch_tree(
        plan_dp, jax.tree_util.tree_map(lambda x: x[lo_e:hi_e], ev0),
        n_global_rows=ne)
    fit_dp = _fit_fn(8)
    res_dp = jax.jit(fit_dp)(jax.random.key(7), tr_dev, {"val": ev_dev},
                             None)
    hist_dp = {k: np.asarray(jax.jit(
        lambda x: x, out_shardings=NamedSharding(plan_dp.mesh, P()))(v)
        .addressable_data(0)) for k, v in res_dp.history.items()}
    np.savez(Path(outdir) / f"dp_proc{process_id}.npz", **hist_dp)
    print(f"worker {process_id}: cross-process DP fold trained on mesh "
          f"1x8 (data spans {len(procs_on_data)} processes)", flush=True)


def main() -> None:
    port = 12000 + os.getpid() % 20000
    outdir = tempfile.mkdtemp(prefix="multihost_cpu_")
    procs = []
    t0 = time.time()
    try:
        for pid in range(N_PROCESSES):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(pid), str(port), outdir],
                cwd=str(REPO)))
        rcs = [p.wait(timeout=1200) for p in procs]
    finally:
        # a worker that dies pre-rendezvous leaves its peer blocked forever
        # in the gloo handshake; without this, p.wait's TimeoutExpired (or
        # the test runner killing this driver) would orphan a spinning
        # worker on the one-CPU host and poison every later job
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()
    assert rcs == [0] * N_PROCESSES, f"worker exit codes {rcs}"
    print(f"workers done in {time.time() - t0:.0f}s")

    # single-process unsharded reference on the SAME folds
    _pin_cpu(DEVICES_PER_PROCESS)
    import jax
    import jax.numpy as jnp
    import numpy as np

    folds, B = _folds(ENSEMBLE, DATA)
    fit = _fit_fn(B)
    rngs = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(ENSEMBLE))
    res = jax.jit(jax.vmap(fit, in_axes=(0, 0, {"val": 0}, None)))(
        rngs,
        jax.tree_util.tree_map(jnp.asarray, _stack([f[0] for f in folds])),
        {"val": jax.tree_util.tree_map(
            jnp.asarray, _stack([f[1] for f in folds]))},
        None)

    for pid in range(N_PROCESSES):
        got = np.load(Path(outdir) / f"proc{pid}.npz")
        for k, v in res.history.items():
            np.testing.assert_allclose(
                got[k], np.asarray(v), rtol=RTOL, atol=ATOL,
                err_msg=f"proc {pid} history[{k!r}] != single-process run")
    loss = np.asarray(res.history["train_loss"]).ravel()
    assert len(set(np.round(loss, 6))) > 1, (
        "per-fold losses identical despite distinct fold data", loss)

    # phase 2 reference: the same single fold, single-process, unsharded
    tr0, ev0 = _dp_fold()
    res_dp = jax.jit(_fit_fn(8))(
        jax.random.key(7),
        jax.tree_util.tree_map(jnp.asarray, tr0),
        {"val": jax.tree_util.tree_map(jnp.asarray, ev0)}, None)
    for pid in range(N_PROCESSES):
        got = np.load(Path(outdir) / f"dp_proc{pid}.npz")
        for k, v in res_dp.history.items():
            np.testing.assert_allclose(
                got[k], np.asarray(v), rtol=RTOL, atol=ATOL,
                err_msg=f"cross-process DP history[{k!r}] != single-process")
    print(f"multihost_cpu OK: {N_PROCESSES} processes x "
          f"{DEVICES_PER_PROCESS} devices, mesh {ENSEMBLE}x{DATA}, "
          f"per-fold history == single-process run "
          f"(train_loss {loss}); cross-process DP (1x8) fold "
          f"== single-process run")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
