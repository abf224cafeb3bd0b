"""Minimal HTTP inference server over a compiled Predictor (stdlib only).

Deployment shape: one process owns the chip and the compiled forward;
clients POST JSON feature rows and get calibrated probabilities + the
conformal decision set back. Batch padding, temperature scaling, and the
conformal gate all come from the framework pieces (`serving.Predictor`,
`report/calibration`, `report/conformal`) — this file is just the socket.

Run:  python examples/serve_http.py --cpu [--port 8173]
Then: POST /predict {"erp": [[...]], "pw": [[...]], "conn": [[...]]}
      GET  /health

The script starts the server, fires a self-test client request, prints
the response, and exits with --oneshot (default when run as a demo);
drop --oneshot to keep serving.
"""

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_service(seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data import (
        balanced_class_weights,
        pad_rows,
        subset,
        synthetic_eeg_trimodal,
    )
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.report.conformal import conformal_calibrate
    from multimodal_eeg_fmri_tpu.serving import Predictor
    from multimodal_eeg_fmri_tpu.train import make_fit_fn

    # train → calibrate → conformal-calibrate (prod: load a checkpoint)
    data = synthetic_eeg_trimodal(n_subjects=48, time_steps=64,
                                  separation=1.0, seed=seed)
    data.pop("subject")
    rng = np.random.default_rng(seed)
    perm = rng.permutation(48)
    tr, cal = perm[:32], perm[32:]
    train = pad_rows(subset(data, tr), 32)
    calib = subset(data, cal)
    cfg = TrainConfig(batch_size=8, num_epochs=10, learning_rate=2e-3,
                      selection="train_loss", patience=100)
    model = TriModalFusionNetV4Lite()
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    res = fit(jax.random.key(seed), jax.tree.map(jnp.asarray, train), {},
              jnp.asarray(balanced_class_weights(
                  train["label"], weights=train["weight"])))

    cal_inputs = {k: calib[k] for k in ("erp", "pw", "conn")}
    served = Predictor(model, res.params, res.batch_stats,
                       batch_size=8).calibrated(cal_inputs, calib["label"])
    qhat = float(conformal_calibrate(
        jnp.asarray(served(**cal_inputs)), jnp.asarray(calib["label"]),
        alpha=0.1))
    return served, qhat, data


def make_handler(served, qhat, health_extra=None):
    import numpy as np

    from multimodal_eeg_fmri_tpu.serving import QueueFull

    # ``served`` may be the Predictor itself or a DynamicBatcher around it
    temperature = getattr(
        served, "temperature",
        getattr(getattr(served, "predictor", None), "temperature", None))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok",
                                 "temperature": temperature,
                                 "conformal_qhat": qhat,
                                 **(health_extra() if health_extra else {})})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                inputs = {k: np.asarray(req[k], np.float32)
                          for k in ("erp", "pw", "conn")}
                probs = served(**inputs)
                sets = (1.0 - probs) <= qhat          # LAC decision sets
                self._send(200, {
                    "probs": probs.tolist(),
                    "prediction": probs.argmax(-1).tolist(),
                    "conformal_set": sets.tolist(),
                    "defer": (sets.sum(-1) != 1).tolist(),
                })
            except QueueFull as e:   # bounded-queue backpressure → 503
                self._send(503, {"error": str(e), "retry": True})
            except TimeoutError as e:  # wedged device call → 504
                self._send(504, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — server must not die
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--port", type=int, default=8173)
    ap.add_argument("--oneshot", action="store_true", default=True)
    ap.add_argument("--serve-forever", dest="oneshot", action="store_false")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    served, qhat, data = build_service()
    # ThreadingHTTPServer handles each client on its own thread; the
    # DynamicBatcher coalesces those concurrent rows into one device call
    # per flush window instead of one per request. Production settings:
    # bounded queue (bursts beyond device throughput get HTTP 503 instead
    # of unbounded memory) and a caller timeout (a wedged device call —
    # the half-up tunnel mode — returns 504 instead of stranding every
    # serving thread).
    batcher = DynamicBatcher(served, max_delay_ms=5.0, max_queue=256,
                             timeout_s=120.0)
    server = ThreadingHTTPServer(
        ("127.0.0.1", args.port),
        make_handler(batcher, qhat,
                     health_extra=lambda: {"device_calls": batcher.batches,
                                           "rows_served": batcher.rows}))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"serving on http://127.0.0.1:{args.port}  "
          f"(T={served.temperature:.3f}, qhat={qhat:.3f})")

    # self-test: 6 CONCURRENT single-row clients, then check the batcher
    # coalesced them into fewer device calls
    import urllib.request

    def post_one(i, out_list):
        req = urllib.request.Request(
            f"http://127.0.0.1:{args.port}/predict",
            data=json.dumps({k: data[k][i:i + 1].tolist()
                             for k in ("erp", "pw", "conn")}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out_list[i] = json.loads(r.read())

    outs = [None] * 6
    clients = [threading.Thread(target=post_one, args=(i, outs))
               for i in range(6)]
    for c in clients:
        c.start()
    for c in clients:
        c.join()
    with urllib.request.urlopen(
            f"http://127.0.0.1:{args.port}/health", timeout=30) as r:
        health = json.loads(r.read())
    print("health:", health)
    print("predict[0]:", {"prediction": outs[0]["prediction"],
                          "defer": outs[0]["defer"],
                          "probs": [round(p, 3)
                                    for p in outs[0]["probs"][0]]})
    print(f"6 concurrent requests served in {health['device_calls']} "
          f"device call(s)")

    if args.oneshot:
        server.shutdown()
        batcher.close()
        print("oneshot done")
    else:
        t.join()


if __name__ == "__main__":
    main()
