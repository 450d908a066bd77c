"""Measure ALL five BASELINE.md configs on the real TPU chip.

The reference publishes a per-model x per-config latency matrix
(`/root/reference/README.md:52-68`); BASELINE.json names five measured
configs for this build. This script produces the committed
``baseline_matrix.json`` with one record per config (VERDICT r3 #1):

  1. quicknet_small  batch-1    p50 per-image latency (serving regime)
  2. quicknet        batch-128  throughput (the headline number)
  3. quicknet_large  batch-128  throughput
  4. birealnet18     batch-128  throughput (zero-padding-correction path)
  5. binary_densenet45 through ServingEngine: continuous-batching
     throughput + batch-fill + request p50 on the single chip

plus batch-1 p50 rows for the other models (the reference's headline is
batch-1 latency on every model).

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/baseline_matrix.py
       [--configs quicknet_small:1,quicknet:128,...] (subset; merges)
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "baseline_matrix.json")

# (model, batch) throughput/latency configs; serving runs separately.
DEFAULT_CONFIGS = [
    ("quicknet_small", 1), ("quicknet", 1), ("quicknet_large", 1),
    ("birealnet18", 1),
    ("quicknet_small", 128), ("quicknet", 128), ("quicknet_large", 128),
    ("birealnet18", 128),
]

# Reference best published per-model 1-thread latency (Mac Mini M1,
# `/root/reference/README.md:52-58`) for the vs-reference column.
REF_BATCH1_MS = {"quicknet_small": 4.0, "quicknet": 5.8,
                 "quicknet_large": 9.9, "birealnet18": 41.6 * (5.8 / 25.5)}
# (Bi-RealNet has no M1 number; scaled from its Pixel-1 number by the
# QuickNet Pixel-1 -> M1 ratio, noted in the record.)


def bench_config(model, batch, iters=None, repeats=5, int8=False):
    from compute_engine_tpu.runtime.benchmark import benchmark_model

    # Small batches need longer chains for the differencing timer to rise
    # above tunnel noise.
    iters = iters or (200 if batch == 1 else 20)
    r = benchmark_model(model=model, batch=batch, iters=iters, warmup=1,
                        repeats=repeats, kernel="auto", int8_pipeline=int8)
    rec = {
        "model": model, "batch": batch, "kernel": "auto",
        **({"pipeline": "int8"} if int8 else {}),
        "latency_ms_p50": r["latency_ms_p50"],
        "per_image_ms_p50": round(r["latency_ms_p50"] / batch, 4),
        "images_per_sec": r["images_per_sec"],
        "iters": iters,
        # Init/memory metrics (the reference benchmark reports init time
        # and memory footprint, `lce_benchmark_main.cc:35-49`).
        "compile_s": r["compile_s"],
        "weights_mb": r.get("weights_mb"),
    }
    for k in ("peak_hbm_mb", "peak_hbm_est_mb", "act_peak_mb"):
        if k in r:
            rec[k] = r[k]
    ref = REF_BATCH1_MS.get(model)
    if batch == 1 and ref is not None:
        rec["ref_m1_1thread_ms"] = round(ref, 2)
        rec["speedup_vs_ref_m1"] = round(ref / r["latency_ms_p50"], 1)
        if model == "birealnet18":
            rec["ref_note"] = ("no M1 number published; Pixel-1 41.6 ms "
                               "scaled by the QuickNet Pixel1->M1 ratio")
    return rec


def bench_serving(model="binary_densenet45", batch_size=128,
                  n_clients=256, duration_s=30.0, max_delay_ms=10.0):
    # n_clients must exceed batch_size for continuous batching to fill
    # batches: each client blocks on its own result, so at most n_clients
    # requests are in flight (the first run with 16 clients measured
    # mean_batch_fill 0.125 — a client-count artefact, not engine capacity).
    """BinaryDenseNet-45 through the continuous-batching ServingEngine on
    the single chip: sustained request throughput, batch fill, request p50.

    NOTE: per-dispatch latency here includes the host<->device tunnel RTT
    (unlike the fori-chained throughput rows), so the throughput is a
    lower bound on chip capability — recorded as the serving-stack number
    the BASELINE config asks for.
    """
    import jax.numpy as jnp

    from compute_engine_tpu.models import convert_model, get_model, init_model
    from compute_engine_tpu.runtime.interpreter import Interpreter
    from compute_engine_tpu.runtime.serving import ServingEngine

    spec = get_model(model)
    layers = convert_model(spec, init_model(spec, seed=0, randomize_bn=True))
    # int8 image input (the reference's int8-I/O flatbuffer surgery,
    # `mlir/python/util.py:176-222`): quarters the host->device bytes per
    # batch, which is the binding resource through the tunnel.
    interp = Interpreter(model=spec, layers=layers,
                         compute_dtype=jnp.bfloat16,
                         input_scale=1 / 64.0, input_zero_point=0)
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(0, 64, (*spec.input_size, 3)),
                  -128, 127).astype(np.int8)

    # Compile + warm the fixed-batch program before timing.
    np.asarray(interp(np.stack([img] * batch_size)))

    lat_lock = threading.Lock()
    latencies = []
    done_at = time.monotonic() + duration_s
    n_done = [0]

    with ServingEngine(interp, batch_size=batch_size,
                       max_delay_ms=max_delay_ms) as eng:
        def client():
            while time.monotonic() < done_at:
                t0 = time.monotonic()
                eng.predict(img, timeout=60)
                dt = time.monotonic() - t0
                with lat_lock:
                    latencies.append(dt)
                    n_done[0] += 1

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.monotonic() - t_start
        stats = eng.stats

    lat = np.asarray(latencies)
    return {
        "model": model, "mode": "serving_engine",
        "batch_size": batch_size, "n_clients": n_clients,
        "max_delay_ms": max_delay_ms,
        "duration_s": round(elapsed, 1),
        "requests": int(n_done[0]),
        "requests_per_sec": round(n_done[0] / elapsed, 1),
        "request_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "request_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "mean_batch_fill": round(stats.mean_batch_fill, 3),
        "batches": stats.batches,
        "note": ("single-chip serving stack; per-dispatch latency includes "
                 "the host<->device tunnel RTT, so this lower-bounds chip "
                 "throughput (cf. the fori-chained rows)"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=None,
                   help="comma list model:batch (or 'serving'); subset runs "
                        "MERGE into the existing json")
    p.add_argument("--skip-serving", action="store_true")
    args = p.parse_args()

    import jax

    if args.configs:
        configs, serving = [], False
        for c in args.configs.split(","):
            if c == "serving":
                serving = True
            elif c.endswith(":int8"):
                m, b, _ = c.split(":")
                configs.append((m, int(b), True))
            else:
                m, b = c.rsplit(":", 1)
                configs.append((m, int(b)))
    else:
        configs, serving = list(DEFAULT_CONFIGS), not args.skip_serving
        # True-int8 pipeline rows (int8 stream + int8 residual adds): the
        # reference's full-int8 model configuration, and the only mode
        # that can beat the bf16 stream's composite HBM bound
        # (section_profile floors).
        configs += [("quicknet", 128, True), ("quicknet", 1, True)]

    try:
        with open(OUT) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    data["_meta"] = {"device": str(jax.devices()[0]),
                     "timer": "fori differencing, median-of-5"}

    for cfg in configs:
        model, batch = cfg[0], cfg[1]
        int8 = len(cfg) > 2 and cfg[2]
        rec = bench_config(model, batch, int8=int8)
        data[f"{model}@{batch}" + ("@int8" if int8 else "")] = rec
        print(json.dumps(rec), flush=True)
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    if serving:
        rec = bench_serving()
        data["binary_densenet45@serving"] = rec
        print(json.dumps(rec), flush=True)
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
