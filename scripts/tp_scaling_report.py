"""DP/TP scaling trend on the virtual CPU mesh -> tp_scaling.json.

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so this produces the SIMULATED scaling trend VERDICT r2
item 7 asks for: images/s of the tiny QuickNet forward at dp = 1/2/4/8
virtual CPU devices, plus per-mode correctness/latency of the explicit TP
modes (gather / sharded / pipelined) at tp = 8. CPU-mesh timings reflect
partitioning overheads, NOT ICI bandwidth — the numbers are a trend line
and a regression canary for the sharded program structure, nothing more.

Usage: PYTHONPATH=/root/repo python scripts/tp_scaling_report.py
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tp_scaling.json")


def time_call(fn, *args, iters=5):
    np.asarray(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def dp_scaling():
    from compute_engine_tpu.models import (convert_model, init_model,
                                           packed_apply, tiny_quicknet)
    from compute_engine_tpu.parallel import (input_sharding, make_mesh,
                                             shard_artifact)

    spec = tiny_quicknet(section_filters=(64, 128), section_blocks=(1, 1),
                         num_classes=16, input_size=32)
    layers = convert_model(spec, init_model(spec, seed=0, randomize_bn=True))
    rows = []
    per_dev_batch = 16
    for dp in (1, 2, 4, 8):
        mesh = make_mesh((dp, 1), devices=jax.devices()[:dp])
        with mesh:
            sharded = shard_artifact(layers, mesh)
            x = jax.device_put(
                np.random.default_rng(0).normal(
                    0, 1, (per_dev_batch * dp, 32, 32, 3)).astype(np.float32),
                input_sharding(mesh))
            fn = jax.jit(lambda t: packed_apply(spec, sharded, t,
                                                kernel="reference"))
            sec = time_call(fn, x)
        rows.append({"dp": dp, "batch": per_dev_batch * dp,
                     "images_per_sec": round(per_dev_batch * dp / sec, 1)})
    base = rows[0]["images_per_sec"]
    for r in rows:
        r["scaling_efficiency"] = round(
            r["images_per_sec"] / (base * r["dp"]), 3)
    return rows


def tp_modes():
    from compute_engine_tpu.core.bitpack import bitpack_np
    from compute_engine_tpu.core.params import BConv2DParams
    from compute_engine_tpu.core.transforms import fuse_output_transform
    from compute_engine_tpu.core.types import Padding
    from compute_engine_tpu.ops import quantize
    from compute_engine_tpu.parallel import tp_bconv2d

    rng = np.random.default_rng(0)
    tp = 8
    c_in, c_out = 64, 256
    x = jnp.asarray(rng.normal(0, 1, (16, 14, 14, c_in)).astype(np.float32))
    pf = jnp.asarray(bitpack_np(
        rng.choice([-1.0, 1.0], (c_out, 3, 3, c_in)).astype(np.float32)))
    tr = fuse_output_transform(
        rng.uniform(0.1, 2.0, c_out).astype(np.float32),
        rng.uniform(-1, 1, c_out).astype(np.float32), 9 * c_in)
    params = BConv2DParams(channels_in=c_in, stride=(1, 1),
                           padding=Padding.SAME, pad_value=1)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:tp]), ("model",))
    xq = quantize(x)
    rows = []
    ref = None
    with mesh:
        for mode in ("gather", "sharded", "pipelined"):
            fn = jax.jit(lambda a, w, mode=mode: tp_bconv2d(
                a, w, tr, params, mesh, output_kind="float", kernel="mxu",
                mode=mode))
            sec = time_call(fn, xq, pf)
            out = np.asarray(jax.jit(
                lambda a, w, mode=mode: jax.lax.with_sharding_constraint(
                    tp_bconv2d(a, w, tr, params, mesh, output_kind="float",
                               kernel="mxu", mode=mode),
                    jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec())))(xq, pf))
            if ref is None:
                ref = out
            rows.append({"mode": mode, "tp": tp,
                         "latency_ms": round(sec * 1e3, 3),
                         "bit_exact_vs_gather": bool((out == ref).all())})
    return rows


def main():
    report = {
        "note": "virtual 8-device CPU mesh — simulated trend, not ICI perf",
        "dp_scaling": dp_scaling(),
        "tp_modes": tp_modes(),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
