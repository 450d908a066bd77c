"""Benchmark CLI — counterpart of ``lce_benchmark_model``
(`tflite/benchmark/lce_benchmark_main.cc:27-49`).

Measures steady-state latency / throughput of packed inference on the current
JAX default device, with kernel-selection flags mirroring the reference tool's
``--use_reference_bconv`` / ``--use_indirect_bgemm``.

Usage:
  python -m compute_engine_tpu.runtime.benchmark --model quicknet \
      --batch 8 --iters 20 [--kernel mxu] [--artifact path.npz] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..converter import load_artifact
from ..models import convert_model, get_model, init_model, packed_apply


def _iterated_forward(spec, static, kernel, compute_dtype, iters,
                      binary_dtype=jnp.int8, domain="float"):
    """Run the model ``iters`` times inside one program.

    Host<->device round-trips here go through a high-latency tunnel, so
    per-dispatch wall-clock timing measures RTT, not the chip. Chaining
    iterations in a ``fori_loop`` with a data dependency (the carry perturbs
    the input, preventing loop-invariant hoisting) and dividing total device
    time by ``iters`` isolates steady-state on-device latency.

    Weights enter as jit arguments (see Interpreter) so the measurement
    includes the real weight HBM reads rather than whatever XLA folded.
    """
    from ..converter import merge_arrays

    def step(layers, x, carry):
        x = x.at[0, 0, 0, 0].add(carry * 1e-12)
        out = packed_apply(spec, layers, x, kernel=kernel,
                           compute_dtype=compute_dtype,
                           binary_dtype=binary_dtype, domain=domain)
        # f32 carry regardless of model output dtype (headless prefix
        # models — section_profile — end in bf16 activations).
        return jnp.mean(out).astype(jnp.float32)

    def run(arrays, x):
        layers = merge_arrays(static, arrays)
        return jax.lax.fori_loop(
            0, iters, lambda i, c: step(layers, x, c), jnp.float32(0.0))

    return jax.jit(run)


def benchmark_model(model="quicknet", batch=8, iters=20, warmup=1,
                    kernel="auto", artifact_path=None, seed=0,
                    compute_dtype=jnp.bfloat16, input_size=None,
                    repeats=5, binary_dtype=jnp.int8, int8_pipeline=False,
                    domain="float"):
    """``domain="packed"``: chain binary->binary layers through bitpacked
    activations (the packed-domain execution mode — BinaryAlexNet's
    conv3/4/5 + fc chain runs bitpacked-in/bitpacked-out through the
    fused threshold+lane-pack Pallas epilogue).

    ``int8_pipeline``: benchmark the true-int8 execution mode — the
    model is calibrated on random batches and converted with input/output
    ranges, so non-binary layers run int8, binary convs emit int8 through
    the fused epilogue, and calibrated residual adds run as int8 ADDs
    (the reference's full-int8 model configuration; accuracy contract in
    tests/test_int8_models.py and the packed_int8 fixture records)."""
    spec = get_model(model) if isinstance(model, str) else model
    if artifact_path:
        _, _, layers = load_artifact(artifact_path)
    else:
        params = init_model(spec, seed=seed, randomize_bn=True)
        if int8_pipeline:
            from ..models import calibrate_model

            crng = np.random.default_rng(seed + 1)
            in_r, out_r = calibrate_model(
                spec, params,
                [crng.normal(0, 1, (8, *(input_size or spec.input_size),
                                    3)).astype(np.float32)
                 for _ in range(2)],
                with_outputs=True)
            layers = convert_model(spec, params, int8_ranges=in_r,
                                   int8_out_ranges=out_r)
        else:
            layers = convert_model(spec, params)
    size = input_size or spec.input_size
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (batch, *size, 3)).astype(np.float32))

    from ..converter import split_arrays
    from ..models import prepare_runtime_arrays

    static, arrays = split_arrays(prepare_runtime_arrays(layers))
    arrays = jax.tree.map(jnp.asarray, arrays)

    # Differencing (see microbench.time_fn): T(2k) - T(k) cancels the fixed
    # per-dispatch tunnel/launch overhead.
    run_k = _iterated_forward(spec, static, kernel, compute_dtype, iters,
                              binary_dtype, domain)
    run_2k = _iterated_forward(spec, static, kernel, compute_dtype,
                               2 * iters, binary_dtype, domain)
    t0 = time.perf_counter()
    np.asarray(run_k(arrays, x))  # compile + first run; fetch forces completion
    compile_time = time.perf_counter() - t0
    np.asarray(run_2k(arrays, x))
    for _ in range(max(warmup - 1, 0)):
        np.asarray(run_k(arrays, x))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run_k(arrays, x))
        t1 = time.perf_counter()
        np.asarray(run_2k(arrays, x))
        t2 = time.perf_counter()
        times.append(max(((t2 - t1) - (t1 - t0)) / iters, 1e-9))
    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))
    result = {
        "model": spec.name,
        "batch": batch,
        "kernel": kernel,
        **({"domain": domain} if domain != "float" else {}),
        "device": str(jax.devices()[0]),
        "compile_s": round(compile_time, 3),
        "latency_ms_p50": round(p50 * 1e3, 4),
        "latency_ms_mean": round(float(times.mean()) * 1e3, 4),
        "latency_ms_min": round(float(times.min()) * 1e3, 4),
        "images_per_sec": round(batch / p50, 2),
    }
    result.update(_memory_metrics(arrays, x))
    try:
        act_mb = _activation_peak_mb(
            spec, static, arrays, x, kernel, compute_dtype, binary_dtype)
        result["act_peak_mb"] = round(act_mb, 2)
        # Estimated peak HBM: resident model + input + a 3-tensor working
        # set at the widest activation (stream in + side + out). The axon
        # tunnel exposes no allocator stats (memory_stats() -> None), so
        # this analytic estimate stands in for the reference benchmark's
        # measured footprint (`lce_benchmark_main.cc:35-49`).
        if "peak_hbm_mb" not in result:
            result["peak_hbm_est_mb"] = round(
                result["weights_mb"] + result["input_mb"] + 3 * act_mb, 1)
    except Exception:
        pass
    return result


def _activation_peak_mb(spec, static, arrays, x, kernel, compute_dtype,
                        binary_dtype):
    """Largest intermediate activation (MB) of the traced forward."""
    from ..converter import merge_arrays

    def step(arrays, x):
        return packed_apply(spec, merge_arrays(static, arrays), x,
                            kernel=kernel, compute_dtype=compute_dtype,
                            binary_dtype=binary_dtype)

    jaxpr = jax.make_jaxpr(step)(arrays, x)
    best = [0]

    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    best[0] = max(best[0], int(np.prod(aval.shape))
                                  * aval.dtype.itemsize)
            for sub in jax.core.jaxprs_in_params(eqn.params):
                walk(sub)

    walk(jaxpr.jaxpr)
    return best[0] / 2 ** 20


def _memory_metrics(arrays, x):
    """Memory footprint metrics (the reference benchmark's memory report,
    `lce_benchmark_main.cc:35-49` via the TFLite tool): resident model
    bytes (packed weights + pre-unpacked +-1 filters + transforms, i.e.
    everything `prepare_runtime_arrays` ships to the device) and — when
    the backend exposes allocator stats — the true peak HBM of the run."""
    leaves = jax.tree.leaves(arrays)
    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in leaves)
    out = {
        "weights_mb": round(weight_bytes / 2 ** 20, 2),
        "input_mb": round(x.size * x.dtype.itemsize / 2 ** 20, 2),
    }
    try:
        stats = jax.devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") if stats else None
        if peak:
            out["peak_hbm_mb"] = round(peak / 2 ** 20, 1)
    except Exception:
        pass  # backend without allocator stats (e.g. CPU test mesh)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="quicknet")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--kernel", default="auto",
                   choices=["auto", "reference", "bgemm", "mxu"])
    p.add_argument("--artifact", default=None)
    p.add_argument("--f32", action="store_true",
                   help="float32 compute for non-binary layers")
    p.add_argument("--int8", action="store_true",
                   help="true-int8 pipeline (calibrated; int8 stream, "
                        "int8 residual adds)")
    p.add_argument("--domain", default="float", choices=["float", "packed"],
                   help="packed = chain binary layers through bitpacked "
                        "activations")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    result = benchmark_model(
        model=args.model, batch=args.batch, iters=args.iters,
        warmup=args.warmup, kernel=args.kernel, artifact_path=args.artifact,
        compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        int8_pipeline=args.int8, domain=args.domain)
    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f"{k:18s} {v}")


if __name__ == "__main__":
    main()
