"""Per-kernel microbenchmarks and roofline reporting.

Counterpart of the reference's ruy-profiler treeview + per-kernel benchmarks
(SURVEY.md §5 tracing). Times a single op in a jitted fori_loop with a data
dependency (tunnel-safe, see runtime/benchmark.py) and reports achieved
binary-MAC throughput against the MXU speed-of-light.

v5e speed-of-light: 197 TFLOP/s bf16 = 98.5e12 MAC/s; one binary MAC is one
MXU bf16 MAC in our +-1 formulation, so utilization = binary_MACs/s / SOL.

Usage:
  python -m compute_engine_tpu.runtime.microbench [--preset quicknet]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

MXU_MAC_PER_S = {"v5e": 98.5e12}


def time_fn(fn, args, iters=100, repeats=3, perturb=None,
            dynamic_iters=False, min_loop_s=None):
    """Per-iteration seconds of fn(*args) chained in one program.

    Host round-trips here cross a ~35ms-RTT tunnel, so wall-clock timing of
    one dispatch measures the tunnel, not the chip. We run the op chained
    ``iters`` and ``2*iters`` times in two jitted fori_loops and report
    (T(2k) - T(k)) / k: differencing cancels ALL fixed per-dispatch overhead
    (RTT, transfers, launch), leaving pure on-device iteration time.

    ``perturb(args, carry)`` must inject the scalar carry into the inputs to
    create a loop-carried dependency; default perturbs the first arg.

    ``dynamic_iters``: chain with a TRACED trip count so ONE compiled
    program serves both the k and 2k runs — halves the remote-compile cost
    (the dominant expense of autotune sweeps through the tunnel, ~40-60s
    per program). The loop lowers to a while_loop; per-iteration device
    work is identical, so the differenced time matches the static variant
    within noise.
    """

    if perturb is None:
        def perturb(args, c):
            a0 = args[0]
            if jnp.issubdtype(a0.dtype, jnp.floating):
                a0 = a0 + (c * 1e-20).astype(a0.dtype)
            else:
                # Real (but harmless) data change so the loop body cannot be
                # hoisted as invariant: XOR the low bit with a traced value.
                a0 = a0 ^ (c.astype(jnp.uint32) & jnp.uint32(1))
            return (a0, *args[1:])

    def body(_, carry):
        out = fn(*perturb(args, carry))
        # The barrier forces the FULL result to be materialised. Without it
        # XLA slices the body back through the op to the single element the
        # carry consumes (it narrows convs and elementwise producers), and
        # the measurement collapses to near zero for single-op graphs.
        leaves = jax.lax.optimization_barrier(jax.tree_util.tree_leaves(out))
        return leaves[0].ravel()[0].astype(jnp.float32)

    if dynamic_iters:
        # Operands enter as jit PARAMETERS here (not closed-over
        # constants): huge inputs would otherwise be embedded in the HLO
        # and blow the remote-compile relay's request-size limit (HTTP 413
        # at ~300 MB), and parameters match the production weights-as-args
        # regime (nothing constant-folds).
        def dyn_fn(n, a):
            def pbody(_, carry):
                out = fn(*perturb(a, carry))
                leaves = jax.lax.optimization_barrier(
                    jax.tree_util.tree_leaves(out))
                return leaves[0].ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, pbody, jnp.float32(0))

        dyn = jax.jit(dyn_fn)

        def make_run(n):
            return lambda: dyn(jnp.int32(n), args)
    else:
        def make_run(n):
            return jax.jit(
                lambda: jax.lax.fori_loop(0, n, body, jnp.float32(0)))

    def measure(k):
        run_k, run_2k = make_run(k), make_run(2 * k)
        np.asarray(run_k())  # compile + warmup
        np.asarray(run_2k())
        deltas = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run_k())
            t1 = time.perf_counter()
            np.asarray(run_2k())
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / k)
        return max(float(np.median(deltas)), 1e-9)

    t = measure(iters)
    if min_loop_s:
        k = iters
        for _ in range(3):
            if t * k >= min_loop_s and t > 1e-8:
                break
            # Too short for the differencing to rise above tunnel noise
            # (or a transient collapsed the delta to the 1e-9 floor):
            # re-measure with a loop long enough to cross it. With
            # dynamic_iters the SAME compiled program is reused.
            k = min(int(min_loop_s / max(t, 2e-7)) + 1, 5000)
            t = measure(k)
    return t


def bench_bconv(shape, c_out, ksize=3, kernel="mxu", iters=30,
                generation="v5e", batch=None):
    """Benchmark one bconv2d; returns dict with time and MXU utilization."""
    from ..core.bitpack import bitpack
    from ..core.params import BConv2DParams
    from ..core.transforms import fuse_output_transform
    from ..core.types import Padding
    from ..ops import bconv2d

    n, h, w, c = shape
    rng = np.random.default_rng(0)
    x = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=shape).astype(np.float32)))
    wt = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(c_out, ksize, ksize, c)).astype(
            np.float32)))
    params = BConv2DParams(channels_in=c, padding=Padding.SAME)
    t = fuse_output_transform(
        rng.uniform(0.5, 1.5, c_out).astype(np.float32),
        rng.uniform(-1, 1, c_out).astype(np.float32),
        ksize * ksize * c)

    sec = time_fn(lambda xp, wp: bconv2d(xp, wp, t, params, "float",
                                         kernel=kernel),
                  (x, wt), iters=iters)
    macs = n * h * w * c_out * ksize * ksize * c  # SAME padding, stride 1
    sol = MXU_MAC_PER_S[generation]
    return {
        "op": f"bconv2d[{kernel}]",
        "shape": f"{shape}x{c_out}o{ksize}k",
        "ms": round(sec * 1e3, 4),
        "binary_tmacs": round(macs / sec / 1e12, 2),
        "mxu_util": round(macs / sec / sol, 3),
    }


def bench_quantize(shape, iters=50):
    from ..ops import quantize

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    sec = time_fn(lambda t: quantize(t), (x,), iters=iters)
    gb = np.prod(shape) * 4 / 1e9
    return {"op": "quantize", "shape": str(shape), "ms": round(sec * 1e3, 4),
            "GBps": round(gb / sec, 1)}


QUICKNET_LAYERS = [
    # (activation shape at batch 8, c_out) for one block of each section
    ((8, 56, 56, 64), 64),
    ((8, 28, 28, 128), 128),
    ((8, 14, 14, 256), 256),
    ((8, 7, 7, 512), 512),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="quicknet")
    p.add_argument("--kernels", default="mxu,bgemm")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    for shape, c_out in QUICKNET_LAYERS:
        for k in args.kernels.split(","):
            r = bench_bconv(shape, c_out, kernel=k, iters=args.iters)
            print({**r})
        print(bench_quantize(shape))


if __name__ == "__main__":
    main()
