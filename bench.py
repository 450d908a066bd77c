"""Driver benchmark: QuickNet packed-inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference engine's best published QuickNet number is 2.5 ms
per image on a Mac Mini M1 with 4 threads (`/root/reference/README.md:67`)
= 400 images/s; vs_baseline = our images/s / 400.

Timing methodology: host<->device round-trips in this environment traverse a
high-latency tunnel, so the model is iterated inside a single jitted
fori_loop (with a data dependency between iterations) and total device time
is divided by the iteration count (see runtime/benchmark.py).

Robustness: a regression in an experimental kernel path must not lose the
round's number (round 2 lost its bench to a Mosaic compile failure in the
fused residual kernel). The primary run uses kernel="auto"; on ANY failure
it falls back to the plain kernel="mxu" lowering and reports the fallback
number together with the captured error, while still exiting non-zero-free
(rc=0) so the driver records a valid measurement. CI separately fails the
regression (scripts/ci.sh runs the auto path directly).
"""

import json
import sys
import traceback


def _run(kernel):
    from compute_engine_tpu.runtime.benchmark import benchmark_model

    # iters=20/repeats=5: the tunnel adds ±8% run-to-run variance at
    # iters=10 (observed 40.4k-47.5k img/s across round-1/2 runs); longer
    # chains + median-of-5 tighten the differencing estimate.
    return benchmark_model(model="quicknet", batch=128, iters=20,
                           warmup=1, repeats=5, kernel=kernel)


def main():
    record = {
        "metric": "quicknet_images_per_sec_per_chip",
        "unit": "images/s",
    }
    try:
        result = _run("auto")
        record["kernel"] = "auto"
    except Exception:
        err = traceback.format_exc()
        sys.stderr.write(err)
        result = _run("mxu")  # plain lowering, no Pallas fusion paths
        record["kernel"] = "mxu (fallback)"
        record["auto_kernel_error"] = err.strip().splitlines()[-1][:500]
    record["value"] = result["images_per_sec"]
    record["vs_baseline"] = round(result["images_per_sec"] / 400.0, 3)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
