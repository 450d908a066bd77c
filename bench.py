"""Driver benchmark: QuickNet packed-inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference engine's best published QuickNet number is 2.5 ms
per image on a Mac Mini M1 with 4 threads (`/root/reference/README.md:67`)
= 400 images/s; vs_baseline = our images/s / 400.

Timing methodology: host<->device round-trips in this environment traverse a
high-latency tunnel, so the model is iterated inside a single jitted
fori_loop (with a data dependency between iterations) and total device time
is divided by the iteration count (see runtime/benchmark.py).
"""

import json
import sys


def main():
    from compute_engine_tpu.runtime.benchmark import benchmark_model

    # iters=20/repeats=5: the tunnel adds ±8% run-to-run variance at
    # iters=10 (observed 40.4k-47.5k img/s across round-1/2 runs); longer
    # chains + median-of-5 tighten the differencing estimate.
    result = benchmark_model(model="quicknet", batch=128, iters=20,
                             warmup=1, repeats=5, kernel="auto")
    print(json.dumps({
        "metric": "quicknet_images_per_sec_per_chip",
        "value": result["images_per_sec"],
        "unit": "images/s",
        "vs_baseline": round(result["images_per_sec"] / 400.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
