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

    result = benchmark_model(model="quicknet", batch=128, iters=10,
                             warmup=1, repeats=3, kernel="auto")
    print(json.dumps({
        "metric": "quicknet_images_per_sec_per_chip",
        "value": result["images_per_sec"],
        "unit": "images/s",
        "vs_baseline": round(result["images_per_sec"] / 400.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
