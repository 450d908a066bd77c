"""Per-section QuickNet timing on the real TPU -> % of int8 speed-of-light.

Times model PREFIXES (stem; +section_0; +transition_1+section_1; ...) with
the tunnel-safe differencing benchmark and subtracts consecutive prefixes,
so each section is measured inside the real whole-model XLA fusion context
(not as an isolated op). Feeds the per-section table in BENCHMARKS.md.

Usage: python scripts/section_profile.py [--batch 128]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SECTION_FILTERS = (64, 128, 256, 512)
SECTION_BLOCKS = (4, 4, 4, 4)

# v5e MXU: 197 T int8 MAC/s (2x the 98.5 T bf16 rate). Our binary convs run
# +-1 int8 operands with int32 accumulation.
INT8_MAC_PER_S = 197e12


def make_prefix_spec(n_sections, with_head):
    """QuickNet prefix: stem + first n_sections (and their transitions)."""
    from compute_engine_tpu.models.zoo import ModelSpec

    def forward(b, x):
        f0 = SECTION_FILTERS[0]
        x = b.conv_bn(x, f0 // 4, 3, stride=2, activation="relu",
                      name="stem_conv")
        x = b.depthwise_conv_bn(x, 3, stride=2, activation="relu",
                                name="stem_depthwise")
        x = b.conv_bn(x, f0, 1, name="stem_pointwise")
        for s in range(n_sections):
            filters, blocks = SECTION_FILTERS[s], SECTION_BLOCKS[s]
            if s > 0:
                x = b.max_pool(x, 2, 2)
                x = b.conv_bn(x, filters, 1, name=f"transition_{s}")
            for i in range(blocks):
                y = b.binary_conv_bn(x, filters, 3, pad_value=1,
                                     name=f"section_{s}_block_{i}")
                x = b.add(x, y)
        if with_head:
            x = b.activation(x, "relu")
            x = b.global_avg_pool(x)
            x = b.dense(x, 1000, name="head")
            x = b.softmax(x)
        return x

    name = f"quicknet_prefix_{n_sections}" + ("_head" if with_head else "")
    return ModelSpec(name, forward, input_size=(224, 224), num_classes=1000)


def section_macs(s, batch):
    """Binary MACs of section s at batch size `batch` (224x224 input)."""
    hw = 56 >> s  # 56, 28, 14, 7
    f = SECTION_FILTERS[s]
    return SECTION_BLOCKS[s] * hw * hw * f * f * 9 * batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    from compute_engine_tpu.runtime.benchmark import benchmark_model

    prefixes = [("stem", make_prefix_spec(0, False))]
    for s in range(4):
        prefixes.append((f"+section_{s}", make_prefix_spec(s + 1, False)))
    prefixes.append(("+head", make_prefix_spec(4, True)))

    times = []
    for label, spec in prefixes:
        r = benchmark_model(model=spec, batch=args.batch, iters=args.iters,
                            warmup=1, repeats=args.repeats)
        times.append(r["latency_ms_p50"])
        print(f"{label:12s} cumulative {r['latency_ms_p50']:8.3f} ms "
              f"({r['images_per_sec']:.0f} img/s)", flush=True)

    report = {"batch": args.batch, "sections": []}
    print("\nper-section deltas:")
    prev = 0.0
    for i, (label, _) in enumerate(prefixes):
        dt_ms = times[i] - prev
        prev = times[i]
        row = {"name": label.lstrip("+"), "ms": round(max(dt_ms, 0.0), 3)}
        if dt_ms < 0:
            # Prefix p50s are measured independently; a cheap section can
            # come out negative from timing noise. Clamp and flag it rather
            # than reporting a negative time.
            row["noise"] = f"raw delta {dt_ms:.3f} ms < 0 (timer noise)"
        if label.startswith("+section"):
            s = int(label[-1])
            macs = section_macs(s, args.batch)
            sol_ms = macs / INT8_MAC_PER_S * 1e3
            row["binary_gmacs"] = round(macs / 1e9, 1)
            row["pct_int8_sol"] = round(100 * sol_ms / max(dt_ms, 1e-9), 1)
            # transition_s is inside this delta for s>0; note it.
            if s > 0:
                row["includes"] = f"transition_{s}"
        print(f"  {row}", flush=True)
        report["sections"].append(row)

    total_macs = sum(section_macs(s, args.batch) for s in range(4))
    report["whole_model"] = {
        "ms": round(times[-1], 3),
        "images_per_sec": round(args.batch / times[-1] * 1e3, 1),
        "binary_gmacs": round(total_macs / 1e9, 1),
        "pct_int8_sol": round(
            100 * (total_macs / INT8_MAC_PER_S * 1e3) / times[-1], 1),
    }
    print("\nwhole model:", report["whole_model"])
    out = os.path.join(os.path.dirname(__file__), "..",
                       "section_profile.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
