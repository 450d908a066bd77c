"""Regenerate the shipped kernel-selection table on the current TPU.

Measures every candidate lowering for the Larq-Zoo binary-conv layer shapes
(batch 8 and 128, float and bitpacked output kinds) with the honest
differencing timer and writes the winners to
``compute_engine_tpu/kernels/kernel_table.json`` — the analogue of the
reference's measured static kernel-selection rules
(`core/indirect_bgemm/select_kernel.h:30-142`), except regenerable on
device. ``kernels.select`` loads this file as its built-in default table.

Usage: PYTHONPATH=/root/repo python scripts/autotune_table.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# QuickNet / Bi-RealNet / BinaryResNetE block shapes (h, w, c_in, c_out, fh)
ZOO_SHAPES = [
    (56, 56, 64, 64, 3),
    (28, 28, 128, 128, 3),
    (14, 14, 256, 256, 3),
    (7, 7, 512, 512, 3),
]

OUT = os.path.join(os.path.dirname(__file__), "..", "compute_engine_tpu",
                   "kernels", "kernel_table.json")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="batch 128 + float only (fast sanity regen)")
    p.add_argument("--configs", default=None,
                   help="comma list like '128:float,8:bitpacked' — run a "
                        "subset and MERGE into the existing table file "
                        "(each config is ~40 TPU compiles; run them "
                        "incrementally)")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    from compute_engine_tpu.kernels import select

    select.reset_table()
    select._TABLE.clear()  # measure fresh — no stale defaults
    if args.configs:
        configs = [(int(b), k) for b, k in
                   (c.split(":") for c in args.configs.split(","))]
    elif args.quick:
        configs = [(128, "float")]
    else:
        # batch 1 covers the serving/p50 regime (VERDICT r3 #6): MXU-fill
        # tradeoffs differ at M = out_h*out_w and s2d gets its one fair shot.
        configs = [(128, "float"), (8, "float"), (1, "float"),
                   (128, "bitpacked"), (8, "bitpacked"), (1, "bitpacked")]

    raw = {}
    for batch, out_kind in configs:
        print(f"== batch {batch} out_kind {out_kind}", flush=True)
        res = select.autotune_bconv2d(ZOO_SHAPES, batch=batch,
                                      out_kind=out_kind, iters=args.iters)
        for shape, per in res.items():
            pretty = {f"{d}/{k}": round(t * 1e6, 1)
                      for (d, k), t in per.items()}
            print(f"  {shape}: {pretty}", flush=True)
            raw[f"{batch}|{out_kind}|{shape}"] = pretty
        _write(select, jax, raw)  # checkpoint after every config


def _write(select, jax, raw):
    try:
        with open(OUT) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    meta = data.pop("_meta", {})
    data.update({"|".join(str(x) for x in k): v
                 for k, v in select.kernel_table().items()})
    meta.update({
        "device": str(jax.devices()[0]),
        "timer": "fori differencing + optimization_barrier (round 3)",
    })
    meta.setdefault("raw_us", {}).update(raw)
    data["_meta"] = meta
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print("wrote", OUT, f"({len(data) - 1} entries)", flush=True)


if __name__ == "__main__":
    main()
