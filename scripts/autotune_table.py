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


def _zoo_missing_plan(select):
    """Enumerate every select key the nine zoo models consult at batch
    1/8/128 (float domain + alexnet's packed-chain bitpacked keys) and plan
    the measurements that cover the uncovered ones: exact cells where a key
    has no measured entry and its bucket has no representative yet, one
    representative per bucket (the bucket's largest-GEMM zoo member).

    Returns a list of measurement cells, most-important regime first:
      ("conv", shape_dict, batch, out_kind, record_bucket)
      ("dense", (c_in, units), batch, record_bucket)
    """
    from compute_engine_tpu.models.shapes import binary_layer_shapes
    from compute_engine_tpu.models.zoo import MODELS

    # bucket key -> (gemm_size, cell) best representative
    reps = {}

    def consider(bucket, gemm, cell):
        if bucket not in reps or gemm > reps[bucket][0]:
            reps[bucket] = (gemm, cell)

    for name in MODELS:
        for batch in (128, 1, 8):
            convs, denses = binary_layer_shapes(MODELS[name], batch=batch)
            for r in convs:
                fhw = r["fh"] * r["fw"]
                # (consulted domain, out_kind) pairs per execution mode:
                # default float-domain execution consults ("float", "float");
                # the packed-domain chain model (alexnet) additionally
                # consults ("packed", "bitpacked") via ops.bconv2d.
                kinds = [("float", "float")]
                if name == "binary_alexnet":
                    kinds.append(("packed", "bitpacked"))
                for domain, out_kind in kinds:
                    k = select._key(domain, r["c_in"], r["c_out"], fhw,
                                    r["m"], out_kind)
                    if k in select._TABLE:
                        continue
                    bk = select._bucket_key(domain, r["c_in"], r["c_out"],
                                            fhw, r["m"], out_kind)
                    gemm = r["m"] * r["c_in"] * fhw * r["c_out"]
                    shape = {"h": r["h"], "w": r["w"], "c_in": r["c_in"],
                             "c_out": r["c_out"], "fh": r["fh"],
                             "fw": r["fw"], "stride": r["stride"],
                             "pad_value": r["pad_value"]}
                    consider(bk, gemm, ("conv", shape, batch, out_kind))
            for r in denses:
                k = select._key("float", r["c_in"], r["units"], 1, r["m"],
                                "float")
                if k in select._TABLE:
                    continue
                bk = select._bucket_key("float", r["c_in"], r["units"], 1,
                                        r["m"], "float")
                consider(bk, r["m"] * r["c_in"] * r["units"],
                         ("dense", (r["c_in"], r["units"]), batch, "float"))

    # Order: throughput regime (batch 128) first, then serving (1), then 8;
    # float before bitpacked within a batch.
    def order(item):
        cell = item[1][1]
        batch = cell[2]
        return ({128: 0, 1: 1, 8: 2}[batch], 0 if cell[3] == "float" else 1)

    return [cell for _, (_, cell) in sorted(reps.items(),
                                            key=order)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="batch 128 + float only (fast sanity regen)")
    p.add_argument("--configs", default=None,
                   help="comma list like '128:float,8:bitpacked' — run a "
                        "subset and MERGE into the existing table file "
                        "(each config is ~40 TPU compiles; run them "
                        "incrementally)")
    p.add_argument("--zoo-missing", action="store_true",
                   help="measure one representative per UNCOVERED bucket of "
                        "the nine zoo models' select keys (batch 1/8/128), "
                        "writing exact + bucket winners incrementally")
    p.add_argument("--limit", type=int, default=0,
                   help="with --zoo-missing: measure at most N cells")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    from compute_engine_tpu.kernels import select

    if args.zoo_missing:
        select.reset_table()  # shipped defaults = already-measured keys
        cells = _zoo_missing_plan(select)
        if args.limit:
            cells = cells[:args.limit]
        print(f"{len(cells)} uncovered bucket representatives to measure",
              flush=True)
        raw = {}

        def interpolate(cell):
            """Batch-8 is bracketed by the measured batch-128 and batch-1
            regimes: when every measured m-bucket of the same bucket family
            (domain, c-buckets, fhw, out_kind) agrees on a winner, the
            middle bucket inherits it without burning ~5 tunnel-minutes of
            compiles; a disagreement forces a real measurement."""
            kind, shape, batch, out_kind = cell
            if batch != 8:
                return None
            domain = "packed" if out_kind == "bitpacked" else "float"
            if kind == "conv":
                from compute_engine_tpu.models.shapes import _ShapeRecorder
                from compute_engine_tpu.core.params import BConv2DParams
                from compute_engine_tpu.core.types import Padding
                params = BConv2DParams(
                    channels_in=shape["c_in"], stride=tuple(shape["stride"]),
                    padding=Padding.SAME, pad_value=shape["pad_value"])
                oh, ow, _, _ = params.output_spatial(
                    shape["h"], shape["w"], shape["fh"], shape["fw"])
                bk = select._bucket_key(domain, shape["c_in"],
                                        shape["c_out"],
                                        shape["fh"] * shape["fw"],
                                        batch * oh * ow, out_kind)
            else:
                c_in, units = shape
                bk = select._bucket_key(domain, c_in, units, 1, batch,
                                        out_kind)
            family = bk[:5] + bk[6:]
            entries = [v for k, v in select._TABLE.items()
                       if k[0] == "b" and k[:5] + k[6:] == family]
            # Interpolation needs BOTH bracketing regimes measured AND
            # agreeing; a single-regime family is not evidence for the
            # middle bucket (the fc family's batch-128 and batch-8 winners
            # genuinely differ, for example).
            if len(entries) >= 2 and len(set(entries)) == 1:
                select._TABLE[bk] = entries[0]
                return entries[0]
            return None

        for i, cell in enumerate(cells):
            kind = cell[0]
            w = interpolate(cell)
            if w is not None:
                print(f"[{i + 1}/{len(cells)}] b8 {cell[3]} {cell[1]}: "
                      f"interpolated -> {w} (bracketing regimes agree)",
                      flush=True)
                _write(select, jax, raw)
                continue
            # Measure only the domain this cell's execution mode consults —
            # remote compiles dominate wall-clock (~1 min/candidate), and a
            # float-domain model never dispatches a packed-domain entry.
            # s2d's rationale is MXU lane underfill at c_in < 128 (it lost
            # at every measured c_in >= 128 shape, BENCHMARKS.md round 4),
            # so it is only measured where it can win.
            if kind == "conv":
                _, shape, batch, out_kind = cell
                if out_kind == "bitpacked":
                    cands = {"packed/bgemm", "packed/mxu"}
                else:
                    cands = {"float/mxu", "float/bgemm"}
                    if shape["c_in"] < 128:
                        cands.add("float/s2d")
                res = select.autotune_bconv2d(
                    [shape], batch=batch, out_kind=out_kind,
                    iters=args.iters, record_bucket=True, candidates=cands)
            else:
                _, shape, batch, out_kind = cell
                res = select.autotune_bdense(
                    [shape], batch=batch, iters=args.iters,
                    record_bucket=True,
                    candidates={"float/mxu", "float/bgemm"})
            for skey, per in res.items():
                pretty = {f"{d}/{k}": round(t * 1e6, 1)
                          for (d, k), t in per.items()}
                print(f"[{i + 1}/{len(cells)}] b{batch} {out_kind} "
                      f"{skey}: {pretty}", flush=True)
                raw[f"{batch}|{out_kind}|{skey}"] = pretty
            _write(select, jax, raw)  # checkpoint after every cell
        return

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
