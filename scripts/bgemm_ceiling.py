"""Quantified per-shape ceiling model for the Pallas bgemm kernel.

VERDICT r4 #6: turn the prose roofline argument into a predictive model —
per shape, the kernel's time decomposes into three measurable resources,
and the prediction must match the measured time within 15% or the gap is
unexplained (= optimisation headroom, not a ceiling).

Model (single-K schedule, K-major LHS, int8 planes — kernels/bgemm.py):

  t_pred = L + max(t_hbm, t_mxu + t_vpu)

  t_mxu = Mp * Np * Kbits / R_MXU          padded M/N, Kbits = 32*KW;
                                           R_MXU = v5e int8 MAC rate
  t_vpu = u * Kbits * (Mp * num_j + Np) / R_VPU
                                           in-kernel unpack: the LHS tile is
                                           unpacked once per N strip (num_j
                                           repeats), the weight strip once
                                           per N strip total; u = vector ops
                                           per unpacked bit (shift/and/shl/
                                           sub/convert chain), the model's
                                           ONE calibrated constant
  t_hbm = bytes(LHS streamed per strip + RHS + output) / B_HBM
  L     = fixed dispatch/launch overhead through the tunnel-attached chip

The serial structure (unpack feeds the MXU dot inside each grid step, so
they do NOT overlap — the measured basis of the round-4 "can't hide the
unpack" argument) is the `t_mxu + t_vpu` sum; HBM streaming overlaps the
compute pipeline, hence the outer max.

Run on the TPU:  PYTHONPATH=/root/repo python scripts/bgemm_ceiling.py
Writes bgemm_ceiling.json at the repo root (the committed artifact the
BENCHMARKS.md table quotes).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e per-chip constants.
R_MXU_INT8 = 394e12 / 2   # 394 TOPS int8 => 197e12 MAC/s
R_VPU = 8 * 128 * 4 * 0.94e9  # lanes x sublanes x ALUs x clock ~ 3.85e12/s
B_HBM = 819e9

# Calibrated on the fc-square shape (the MXU-bound regime), then held fixed
# for every other row: vector ops per unpacked bit.
U_OPS_PER_BIT = 4.0
L_OVERHEAD = 1e-6     # in-loop pallas_call invocation (dispatch amortised)
T_GRID_STEP = 0.5e-6  # per grid-step scheduling/prologue cost
R_MXU_FP32 = R_MXU_INT8 / 8  # fp32 MXU rate (the lane-pack dots are f32)

# (M, KW, N, out_kind): the zoo's GEMM population — conv-as-GEMM rows at
# batch 128 and batch 1, the fc shapes, and the bitpacked production
# surface.
SHAPES = [
    (401408, 18, 64, "float"),     # 56x56x64 conv, b128
    (100352, 36, 128, "float"),    # 28x28x128 conv, b128
    (25088, 72, 256, "float"),     # 14x14x256 conv, b128
    (6272, 144, 512, "float"),     # 7x7x512 conv, b128
    (3136, 18, 64, "float"),       # 56x56x64 conv, b1
    (49, 144, 512, "float"),       # 7x7x512 conv, b1
    (4096, 128, 4096, "float"),    # fc-square (the 72%-SOL shape)
    (64, 288, 4096, "float"),      # alexnet fc1 @ b64
    (25088, 72, 256, "bitpacked"),
    (6272, 144, 512, "bitpacked"),
    (4096, 128, 4096, "bitpacked"),
]


def _round_up(x, m):
    return -(-x // m) * m


def predict(m, kw, n, out_kind, block_m, block_n):
    mp = _round_up(m, min(block_m, _round_up(m, 128)))
    np_ = _round_up(n, block_n)
    num_j = np_ // block_n
    kbits = 32 * kw
    t_mxu = mp * np_ * kbits / R_MXU_INT8
    t_vpu = U_OPS_PER_BIT * kbits * (mp * num_j + np_) / R_VPU
    if out_kind == "bitpacked":
        out_bytes = mp * (np_ // 32) * 4
        # Two extra lane-pack matmuls per tile: bits (TM,TN) @ (TN, TN/32)
        # in FP32 (exactness of the power-of-two sums) — the fp32 MXU rate,
        # 1/8 of int8, is what makes this term visible on wide-N tiles.
        t_mxu += 2 * mp * np_ * (np_ // 32) / R_MXU_FP32
    else:
        out_bytes = mp * np_ * 4
    t_hbm = (4 * mp * kw * num_j + 4 * kw * np_ + out_bytes) / B_HBM
    # K-major LHS feed: the (M, KW) -> (KW, M) transpose of the packed
    # words is a separate XLA pass (read + write) that cannot overlap the
    # kernel — serial prologue.
    t_pre = 2 * 4 * mp * kw / B_HBM
    n_steps = (mp // min(1024, mp)) * num_j
    t_steps = T_GRID_STEP * n_steps
    return L_OVERHEAD + t_pre + t_steps + max(t_hbm, t_mxu + t_vpu), {
        "t_mxu_us": t_mxu * 1e6, "t_vpu_us": t_vpu * 1e6,
        "t_hbm_us": t_hbm * 1e6, "t_pre_us": t_pre * 1e6,
        "t_steps_us": t_steps * 1e6,
    }


def main():
    import numpy as np
    import jax.numpy as jnp

    from compute_engine_tpu.kernels import bgemm as bgemm_mod
    from compute_engine_tpu.kernels.bgemm import _pick_blocks, bgemm
    from compute_engine_tpu.runtime.microbench import time_fn

    rng = np.random.default_rng(0)
    rows = []
    for (m, kw, n, out_kind) in SHAPES:
        lhs = jnp.asarray(rng.integers(0, 2 ** 32, (m, kw), dtype=np.uint32))
        rhs = jnp.asarray(rng.integers(0, 2 ** 32, (kw, n), dtype=np.uint32))
        if out_kind == "bitpacked":
            thr = jnp.asarray(
                rng.integers(kw * 16 - 30, kw * 16 + 30, n).astype(np.int32))
            fn = lambda a, b: bgemm(a, b, thresholds=thr,
                                    out_kind="bitpacked")
        else:
            mul = jnp.asarray(rng.uniform(0.1, 2, n).astype(np.float32))
            bias = jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32))
            fn = lambda a, b: bgemm(a, b, mul, bias, out_kind="float")
        # Chain length targeting ~10 ms of device time per loop (est. at
        # ~half SOL): short chains leave the differencing inside tunnel
        # noise and overstate the per-iteration time.
        est_s = m * n * kw * 32 / (0.5 * R_MXU_INT8) + 20e-6
        iters = int(max(30, min(3000, 10e-3 / est_s)))
        t = None
        for attempt in range(3):
            try:
                t = time_fn(fn, (lhs, rhs), iters=iters,
                            dynamic_iters=True, min_loop_s=3e-3)
                break
            except Exception as e:  # transient relay failures
                print(f"  retry {attempt + 1} after: {e}", flush=True)
                import time as _t
                _t.sleep(15)
        if t is None:
            print(f"  SKIPPED {(m, kw, n, out_kind)}", flush=True)
            continue

        block_m, block_n, block_kw, num_k = _pick_blocks(m, kw, n,
                                                         plane_bytes=1)
        if out_kind == "bitpacked":
            np128 = _round_up(n, 128)
            if 32 * kw * np128 <= 2 * bgemm_mod._WEIGHT_SCRATCH_BUDGET:
                block_n = np128
        t_pred, parts = predict(m, kw, n, out_kind, block_m, block_n)
        macs = m * n * kw * 32
        rows.append({
            "m": m, "kw": kw, "n": n, "out_kind": out_kind,
            "num_k": num_k, "block_n": block_n,
            "measured_us": round(t * 1e6, 1),
            "predicted_us": round(t_pred * 1e6, 1),
            "residual_pct": round(100 * (t - t_pred) / t, 1),
            "tmacs_per_s": round(macs / t / 1e12, 1),
            "pct_int8_sol": round(100 * macs / t / R_MXU_INT8, 1),
            "bound": max(("hbm", parts["t_hbm_us"]),
                         ("mxu+vpu",
                          parts["t_mxu_us"] + parts["t_vpu_us"]),
                         key=lambda kv: kv[1])[0],
            **{k: round(v, 1) for k, v in parts.items()},
        })
        print(rows[-1], flush=True)

    out = {
        "_meta": {
            "model": "t = L + t_pre + t_steps + max(t_hbm, t_mxu+t_vpu); "
                     "u=%.1f ops/bit" % U_OPS_PER_BIT,
            "constants": {"R_MXU_int8_mac_s": R_MXU_INT8,
                          "R_VPU_ops_s": R_VPU, "B_HBM_B_s": B_HBM,
                          "u_ops_per_bit": U_OPS_PER_BIT,
                          "L_overhead_s": L_OVERHEAD},
        },
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bgemm_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
