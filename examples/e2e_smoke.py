"""End-to-end drive of the public API on the real TPU chip."""
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices())

import compute_engine_tpu as ce
from compute_engine_tpu.core import (BConv2DParams, Padding, Activation,
                                     fuse_output_transform, compute_output_thresholds, OutputTransform)
from compute_engine_tpu.ops import bconv2d, bmaxpool2d, quantize, dequantize

rng = np.random.default_rng(0)
# A user flow: float +-1 feature map -> quantize -> bconv (3 kernels) -> bmaxpool -> dequantize
x = rng.choice([-1.0, 1.0], size=(2, 16, 16, 64)).astype(np.float32)
w = rng.choice([-1.0, 1.0], size=(128, 3, 3, 64)).astype(np.float32)
post_mul = rng.uniform(0.5, 1.5, 128).astype(np.float32)
post_bias = rng.uniform(-2, 2, 128).astype(np.float32)

params = BConv2DParams(channels_in=64, padding=Padding.SAME, pad_value=1,
                       activation=Activation.NONE)
t = fuse_output_transform(post_mul, post_bias, 3*3*64)

xp = quantize(jnp.asarray(x))
wp = quantize(jnp.asarray(w))
print("packed input:", xp.shape, xp.dtype, "packed filter:", wp.shape)

outs = {}
for k in ("reference", "bgemm", "mxu"):
    outs[k] = np.asarray(jax.jit(lambda xp, wp, k=k: bconv2d(xp, wp, t, params, "float", kernel=k))(xp, wp))
    print(f"kernel={k:10s} out {outs[k].shape} mean={outs[k].mean():.4f}")
print("bgemm vs reference max|diff|:", np.abs(outs["bgemm"]-outs["reference"]).max())
print("mxu   vs reference max|diff|:", np.abs(outs["mxu"]-outs["reference"]).max())

# bitpacked output chain -> bmaxpool -> dequantize
thr = compute_output_thresholds(post_mul, post_bias, 3*3*64)
wflip = w * np.where(post_mul >= 0, 1.0, -1.0)[:, None, None, None]
tp = OutputTransform(thresholds=thr)
packed_out = bconv2d(xp, quantize(jnp.asarray(wflip)), tp, params, "bitpacked", kernel="mxu")
pooled = bmaxpool2d(packed_out, 2, 2)
deq = dequantize(pooled, 128)
print("bitpacked chain:", packed_out.shape, packed_out.dtype, "->", pooled.shape, "-> deq", deq.shape, "unique", np.unique(np.asarray(deq)))
ref_packed = np.asarray(bconv2d(xp, quantize(jnp.asarray(wflip)), tp, params, "bitpacked", kernel="reference"))
print("bitpacked mxu == reference:", bool(np.array_equal(np.asarray(packed_out), ref_packed)))
