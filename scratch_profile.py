"""Per-stage timing of QuickNet batch-128 via cumulative prefixes."""
import numpy as np
import jax
import jax.numpy as jnp

from compute_engine_tpu.models import convert_model, init_model
from compute_engine_tpu.models.zoo import ModelSpec, quicknet
from compute_engine_tpu.models.builder import PackedBuilder
from compute_engine_tpu.runtime.microbench import time_fn

BATCH = 128
SPEC = ModelSpec("quicknet", quicknet)
params = init_model(SPEC, seed=0, randomize_bn=True)
layers = convert_model(SPEC, params)


def prefix_forward(b, x, n_stages):
    """QuickNet forward truncated after n_stages stages.

    Stages: 0=stem, 1=sec0, 2=trans1+sec1, 3=trans2+sec2, 4=trans3+sec3,
    5=head."""
    section_filters = (64, 128, 256, 512)
    section_blocks = (4, 4, 4, 4)
    f0 = section_filters[0]
    x = b.conv_bn(x, f0 // 4, 3, stride=2, activation="relu",
                  name="stem_conv")
    x = b.depthwise_conv_bn(x, 3, stride=2, activation="relu",
                            name="stem_depthwise")
    x = b.conv_bn(x, f0, 1, name="stem_pointwise")
    if n_stages < 1:
        return x
    for s, (filters, blocks) in enumerate(
            zip(section_filters, section_blocks)):
        if s + 1 > n_stages:
            return x
        if s > 0:
            x = b.max_pool(x, 2, 2)
            x = b.conv_bn(x, filters, 1, name=f"transition_{s}")
        for i in range(blocks):
            y = b.binary_conv_bn(x, filters, 3, pad_value=1,
                                 name=f"section_{s}_block_{i}")
            x = b.add(x, y)
    if n_stages < 5:
        return x
    x = b.activation(x, "relu")
    x = b.global_avg_pool(x)
    x = b.dense(x, 1000, name="head")
    return b.softmax(x)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (BATCH, 224, 224, 3)).astype(np.float32))

times = []
for n in range(6):
    def fwd(t, n=n):
        b = PackedBuilder(layers, kernel="auto", binary_dtype=jnp.int8)
        return prefix_forward(b, t, n)
    sec = time_fn(fwd, (x,), iters=8, repeats=3)
    times.append(sec)
    print(f"prefix {n}: {sec*1e3:8.3f} ms  "
          f"(stage delta {1e3*(sec - (times[-2] if n else 0)):7.3f} ms)")

names = ["stem", "sec0 (56x56x64)", "t1+sec1 (28x28x128)",
         "t2+sec2 (14x14x256)", "t3+sec3 (7x7x512)", "head"]
print()
prev = 0.0
for name, t in zip(names, times):
    print(f"{name:24s} {1e3*(t-prev):7.3f} ms")
    prev = t
print(f"{'TOTAL':24s} {1e3*times[-1]:7.3f} ms -> "
      f"{BATCH/times[-1]:,.0f} img/s")
