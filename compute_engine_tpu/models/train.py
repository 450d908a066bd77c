"""Brief QAT training on synthetic data — realistic weights/BN for fixtures.

The reference validates conversion with models *briefly trained* on real
data so BatchNorm statistics are realistic rather than random
(`tests/end2end_test.py:199-206` trains on tf_flowers before asserting
converted-vs-Keras agreement). This module is the TPU-native analogue for an
offline environment: a few Adam steps of straight-through-estimator training
(``layers.ste_sign`` carries the clipped-identity gradient) on a synthetic
*clustered* dataset (class prototypes + noise), followed by writing the
observed batch statistics into the BN moving stats. The result is a
parameter tree whose logits are class-separated and whose BN folds are
realistic — the substrate for the committed golden-logit accuracy fixtures
(tests/test_accuracy_fixtures.py).

This is NOT a training framework (the reference has none either); it exists
to manufacture honest conversion-accuracy evidence.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import layers as L
from .builder import FloatBuilder

__all__ = ["TrainBuilder", "make_prototypes", "clustered_batch",
           "synthetic_clustered", "train_briefly", "recalibrate_bn_stats"]


class TrainBuilder(FloatBuilder):
    """QAT float forward using BATCH statistics for BN (training mode).

    Records per-layer batch (mean, var) in ``self.batch_stats`` so the
    training loop can update the moving statistics, and returns logits from
    ``softmax`` (identity) so the loss can use a numerically-stable fused
    softmax-cross-entropy.
    """

    def __init__(self, params, bn_eps=L.BN_EPSILON):
        super().__init__(params)
        self.batch_stats = {}
        # Training-only epsilon. Deep binarised concat topologies
        # (BinaryDenseNet) produce channels whose binary-conv output is
        # CONSTANT across a clustered batch (batch var exactly 0): the
        # backward then multiplies cotangents by rsqrt(eps) per layer —
        # 316x at the inference epsilon — and overflows to inf within a
        # block. A larger training epsilon caps the amplification; the
        # inference/conversion path keeps Keras' exact 1e-5 (precise-BN
        # recalibration writes the final statistics anyway).
        self.bn_eps = bn_eps

    def _apply_bn(self, y, name):
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(y, axis=axes)
        var = jnp.var(y, axis=axes)
        self.batch_stats[name] = (mean, var)
        bn = self._bn(name)
        scale = bn["gamma"] * jax.lax.rsqrt(var + self.bn_eps)
        return (y - mean) * scale + bn["beta"]

    def softmax(self, x):
        return x.astype(jnp.float32)  # logits; loss applies log-softmax


def make_prototypes(seed, size, num_classes):
    """Unit-norm class prototype images, deterministic in ``seed``.

    Train AND eval batches must share prototypes: a class-separable
    distribution is what makes the trained model's logits decisive, so
    top-1 agreement between execution paths is evidence rather than a coin
    flip on near-uniform logits."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(0, 1, (num_classes, *size, 3)).astype(np.float32)
    protos /= np.sqrt((protos ** 2).mean(axis=(1, 2, 3), keepdims=True))
    return protos


def clustered_batch(protos, rng, batch, spread=0.35):
    """One labelled batch drawn around the given prototypes."""
    y = rng.integers(0, len(protos), batch)
    x = protos[y] + rng.normal(0, spread, (batch, *protos.shape[1:]))
    return x.astype(np.float32), y


def synthetic_clustered(rng, batch, size, num_classes, spread=0.35,
                        protos=None):
    """Endless stream of clustered batches (prototypes drawn from ``rng``
    unless given)."""
    if protos is None:
        protos = make_prototypes(rng, size, num_classes)
    while True:
        yield clustered_batch(protos, rng, batch, spread)


def train_briefly(spec, params, *, steps=40, batch=32, lr=2e-3, seed=0,
                  num_classes=None, bn_momentum=0.7, data=None, protos=None,
                  clip_norm=None, bn_eps=L.BN_EPSILON):
    """A few Adam+STE steps; returns a trained numpy parameter tree.

    BN moving statistics are replaced by the running average of the observed
    batch statistics (momentum ``bn_momentum``), i.e. the forward used for
    conversion sees BN folds consistent with the data distribution.
    ``clip_norm``: optional global-norm gradient clipping — deep concat
    topologies (BinaryDenseNet) diverge at the default lr without it.
    ``bn_eps``: TRAINING-mode BN epsilon, forwarded to TrainBuilder (the
    rsqrt-amplification guard documented there); inference/conversion keep
    Keras' exact 1e-5.
    """
    import optax

    num_classes = num_classes or spec.num_classes
    rng = np.random.default_rng(seed)
    stream = data if data is not None else synthetic_clustered(
        rng, batch, spec.input_size, num_classes, protos=protos)

    params = jax.tree_util.tree_map(jnp.asarray, dict(params))
    opt = (optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))
           if clip_norm else optax.adam(lr))
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        b = TrainBuilder(p, bn_eps=bn_eps)
        logits = spec.forward(b, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        return loss, b.batch_stats

    @jax.jit
    def step(p, opt_state, x, y):
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, x, y)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        # BN moving-stat update (Keras semantics: m*old + (1-m)*batch).
        for name, (mean, var) in stats.items():
            bn = p[name]["bn"]
            bn["moving_mean"] = (bn_momentum * bn["moving_mean"]
                                 + (1 - bn_momentum) * mean)
            bn["moving_variance"] = (bn_momentum * bn["moving_variance"]
                                     + (1 - bn_momentum) * var)
        return p, opt_state, loss

    losses = []
    for _ in range(steps):
        x, y = next(stream)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    return (jax.tree_util.tree_map(np.asarray, params),
            {"loss_first": losses[0], "loss_last": losses[-1]})


def recalibrate_bn_stats(spec, params, batches):
    """Replace BN moving statistics with exact dataset statistics
    ("precise BN" — classic train-mode collection).

    The EMA snapshot left by brief training is an effective ~3-batch
    window at momentum 0.7 — a HIGH-VARIANCE estimate of the statistics
    the QAT forward actually normalised with; in a binarised net that
    noise parks hidden pre-activations across sign boundaries and the
    flips cascade (the round-3 Bi-RealNet-18 fixture failed its oracle
    gate at 0.898 for exactly this reason). This runs the forward in
    TRAINING mode — every BN normalising with its own batch statistics,
    exactly the distribution the weights were trained under — over all
    ``batches``, aggregates each BN input's per-batch (mean, var) exactly
    (law of total variance over equal-sized batches), and writes the
    result into the moving stats: a low-variance estimate over the whole
    calibration set.

    NOTE a self-consistent inference-mode iteration (record stats while
    normalising with the current MOVING stats, iterate to a fixed point)
    was tried first and DIVERGES on Bi-RealNet (oracle 0.898 -> 0.273):
    with real-valued shortcuts the stats -> signs -> stats feedback map is
    not contractive. Train-mode collection has no feedback loop.

    ``batches``: list of input arrays (equal batch sizes for the exact
    aggregation). Returns a new numpy parameter tree.
    """
    params = jax.tree_util.tree_map(jnp.asarray, dict(params))

    @jax.jit
    def stats_of(p, x):
        b = TrainBuilder(p)
        spec.forward(b, x)
        return b.batch_stats

    collected = {}
    for x in batches:
        for name, (mean, var) in stats_of(params, jnp.asarray(x)).items():
            collected.setdefault(name, []).append(
                (np.asarray(mean), np.asarray(var)))
    for name, mv in collected.items():
        means = np.stack([m for m, _ in mv])
        bvars = np.stack([v for _, v in mv])
        bn = params[name]["bn"]
        bn["moving_mean"] = jnp.asarray(means.mean(0))
        # Law of total variance over equally-sized batches.
        bn["moving_variance"] = jnp.asarray(bvars.mean(0) + means.var(0))
    return jax.tree_util.tree_map(np.asarray, params)
