"""Evaluation harness tests (synthetic data)."""

import numpy as np

from compute_engine_tpu.runtime.evaluate import evaluate, synthetic_batches


def test_evaluate_perfect_and_random():
    num_classes = 10

    def oracle_fn(x):
        # "Model" that knows the label: encoded in the data generator seed
        # trick below — instead, use deterministic labels equal to argmax of
        # a fixed projection so we can construct a perfect predictor.
        return x.mean(axis=(1, 2)) @ proj

    rng = np.random.default_rng(0)
    proj = rng.normal(0, 1, (3, num_classes)).astype(np.float32)

    batches = []
    for x, _ in synthetic_batches(num_batches=3, batch=16, size=(8, 8),
                                  num_classes=num_classes):
        y = np.argmax(oracle_fn(x), axis=-1)
        batches.append((x, y))

    res = evaluate(oracle_fn, batches, progress_every=0)
    assert res["images"] == 48
    assert res["top1"] == 1.0 and res["top5"] == 1.0

    res_rand = evaluate(lambda x: rng.normal(0, 1, (len(x), num_classes)),
                        batches, progress_every=0)
    assert res_rand["top1"] < 0.5


def test_evaluate_top5_superset():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (32, 4, 4, 3)).astype(np.float32)
    y = rng.integers(0, 10, 32)
    probs = rng.normal(0, 1, (32, 10)).astype(np.float32)
    res = evaluate(lambda _: probs, [(x, y)], progress_every=0)
    assert res["top5"] >= res["top1"]
