"""Continuous-batching serving engine tests (CPU)."""

import numpy as np

from compute_engine_tpu.runtime.serving import ServingEngine


def test_serving_batches_and_results(rng):
    calls = []

    def infer_fn(batch):
        calls.append(batch.shape[0])
        # "Model": per-image checksum so results can be matched to requests.
        return batch.sum(axis=(1, 2, 3), keepdims=False)[:, None] * np.ones(
            (batch.shape[0], 4), np.float32)

    images = [rng.normal(0, 1, (8, 8, 3)).astype(np.float32)
              for _ in range(50)]
    with ServingEngine(infer_fn, batch_size=16, max_delay_ms=20) as eng:
        futs = [eng.submit(img) for img in images]
        outs = [f.result(timeout=10) for f in futs]

    for img, out in zip(images, outs):
        np.testing.assert_allclose(out, img.sum() * np.ones(4), rtol=1e-5)
    assert all(c == 16 for c in calls)  # always fixed compiled batch shape
    assert eng.stats.requests == 50
    assert eng.stats.batches >= 4


def test_serving_propagates_errors():
    def infer_fn(batch):
        raise RuntimeError("boom")

    with ServingEngine(infer_fn, batch_size=4, max_delay_ms=5) as eng:
        fut = eng.submit(np.zeros((2, 2, 3), np.float32))
        err = None
        try:
            fut.result(timeout=10)
        except RuntimeError as e:
            err = e
        assert err is not None and "boom" in str(err)
