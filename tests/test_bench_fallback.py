"""bench.py must never lose the round's number to a kernel regression.

Round 2 lost its benchmark record to a Mosaic compile failure in an
experimental Pallas kernel (`BENCH_r02.json` rc=1). The driver bench now
falls back to the plain "mxu" lowering on any failure in the "auto" path
and reports the error alongside the fallback number (VERDICT.md round-2
item 9). Reference analogue: the benchmark tool always produces a report
(`tflite/benchmark/lce_benchmark_main.cc:35-44`).
"""

import importlib.util
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", str(__import__("pathlib").Path(__file__).parents[1]
                     / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_falls_back_to_mxu_on_auto_failure(monkeypatch, capsys):
    bench = _load_bench()

    def fake_run(kernel):
        if kernel == "auto":
            raise RuntimeError("Mosaic failed to compile TPU kernel: boom")
        assert kernel == "mxu"
        return {"images_per_sec": 12345.0}

    monkeypatch.setattr(bench, "_run", fake_run)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] == 12345.0
    assert rec["kernel"] == "mxu (fallback)"
    assert "Mosaic failed" in rec["auto_kernel_error"]
    assert rec["vs_baseline"] == round(12345.0 / 400.0, 3)


def test_bench_reports_auto_when_healthy(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_run",
                        lambda kernel: {"images_per_sec": 40000.0})
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["kernel"] == "auto"
    assert "auto_kernel_error" not in rec
