#!/usr/bin/env bash
# CI entry point — the analogue of the reference's GitHub Actions matrix
# (`/root/reference/.github/workflows/unittests.yml:17-120`): lint, the full
# CPU-mesh suite, and (when a TPU is attached) the real-device verify drive.
#
# Usage: scripts/ci.sh [--tpu]   (--tpu forces the TPU stage to be required)
set -euo pipefail
cd "$(dirname "$0")/.."
# Self-sufficient imports: the repo is not pip-installed in CI, and the
# TPU-stage scripts (examples/, bench.py) import the package absolutely.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== lint (compile check) =="
python -m compileall -q compute_engine_tpu tests bench.py __graft_entry__.py

echo "== unit + CPU-mesh suite =="
python -m pytest tests/ -q

echo "== TPU verify drive =="
has_tpu=$(python - <<'EOF'
import jax
try:
    print(int(any(d.platform != "cpu" for d in jax.devices())))
except Exception:
    print(0)
EOF
)
if [[ "$has_tpu" == "1" ]]; then
    # Any Mosaic compile error fails loudly here (no CPU-interpret escape).
    timeout 420 python examples/e2e_smoke.py
    timeout 900 python bench.py > /tmp/ci_bench.json
    cat /tmp/ci_bench.json
    # The auto kernel path must be healthy: a fallback record means a
    # Pallas kernel regressed even though bench.py salvaged a number.
    python - <<'EOF'
import json
rec = json.load(open("/tmp/ci_bench.json"))
assert rec.get("kernel") == "auto", f"auto kernel path regressed: {rec}"
EOF
elif [[ "${1:-}" == "--tpu" ]]; then
    echo "ERROR: --tpu requested but no TPU device present" >&2
    exit 1
else
    echo "(no TPU attached — skipped)"
fi
echo "CI OK"
