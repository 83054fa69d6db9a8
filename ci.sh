#!/usr/bin/env bash
# CI gate: lint + compile + unit tests (the analogue of the reference's
# check_clang_format workflow + ctest; .github/workflows/, CMakeLists.txt).
# Usage: ./ci.sh            (CPU: lint + tests)
#        ./ci.sh --tpu      (additionally drives the TPU verification sweep)
set -euo pipefail
cd "$(dirname "$0")"

echo "== lint =="
if command -v ruff >/dev/null 2>&1; then
  ruff check .
else
  python scripts/lint.py
fi

echo "== compile =="
python -m compileall -q portfft_tpu tests scripts bench.py __graft_entry__.py

echo "== unit tests (CPU, 8-device virtual mesh) =="
python -m pytest tests/ -q

if [[ "${1:-}" == "--tpu" ]]; then
  echo "== TPU verification sweep =="
  python scripts/verify_tpu.py
fi

echo "CI OK"
