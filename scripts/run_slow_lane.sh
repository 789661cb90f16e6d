#!/bin/bash
# Slow-lane CI: runs the slow-marked integration tests (MUSE end-to-end,
# theta-posterior calibration, long samplers) that the default
# `pytest tests/` deselects via pytest.ini addopts.
#
# VERDICT r1 item 5 asked for the slow tests to be exercised every
# round with runtimes recorded; the default lane stays fast so the
# driver's `pytest tests/ -x -q` gate keeps a short feedback loop, and
# this script is the explicit slow lane. Results land in SLOW_SUITE.md.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "# SLOW_SUITE.md — slow-lane test results" > SLOW_SUITE.md
echo "" >> SLOW_SUITE.md
echo "Run: $(date -u +%Y-%m-%dT%H:%M:%SZ), host: $(hostname), JAX_PLATFORMS=${JAX_PLATFORMS:-<default>}" >> SLOW_SUITE.md
echo '```' >> SLOW_SUITE.md
JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python -m pytest tests/ -m slow -q --durations=0 -o addopts="" 2>&1 | tail -40 >> SLOW_SUITE.md
rc=$?
echo '```' >> SLOW_SUITE.md
echo "exit code: $rc" >> SLOW_SUITE.md
exit $rc
