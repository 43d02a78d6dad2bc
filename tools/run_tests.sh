#!/bin/sh
# Full test suite, chunked.
#
# One 40+ minute single-process pytest run of everything can die late with
# "Fatal Python error: Aborted" in an XLA CPU fetch — a long-process
# artifact of the jax-CPU + threading mix, not a code bug (each chunk
# passes in isolation; see CLAUDE.md "Test-suite note").  This script runs
# the fast suite in one process and each slow file in its own process.
#
# Usage: sh tools/run_tests.sh   (from the repo root; ~25 min on 1 CPU)
set -u
cd "$(dirname "$0")/.."
fail=0

echo "== fast suite (not slow) =="
python -m pytest tests/ -q -m "not slow" || fail=1

# slow chunks discovered, not hardcoded — any test file that contains a
# slow marker gets its own process (a new slow file can't be missed)
for f in $(grep -l "mark\.slow\|pytestmark.*slow" tests/test_*.py); do
    echo "== slow: $f =="
    python -m pytest "$f" -q -m slow || fail=1
done

[ "$fail" -eq 0 ] && echo "ALL GREEN" || echo "FAILURES (see above)"
exit "$fail"
