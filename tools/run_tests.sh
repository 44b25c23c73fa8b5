#!/bin/bash
# Run the test suite one file per process. XLA:CPU on this single-core image
# can segfault after hundreds of jit compiles in one process; per-file
# processes + the persistent compile cache make the suite robust and fast.
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_REMOTE_COMPILE=0
fail=0
for f in tests/test_*.py; do
  echo "=== $f"
  python -m pytest "$f" -q -p no:cacheprovider || fail=1
done
exit $fail
