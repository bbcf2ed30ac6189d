#!/bin/bash
# Regenerate the checked-in test compilation-cache seed.
#
# The pytest suite's wall time is dominated by XLA CPU compilation of the
# model graphs (cold: ~30 min on 2 cores; warm: minutes). tests/conftest.py
# seeds its persistent cache from tests/data/jax_cache_tests.tar.gz on
# first run. After changing any model/train-step graph, refresh the seed:
#
#   scripts/pack_test_cache.sh            # full suite into a fresh cache, then pack
#
# Entries are keyed by jaxlib version + forced 8-CPU topology; mismatches
# are plain cache misses, so a stale seed degrades to cold compiles.
set -euo pipefail
cd "$(dirname "$0")/.."

FRESH=$(mktemp -d /tmp/mvt_test_cache.XXXX)
trap 'rm -rf "$FRESH"' EXIT

JAX_PLATFORMS=cpu MVT_TEST_CACHE_DIR="$FRESH" python -m pytest tests/ -q -p no:cacheprovider

mkdir -p tests/data
tar -czf tests/data/jax_cache_tests.tar.gz -C "$FRESH" .
du -sh tests/data/jax_cache_tests.tar.gz
echo "seed refreshed; commit tests/data/jax_cache_tests.tar.gz"
