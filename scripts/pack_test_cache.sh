#!/bin/bash
# Regenerate the (gitignored) test compilation-cache seed, pruned.
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
#
# The seed is PRUNED to the largest entries (the heaviest compiles —
# compile time correlates strongly with serialized size) within
# SEED_BUDGET_MB of UNCOMPRESSED payload, so the tarball stays small
# (round-2 review flagged the 49 MB full-cache tarball; it is also no
# longer committed — regenerate locally or in CI).
set -euo pipefail
cd "$(dirname "$0")/.."

SEED_BUDGET_MB=${SEED_BUDGET_MB:-24}

FRESH=$(mktemp -d /tmp/mvt_test_cache.XXXX)
trap 'rm -rf "$FRESH"' EXIT

JAX_PLATFORMS=cpu MVT_TEST_CACHE_DIR="$FRESH" python -m pytest tests/ -q --runslow -p no:cacheprovider

# Keep the biggest entries until the budget is spent.
PRUNED=$(mktemp -d /tmp/mvt_test_cache_pruned.XXXX)
budget=$((SEED_BUDGET_MB * 1024 * 1024))
total=0
while IFS= read -r line; do
  size=${line%% *}
  f=${line#* }
  if [ $((total + size)) -le "$budget" ]; then
    total=$((total + size))
    rel=${f#"$FRESH"/}
    mkdir -p "$PRUNED/$(dirname "$rel")"
    cp "$f" "$PRUNED/$rel"
  fi
done < <(find "$FRESH" -type f -printf '%s %p\n' | sort -rn)

mkdir -p tests/data
tar -czf tests/data/jax_cache_tests.tar.gz -C "$PRUNED" .
rm -rf "$PRUNED"
echo "kept $total bytes uncompressed of $(du -sb "$FRESH" | cut -f1)"
du -sh tests/data/jax_cache_tests.tar.gz
echo "seed refreshed (local only; tests/data/jax_cache_tests.tar.gz is gitignored)"
