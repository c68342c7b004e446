#!/bin/bash
# Regenerate README.md's machine-checked counts from the build itself,
# so DocSyncSpec ("README totals match the build") can never be one
# stale integer away from a red `sbt test` (round-13 verdict #1).
#
#   - "# <N> tests"        <- count of test(" definitions in src/test
#   - "<N> registry keys"  <- count of UNIQUE backticked keys in
#                             SURVEY.md §2 (DocSyncSpec separately pins
#                             that set == Registry.all, so the SURVEY
#                             count IS the registry count on any build
#                             that passes the suite)
#
# Run before committing whenever a test or registry key was added.
set -eu
cd "$(dirname "$0")/.."

TESTS=$(grep -oh 'test("' src/test/scala/graft/*.scala | wc -l)
# same extraction as DocSyncSpec: table rows "| `key` ... |" inside §2
KEYS=$(awk '/^## §2/{s=1} /^## §3/{s=0} s' SURVEY.md \
  | grep -oE '^\| `[a-z][a-z0-9_]*`' | sort -u | wc -l)

sed -i -E "s/# [0-9]+ tests/# $TESTS tests/" README.md
sed -i -E "s/[0-9]+ registry keys/$KEYS registry keys/g" README.md
sed -i -E "s/ALL [0-9]+ inventory keys/ALL $KEYS inventory keys/" SURVEY.md

echo "docs synced: $TESTS tests, $KEYS registry keys"
