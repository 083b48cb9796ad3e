#!/usr/bin/env bash
# Time dryrun_multichip(8) from a COLD compilation cache, without touching
# the repo's warm .cache/jax.  This is the check the driver runs
# (MULTICHIP_rN.json); round 4 regressed it to rc=124 (timeout) by using
# flagship 320-residue caps.  Run after any change to __graft_entry__.py.
set -euo pipefail
cd "$(dirname "$0")/.."
CACHE=$(mktemp -d /tmp/dryrun-cold-cache.XXXXXX)
trap 'rm -rf "$CACHE"' EXIT
echo "cold cache dir: $CACHE"
time env _DISCO_DRYRUN_CACHE_DIR="$CACHE" \
    PYTHONPATH=/root/repo:/root/.axon_site \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
