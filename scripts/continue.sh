#!/usr/bin/env bash
# Chain continuation runs from the last saved state (analog of the
# reference's scripts/continue.sh: copy the previous output state to
# the input slot, enable "Load state", and launch the next leg).
#
# Usage: continue.sh <workdir> [n_legs] [entry]
#   workdir : directory with the XML parameter bundle
#   n_legs  : number of chained runs (default 1)
#   entry   : python entry module (default iemic_tpu.main.run_ocean)
set -euo pipefail

WORKDIR=${1:?usage: continue.sh <workdir> [n_legs] [entry]}
NLEGS=${2:-1}
ENTRY=${3:-iemic_tpu.main.run_ocean}

cd "$WORKDIR"

for ((leg = 0; leg < NLEGS; leg++)); do
    if [[ -f ocean_output.h5 ]]; then
        # double-buffered restart (reference Model.H:254-258 .bak copies)
        [[ -f ocean_input.h5 ]] && cp ocean_input.h5 ocean_input.h5.bak
        cp ocean_output.h5 ocean_input.h5
        python - <<'EOF'
from iemic_tpu.config import read_xml, write_xml
p = read_xml("ocean_params.xml")
p.set("Load state", True)
write_xml(p, "ocean_params.xml")
EOF
    fi
    echo "=== leg $leg: running $ENTRY in $WORKDIR ==="
    python -m "$ENTRY" .
    # archive this leg's continuation data
    [[ -f cdata.txt ]] && cp cdata.txt "cdata_leg${leg}.txt"
done
