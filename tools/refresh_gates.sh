#!/bin/bash
# Regenerate every locally-producible gate artifact at HEAD, in order.
# Usage: bash tools/refresh_gates.sh   (from the repo root; ~90 min)
set -o pipefail
cd "$(dirname "$0")/.."
log() { echo "[refresh $(date +%H:%M:%S)] $*"; }
run() { log "start: $1"; sbt -batch "runMain $2" 2>&1 | grep -E "$3"; log "done: $1"; }
run EdgeExec      "graft.tools.EdgeExec"                                               "\[edgeexec\]"
run EdgeExec1     "graft.tools.EdgeExec /root/testdata/sf0.001 EDGE_EXEC_1ROW.json 1"  "\[edgeexec\]"
run NullExec      "graft.tools.NullExec"                                               "\[nullexec\]"
run NanExec       "graft.tools.NanExec"                                                "\[nanexec\]"
run TextExec      "graft.tools.TextExec"                                               "\[textexec\]"
run NumExec       "graft.tools.NumExec"                                                "\[numexec\]"
run PartInvariance "graft.tools.PartInvariance"                                        "\[partinv\]"
run CodegenParity "graft.tools.CodegenParity /root/testdata/sf0.01 CODEGEN_PARITY.json" "parity|\[codegen"
run FullExec      "graft.tools.FullExec /root/testdata/sf0.1 FULLEXEC_r10.json"        "\[fullexec\]"
run ScalingProbe  "graft.tools.ScalingProbe"                                           "\[scaling|scaling.json"
log "start: Bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | head -1
log "ALL GATES REFRESHED"
