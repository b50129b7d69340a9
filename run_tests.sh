#!/bin/bash
# Run the test suite on the virtual 8-device CPU platform.
#
# PALLAS_AXON_POOL_IPS must be cleared BEFORE the interpreter starts:
# sitecustomize.py registers the axon TPU backend at startup (slow tunnel
# handshake, serializes across processes) even when JAX_PLATFORMS=cpu.
# Clearing the var makes sitecustomize skip registration entirely.
cd "$(dirname "$0")"
# --quick: skip tests marked slow (~5-7 min instead of ~40 on the 1-core host)
if [ "$1" = "--quick" ]; then
    shift
    if [ $# -eq 0 ]; then
        set -- tests/ -x -q
    fi
    set -- "$@" -m "not slow"
elif [ $# -eq 0 ]; then
    set -- tests/ -x -q
fi
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
exec python -m pytest "$@"
