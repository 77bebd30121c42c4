#!/bin/bash
# Run the test suite on CPU without claiming the axon TPU tunnel.
#
# This image's sitecustomize registers the axon TPU backend in EVERY python
# process when PALLAS_AXON_POOL_IPS is set, which (a) slows startup and
# (b) holds the single TPU session, breaking any concurrent TPU run.
# Clearing the var skips registration; conftest.py pins jax to CPU anyway.
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= exec python -m pytest tests/ -q "$@"
