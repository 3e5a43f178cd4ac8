#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh.
# PALLAS_AXON_POOL_IPS= disables the axon TPU tunnel registration in
# sitecustomize (tests never need the real chip and the dial can block).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu /opt/venv/bin/python -m pytest "$@"
