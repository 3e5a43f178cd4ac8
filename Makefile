# Convenience targets; the package itself needs no build step (the
# native tier builds on demand via raytracinginoneweekend_tpu/native).

.PHONY: test gate bench

# Fast tier on the virtual 8-device CPU mesh (xdist).
test:
	./run_tests.sh

# Pre-snapshot ritual (VERDICT r4 #8): FULL tier incl. the slow oracle /
# external-parity tests; records the tally + HEAD + dirty flag to
# docs/TESTS_r$(ROUND).json so the snapshot commit provably follows a
# green full run. Fails if the tier fails.
ROUND ?= 05
gate:
	ROUND=$(ROUND) sh scripts/gate.sh

# Headline bench (real TPU when available).
bench:
	python bench.py
