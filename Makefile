# blur_algorithms_tpu — developer entry points.

PY ?= python

.PHONY: test certify certify-split certify-device bench bench-gate headline native clean

# CPU test suite (tests/conftest.py forces an 8-device virtual CPU mesh)
test:
	$(PY) -m pytest tests/ -q

# TPU certification: the structured engine x sigma parity grid PLUS a
# randomized fuzz sweep, all vs the CPU pocketfft oracle, gate max<=1 —
# AND the multichip leg (dryrun_multichip on an 8-device virtual CPU mesh
# in a subprocess), so one command reproduces both the single-chip grid
# and the multichip matrix. Runs on whatever backend jax resolves (the
# real chip in production); records benchmarks/certify.json.
certify:
	$(PY) benchmarks/parity_grid.py --fuzz 24 --multichip 8 --out benchmarks/certify.json
	$(MAKE) bench-gate
	$(MAKE) certify-split

# perf-regression gate (round-4 verdict item 8): the headline bench with
# a conservative 20 GP/s floor — ~38% under the canonical capture,
# outside the ±15% tunnel variance band — so a silent kernel slowdown
# fails certification the way a numeric regression fails the grid.
# No-op off-TPU.
bench-gate:
	$(PY) bench.py --gate

# split-regime certification (round-4 verdict item 1): the 9-pattern x
# radius-grid sweep over the blocked split regime (gaussian r~665..3451
# on the cols axis + box/tent 600..1022 + the haloed per-shard form),
# int8-e32 AND hybrid pass 2 — the measured boundary behind
# DeviceSpec.hybrid_split_cert_max_radius. ~45 min on the real chip.
certify-split:
	$(PY) benchmarks/hybrid_split_cert.py

# device-certification runbook: run the bf16/hybrid/split cert sweeps +
# the route-floor microbench on whatever TPU kind jax finds and emit a
# ready-to-paste DeviceSpec entry (benchmarks/device_cert/<kind>.json).
# `make certify-device QUICK=1` runs the trimmed smoke ladder.
certify-device:
	$(PY) benchmarks/certify_device.py $(if $(QUICK),--quick)

# headline benchmark (one JSON line; real TPU)
bench:
	$(PY) bench.py

# re-point the docs' canonical headline at the latest BENCH_r*.json
# (round-4 verdict item 6; tests/test_docs_headline.py guards it)
headline:
	$(PY) benchmarks/update_headline.py

# native host runtime (reflect-101 / de+interleave / crc32)
native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
