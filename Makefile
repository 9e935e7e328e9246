# Developer entry points.  TPU targets must run SERIALIZED — never two TPU
# processes at once (see CLAUDE.md).

.PHONY: test tpu-check bench bench-table

test:
	python -m pytest tests/ -q

# Hardware conformance gate: pallas-vs-scan parity, adversarial shape sweep,
# sharded/compact/restricted/flat3d cases, and headline timings — on the
# real TPU.  Run after ANY kernel or gather change.
tpu-check:
	timeout 1800 python scripts/tpu_check.py

bench:
	python bench.py

bench-table:
	python -m warp_rnnt_tpu.benchmarks.run_table benchmarks_results.json
